"""finlogic_spark — a PySpark-native analytics engine.

Re-expresses the query surface of the reference finance toolkit
(crdcj/FinLogic, see SURVEY.md) as an idiomatic Spark engine:
lazy DataFrames, Catalyst-optimized plans, explicit window specs,
broadcast joins for small dimensions — plus large-scale
training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference lacks.

Public API mirrors the reference entry points
(reference: src/finlogic/__init__.py:16).
"""

from finlogic_spark.session import get_spark
from finlogic_spark.api import (
    Engine,
    load,
    info,
    search_company,
    search_segment,
    rank,
)
from finlogic_spark.company import Company

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Engine",
    "load",
    "info",
    "search_company",
    "search_segment",
    "rank",
    "Company",
]
