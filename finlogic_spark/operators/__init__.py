"""First-class named operators the reference builds from primitives.

Each module maps a SURVEY.md §2 operator family onto an idiomatic Spark
plan; no Python row UDFs in any hot path.
"""

from finlogic_spark.operators.dedup import keep_first, keep_last, distinct_on
from finlogic_spark.operators.reshape import pivot_wide, unpivot_long
from finlogic_spark.operators.topk import top_k
from finlogic_spark.operators.asof import asof_join
from finlogic_spark.operators.skew import salted_join
from finlogic_spark.operators.windows import lag_smooth, trailing_avg_2

__all__ = [
    "salted_join",
    "keep_first",
    "keep_last",
    "distinct_on",
    "pivot_wide",
    "unpivot_long",
    "top_k",
    "asof_join",
    "lag_smooth",
    "trailing_avg_2",
]
