"""Text cleaning / PII redaction / chunking column functions for the
curation surface (engine-scope addition; SURVEY.md §2.10).

All pure Column expressions over built-ins (regexp_replace, substring,
sequence/explode) — JVM-side, no Python UDFs, so they stay inside
whole-stage codegen and scale as plain scans. Every regex sticks to the
syntax subset Java regex (Spark) and RE2 (DuckDB) evaluate identically
— character classes, bounded repetition, alternation; no backrefs, no
lookaround — so the DuckDB oracle reproduces redaction bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Redaction patterns, applied in order. Order matters: emails first
# (an email contains a dot-run an IP pattern could nibble), then URLs,
# then IPs, then long digit runs (phone-ish). Each is RE2 ∩ Java-regex.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\+?\d[\d\- ]{7,}\d\b", "<PHONE>"),
)


def pii_redact(col: str | Column) -> Column:
    """Mask emails / URLs / IPv4s / phone-like digit runs with typed
    placeholders. A fold of regexp_replace calls — one codegen'd pass
    per pattern, no shuffle, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def normalize_text(col: str | Column) -> Column:
    """Canonical text form for dedup/fingerprinting: lowercase, strip
    control characters, collapse whitespace runs to single spaces, trim.
    (Unicode NFC is intentionally NOT applied here: Spark and DuckDB
    disagree on normalization builtins, and the corpus is ASCII-safe;
    a real deployment adds an ICU normalizer at ingest.)"""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    size: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Split each document into fixed-size character chunks with
    ``overlap`` characters of context shared between neighbours — the
    RAG-ingest shape. chunk i covers [i*step, i*step + size) with
    step = size - overlap; the last chunk may be short but is never
    empty; documents shorter than ``size`` yield exactly one chunk.

    Pure narrow plan: sequence() builds the per-row chunk index array,
    explode() fans it out, substring() slices — no shuffle, no UDF, and
    output size is input size * (1 + overlap/step), known up front.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    step = size - overlap
    c = F.col(text_col)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(c) - F.lit(overlap)) / F.lit(float(step))).cast("int"),
    )
    return (
        df.withColumn(
            "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1)))
        )
        .withColumn(
            "chunk",
            F.substring(c, F.col("chunk_id") * step + F.lit(1), F.lit(size)),
        )
        .select(*id_cols, "chunk_id", "chunk")
    )
