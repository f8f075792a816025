"""Composed training-data pipeline: quality-filter -> exact-dedup ->
PII-redact -> split assignment, as ONE declarative plan.

This is the showcase that the operator suite COMPOSES: every stage is the
already-oracle-checked building block (quality_score, exact_dedup_keep,
redact_pii, train_split), chained so Catalyst fuses the whole pipeline —
scan once, no intermediate materialization, shuffles only where a stage
semantically needs one (the dedup groupBy). Reference analogue: the
importer's fixed migrate-then-index pipeline (``ONeo4jImporter.java``
execute() phases), generalized to data-quality stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import h64, h64_sql, tokens_sql
from .sampling import SPLITS, _bucket, _bucket_sql
from .textstats import (
    PII_PATTERNS,
    _STOP_LIST_SQL,
    _sql_quote,
    quality_score,
    redact_pii,
)

MIN_QUALITY_BP = 6500  # keeps ~half the synthetic fixture; tune per corpus


def training_pipeline(
    documents: DataFrame, min_quality_bp: int = MIN_QUALITY_BP
) -> DataFrame:
    """Documents that survive quality filtering AND exact dedup, with their
    redacted text's PII count and a deterministic split assignment.

    Stages (all columnar, one fused plan):
      1. quality gate: quality_bp >= min_quality_bp (textstats.quality_score)
      2. exact dedup among survivors: lowest doc_id per content hash
      3. PII redaction counts on the kept docs (textstats.redact_pii)
      4. split assignment: stable hash-range buckets (sampling.train_split)

    Columns: doc_id, split, n_tokens, quality_bp, n_pii.
    """
    q = quality_score(documents).filter(
        F.col("quality_bp") >= min_quality_bp
    )
    passed = documents.join(
        q.select("doc_id", "n_tokens", "quality_bp"), "doc_id"
    )
    kept = (
        passed.select("doc_id", h64(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv = passed.join(kept, "doc_id")
    red = redact_pii(surv).select("doc_id", "n_pii")
    b = _bucket(F.col("doc_id"))
    split = F.lit("test")
    for name, cut in reversed(SPLITS):
        split = F.when(b < cut, F.lit(name)).otherwise(split)
    return (
        surv.join(red, "doc_id")
        .select(
            "doc_id",
            split.alias("split"),
            "n_tokens",
            "quality_bp",
            "n_pii",
        )
        .orderBy("doc_id")
    )


def training_pipeline_sql(min_quality_bp: int = MIN_QUALITY_BP) -> str:
    pii_total = " + ".join(
        f"CAST(len(regexp_extract_all(text, '{_sql_quote(pat)}')) AS BIGINT)"
        for _, pat, _ in PII_PATTERNS
    )
    split_cases = " ".join(
        f"WHEN {_bucket_sql('p.doc_id')} < {cut} THEN '{name}'"
        for name, cut in SPLITS
    )
    return f"""
WITH t AS (
  SELECT doc_id, text, {tokens_sql("text")} AS toks,
         greatest(length(text), 1) AS tl
  FROM documents
),
bp AS (
  SELECT doc_id, text,
         len(toks) AS n_tokens,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 10000 // tl AS punct_bp,
         len(list_filter(toks, x -> list_contains({_STOP_LIST_SQL}, x))) * 10000
           // greatest(len(toks), 1) AS stopword_bp,
         least(len(toks) * 10000 // 64, 10000) AS len_term
  FROM t
),
q AS (
  SELECT doc_id, text, n_tokens,
         (len_term * 5 + stopword_bp * 3
          + (10000 - least(punct_bp * 10, 10000)) * 2) // 10 AS quality_bp
  FROM bp
),
passed AS (
  SELECT * FROM q WHERE quality_bp >= {min_quality_bp}
),
kept AS (
  SELECT min(doc_id) AS doc_id FROM passed GROUP BY {h64_sql("text")}
)
SELECT p.doc_id,
       CASE {split_cases} ELSE 'test' END AS split,
       p.n_tokens, p.quality_bp,
       CAST({pii_total} AS BIGINT) AS n_pii
FROM passed p JOIN kept k ON p.doc_id = k.doc_id
ORDER BY p.doc_id
"""
