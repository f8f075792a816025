"""Composed training-data pipeline: quality-filter -> exact-dedup ->
PII-count -> split assignment, as ONE declarative plan.

The showcase that the operator suite COMPOSES: every stage reuses the
shared single-source expressions of its standalone operator
(textstats.quality_exprs / pii_total_expr, the dedup content hash,
sampling.split_expr), arranged so the whole pipeline is one scan of
`documents` and ONE shuffle (the dedup window on content_hash) — every
other stage is row-local and fuses into the same WholeStageCodegen span.
Reference analogue: the importer's fixed migrate-then-index pipeline
(``ONeo4jImporter.java`` execute() phases), generalized to data-quality
stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import h64, h64_sql
from .sampling import split_case_sql, split_expr
from .textstats import (
    QUALITY_BP_SQL,
    QUALITY_CTES_SQL,
    pii_total_expr,
    pii_total_sql,
    quality_exprs,
)

MIN_QUALITY_BP = 6500  # keeps ~half the synthetic fixture; tune per corpus


def training_pipeline(
    documents: DataFrame, min_quality_bp: int = MIN_QUALITY_BP
) -> DataFrame:
    """Documents that survive quality filtering AND exact dedup, with their
    PII span count and a deterministic split assignment.

    Stages: quality gate (quality_exprs) -> exact dedup among survivors
    (lowest doc_id per content hash, via a window min — no join back) ->
    PII count (pii_total_expr) -> split (split_expr). Plan shape: one
    parquet scan, one shuffle (window partitionBy content_hash); the
    quality/PII/split expressions are row-local and evaluate in the scan's
    codegen stage.

    Columns: doc_id, split, n_tokens, quality_bp, n_pii.
    """
    q = quality_exprs()
    enriched = documents.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["quality_bp"].alias("quality_bp"),
        h64(F.col("text")).alias("content_hash"),
        pii_total_expr().alias("n_pii"),
        split_expr(F.col("doc_id")).alias("split"),
    ).filter(F.col("quality_bp") >= min_quality_bp)
    w = Window.partitionBy("content_hash")
    return (
        enriched.withColumn("__keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__keep"))
        .select("doc_id", "split", "n_tokens", "quality_bp", "n_pii")
        .orderBy("doc_id")
    )


def training_pipeline_sql(min_quality_bp: int = MIN_QUALITY_BP) -> str:
    return f"""
WITH {QUALITY_CTES_SQL},
enriched AS (
  SELECT doc_id,
         n_tokens,
         {QUALITY_BP_SQL} AS quality_bp,
         {h64_sql("text")} AS content_hash,
         {pii_total_sql()} AS n_pii,
         {split_case_sql("doc_id")} AS split
  FROM bp
),
passed AS (
  SELECT * FROM enriched WHERE quality_bp >= {min_quality_bp}
)
SELECT doc_id, split, n_tokens, quality_bp, n_pii
FROM (
  SELECT *, min(doc_id) OVER (PARTITION BY content_hash) AS keep
  FROM passed
)
WHERE doc_id = keep
ORDER BY doc_id
"""
