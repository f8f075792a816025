"""Deterministic sampling / splitting for training-data pipelines.

No RNG anywhere: membership is a pure function of the record key via the
portable md5-derived hash (`functions.hashes.h64`), so a sample is
- reproducible across runs, engines and cluster sizes (the DuckDB twin
  computes the identical membership),
- stable under re-partitioning and retries (unlike `df.sample`, whose
  output depends on partition layout even with a fixed seed),
- incremental-friendly: new records join the same strata/splits without
  reshuffling old ones — exactly what a 100 TB corpus refreshed daily needs.

Both operators are stateless row-local filters: no shuffle, fully
codegen'd, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import h64, h64_sql

# hash-bucket resolution for rates/splits (1 bp = 0.01%)
RESOLUTION = 10_000


def _bucket(key: Column) -> Column:
    return F.pmod(h64(key.cast("string")), F.lit(RESOLUTION))


def _bucket_sql(key_expr: str) -> str:
    # DuckDB % can return negatives; h64 is non-negative (60-bit), plain %
    return f"({h64_sql(f'CAST({key_expr} AS VARCHAR)')} % {RESOLUTION})"


LENGTH_STRATA = [(200, "short"), (400, "mid")]  # else "long"
DEFAULT_RATES = {"short": 0.25, "mid": 0.5, "long": 1.0}


def stratified_sample(
    documents: DataFrame, rates: dict[str, float] | None = None
) -> DataFrame:
    """Per-stratum downsampling by text-length bucket — the data-mixing
    primitive (e.g. keep all long documents, thin out boilerplate-short
    ones). Keep iff hash-bucket(doc_id) < rate * RESOLUTION.
    Columns: doc_id, stratum."""
    rates = rates or DEFAULT_RATES
    ln = F.length("text")
    stratum = F.lit("long")
    for cut, name in reversed(LENGTH_STRATA):
        stratum = F.when(ln < cut, F.lit(name)).otherwise(stratum)
    rate = F.lit(None).cast("int")
    for name, r in rates.items():
        rate = F.when(F.lit(name) == stratum, F.lit(int(r * RESOLUTION))).otherwise(rate)
    return (
        documents.select(
            "doc_id", stratum.alias("stratum"), _bucket(F.col("doc_id")).alias("__b"), rate.alias("__r")
        )
        .filter(F.col("__b") < F.col("__r"))
        .select("doc_id", "stratum")
        .orderBy("doc_id")
    )


def stratified_sample_sql(rates: dict[str, float] | None = None) -> str:
    rates = rates or DEFAULT_RATES
    cuts = " ".join(
        f"WHEN length(text) < {cut} THEN '{name}'" for cut, name in LENGTH_STRATA
    )
    rate_cases = " ".join(
        f"WHEN '{name}' THEN {int(r * RESOLUTION)}" for name, r in rates.items()
    )
    return f"""
WITH s AS (
  SELECT doc_id,
         CASE {cuts} ELSE 'long' END AS stratum,
         {_bucket_sql("doc_id")} AS b
  FROM documents
)
SELECT doc_id, stratum
FROM s
WHERE b < CASE stratum {rate_cases} END
ORDER BY doc_id
"""


SPLITS = [("train", 9_000), ("val", 9_500)]  # bp cut points; else "test"


def split_expr(key: Column) -> Column:
    """Deterministic split assignment as a row-local Column — the single
    source of the split rule, shared by train_split and pipeline composers."""
    b = _bucket(key)
    split = F.lit("test")
    for name, cut in reversed(SPLITS):
        split = F.when(b < cut, F.lit(name)).otherwise(split)
    return split


def split_case_sql(key_expr: str) -> str:
    """SQL twin of split_expr (same rule, same order)."""
    cases = " ".join(
        f"WHEN {_bucket_sql(key_expr)} < {cut} THEN '{name}'"
        for name, cut in SPLITS
    )
    return f"CASE {cases} ELSE 'test' END"


def train_split(documents: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5 by hash range) —
    stable per record forever; a document never migrates between splits as
    the corpus grows. Columns: doc_id, split."""
    return documents.select(
        "doc_id", split_expr(F.col("doc_id")).alias("split")
    ).orderBy("doc_id")


def train_split_sql() -> str:
    return f"""
SELECT doc_id, {split_case_sql("doc_id")} AS split
FROM documents
ORDER BY doc_id
"""


# -- sequence packing ---------------------------------------------------------

PACK_BUDGET = 128  # tokens per pack (training sequence length)
PACK_BUCKETS = 16  # independent packing domains


def pack_documents(
    documents: DataFrame,
    budget: int = PACK_BUDGET,
    buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget packs for
    training-batch assembly. Contiguous greedy packing per hash bucket —
    each bucket is an independent packing domain (embarrassingly parallel:
    one window per bucket, never a global sort), ordered deterministically
    by doc_id; a document's pack is the budget-quotient of its START
    offset in the bucket's running token total.

    Packs can overflow by at most one document (the standard contiguous
    trade-off); at 10^9 docs the per-bucket remainder waste is O(buckets),
    i.e. negligible. First-fit-decreasing packs ~2-5% tighter but needs a
    global sort by length and a stateful scan — the wrong trade at scale.

    Columns: doc_id, bucket, n_tokens, pack_id.
    """
    from ..functions.hashes import tokens

    from pyspark.sql.window import Window

    tok = F.size(tokens(F.col("text")))
    b = F.pmod(h64(F.col("doc_id").cast("string")), F.lit(buckets))
    base = documents.select(
        "doc_id", b.alias("bucket"), tok.alias("n_tokens")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget)).cast("long").alias("pack_id"),
    ).orderBy("doc_id")


def pack_documents_sql(
    budget: int = PACK_BUDGET, buckets: int = PACK_BUCKETS
) -> str:
    from ..functions.hashes import tokens_sql

    return f"""
WITH base AS (
  SELECT doc_id,
         ({h64_sql("CAST(doc_id AS VARCHAR)")} % {buckets}) AS bucket,
         len({tokens_sql("text")}) AS n_tokens
  FROM documents
)
SELECT doc_id, bucket, n_tokens,
       CAST(floor((sum(n_tokens) OVER (
          PARTITION BY bucket ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING
       ) - n_tokens) * 1.0 / {budget}) AS BIGINT) AS pack_id
FROM base
ORDER BY doc_id
"""


def quality_weighted_sample(
    documents: DataFrame, floor_bp: int = 500, cap_bp: int = 10_000
) -> DataFrame:
    """Quality-PROPORTIONAL deterministic downsampling: each document's
    keep probability is its quality score itself (basis points of 10000,
    `textstats.quality_exprs`), clamped to [floor_bp, cap_bp] — high-
    quality text survives near-certainly, boilerplate is thinned in
    proportion, and nothing is ever fully censored (the floor keeps a
    diversity trickle). Keep iff hash-bucket(doc_id) < clamp(quality_bp).

    Same determinism contract as the other samplers: membership is a pure
    function of doc_id, reproducible across engines/partitionings, and
    incremental-friendly. Columns: doc_id, quality_bp (the applied keep
    probability in bp). Row-local filter — zero shuffles.
    """
    from .textstats import quality_exprs

    q = quality_exprs()["quality_bp"]
    keep_bp = F.greatest(
        F.lit(int(floor_bp)), F.least(q, F.lit(int(cap_bp)))
    ).cast("long")
    return (
        documents.select(
            "doc_id",
            keep_bp.alias("quality_bp"),
            _bucket(F.col("doc_id")).alias("__b"),
        )
        .filter(F.col("__b") < F.col("quality_bp"))
        .select("doc_id", "quality_bp")
    )


def quality_weighted_sample_sql(
    floor_bp: int = 500, cap_bp: int = 10_000
) -> str:
    """DuckDB twin of ``quality_weighted_sample`` (ORDER BY doc_id)."""
    from .textstats import QUALITY_BP_SQL, QUALITY_CTES_SQL

    return f"""
WITH {QUALITY_CTES_SQL},
w AS (
  SELECT doc_id,
         CAST(greatest({int(floor_bp)},
                       least({QUALITY_BP_SQL}, {int(cap_bp)})) AS BIGINT)
           AS quality_bp
  FROM bp
)
SELECT doc_id, quality_bp FROM w
WHERE {_bucket_sql("doc_id")} < quality_bp
ORDER BY doc_id
"""
