"""Document hygiene operators for LLM training corpora: within-document
repetition signals (Gopher-style quality filters) and benchmark n-gram
decontamination.

Each operator returns a DataFrame and exposes a DuckDB SQL twin with
identical column names and semantics, per the driver's correctness
contract. All hot-path expressions are Spark built-ins (whole-stage
codegen); ratios are integer basis points (floor arithmetic — bit-identical
across engines, no float rounding hazards).

Reference analogue: the importer's per-record derived-property scalar
functions (``ONeo4jImporterSchemaMigrator.java:536-583``) — here applied to
corpus-hygiene text metrics the reference's domain never needed.

Scale shape (100 TB): both operators are word-count-shaped — one explode of
n-grams followed by combinable hash aggregations keyed by (doc, gram);
no self-joins, no windows, no driver loops. Decontamination joins against a
distinct-reduced BROADCAST benchmark side (eval sets are MBs against a
multi-TB corpus), so the corpus never shuffles for the join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import (
    h64,
    h64_sql,
    tokens,
    tokens_sql,
    word_shingles,
    word_shingles_sql,
)

# n-gram orders measured by repetition_signals: 1 (token diversity),
# 2/3 (top-n-gram share, boilerplate headers), 5 (duplicate-n-gram mass,
# templated/spun text). Fixed constants shared verbatim with the SQL twin.
REPETITION_NS = (1, 2, 3, 5)


def repetition_signals(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document within-text repetition profile (Gopher-rule analogue
    for single-line token text).

    Columns (all BIGINT; ratios are floor basis points of 10000):
      - ``n_tokens``       total tokens
      - ``uniq_token_bp``  distinct-token share — low = repetitive
      - ``top2_bp``        occurrences of the most frequent 2-gram / all
                           2-gram instances
      - ``top3_bp``        same for 3-grams
      - ``dup5_bp``        share of 5-gram instances that are repeats
                           (NULL when the doc has < 5 tokens)

    Documents with zero tokens are absent from the output (they have no
    measurable n-grams) — same in the SQL twin.

    Plan: n-grams for ALL orders are built array-native per row and
    exploded ONCE as (n, gram) pairs; everything after is two combinable
    hash aggregations (gram counts, then per-(doc, n) rollup) plus a
    conditional-aggregation pivot — the word-count shape, linear at any
    corpus size.
    """
    toks = tokens(F.col(text_col))

    # NB: a one-arg lambda is required — F.transform feeds the array INDEX
    # to a second parameter, so `lambda g, n=n` would shadow the closure
    def _tagger(n: int):
        return lambda g: F.struct(
            F.lit(n).alias("__rep_n"), g.alias("__rep_gram")
        )

    per_n = [
        F.transform(word_shingles(toks, n), _tagger(n)) for n in REPETITION_NS
    ]
    exploded = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.flatten(F.array(*per_n))).alias("__rep_g"),
    ).select("doc_id", "__rep_g.__rep_n", "__rep_g.__rep_gram")
    counts = exploded.groupBy("doc_id", "__rep_n", "__rep_gram").agg(
        F.count("*").alias("__rep_c")
    )
    per_doc_n = counts.groupBy("doc_id", "__rep_n").agg(
        F.sum("__rep_c").cast("long").alias("__rep_total"),
        F.count("*").cast("long").alias("__rep_uniq"),
        F.max("__rep_c").cast("long").alias("__rep_maxc"),
    )
    total, uniq, maxc = (
        F.col("__rep_total"),
        F.col("__rep_uniq"),
        F.col("__rep_maxc"),
    )
    metrics = per_doc_n.select(
        "doc_id",
        "__rep_n",
        total,
        F.floor(uniq * 10000 / total).cast("long").alias("__rep_uniq_bp"),
        F.floor(maxc * 10000 / total).cast("long").alias("__rep_top_bp"),
        F.floor((total - uniq) * 10000 / total)
        .cast("long")
        .alias("__rep_dup_bp"),
    )

    def at(n: int, col: str):
        return F.max(F.when(F.col("__rep_n") == n, F.col(col)))

    return metrics.groupBy("doc_id").agg(
        at(1, "__rep_total").alias("n_tokens"),
        at(1, "__rep_uniq_bp").alias("uniq_token_bp"),
        at(2, "__rep_top_bp").alias("top2_bp"),
        at(3, "__rep_top_bp").alias("top3_bp"),
        at(5, "__rep_dup_bp").alias("dup5_bp"),
    )


def repetition_signals_sql(table: str = "documents") -> str:
    """DuckDB twin of ``repetition_signals`` (ORDER BY doc_id)."""
    branches = "\n  UNION ALL ".join(
        f"SELECT doc_id, {n} AS __rep_n, "
        f"unnest({word_shingles_sql('toks', n)}) AS __rep_gram FROM base"
        for n in REPETITION_NS
    )
    return f"""
WITH base AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM {table}
),
grams AS (
  {branches}
),
counts AS (
  SELECT doc_id, __rep_n, __rep_gram, count(*) AS __rep_c
  FROM grams GROUP BY doc_id, __rep_n, __rep_gram
),
per_doc_n AS (
  SELECT doc_id, __rep_n,
         CAST(sum(__rep_c) AS BIGINT) AS __rep_total,
         CAST(count(*) AS BIGINT) AS __rep_uniq,
         CAST(max(__rep_c) AS BIGINT) AS __rep_maxc
  FROM counts GROUP BY doc_id, __rep_n
),
metrics AS (
  SELECT doc_id, __rep_n, __rep_total,
         (__rep_uniq * 10000) // __rep_total AS __rep_uniq_bp,
         (__rep_maxc * 10000) // __rep_total AS __rep_top_bp,
         ((__rep_total - __rep_uniq) * 10000) // __rep_total AS __rep_dup_bp
  FROM per_doc_n
)
SELECT doc_id,
       max(CASE WHEN __rep_n = 1 THEN __rep_total END) AS n_tokens,
       max(CASE WHEN __rep_n = 1 THEN __rep_uniq_bp END) AS uniq_token_bp,
       max(CASE WHEN __rep_n = 2 THEN __rep_top_bp END) AS top2_bp,
       max(CASE WHEN __rep_n = 3 THEN __rep_top_bp END) AS top3_bp,
       max(CASE WHEN __rep_n = 5 THEN __rep_dup_bp END) AS dup5_bp
FROM metrics GROUP BY doc_id ORDER BY doc_id
"""


def vocab_topk(
    documents: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus-level vocabulary head: the `k` most frequent tokens with
    their total counts and document frequencies. Deterministic total
    order: count desc, then token asc (ties never reorder between runs
    or engines).

    Columns: token, n_occurrences, n_docs (both BIGINT).

    Plan: one explode + one combinable hash aggregation (count +
    conditional distinct-doc count via the per-(token, doc) pre-agg),
    then TakeOrdered(k) — the reduction to k rows happens map-side per
    partition, so the driver sees at most k rows per partition, never
    the vocabulary.
    """
    per_doc = (
        documents.select(
            "doc_id",
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("__vt_c"))
    )
    return (
        per_doc.groupBy("token")
        .agg(
            F.sum("__vt_c").cast("long").alias("n_occurrences"),
            F.count("*").cast("long").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(k)
    )


def vocab_topk_sql(k: int = 50, table: str = "documents") -> str:
    """DuckDB twin of ``vocab_topk``."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tokens_sql("text")}) AS token FROM {table}
),
per_doc AS (
  SELECT token, doc_id, count(*) AS __vt_c FROM toks GROUP BY token, doc_id
)
SELECT token,
       CAST(sum(__vt_c) AS BIGINT) AS n_occurrences,
       CAST(count(*) AS BIGINT) AS n_docs
FROM per_doc GROUP BY token
ORDER BY n_occurrences DESC, token ASC LIMIT {k}
"""


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Benchmark contamination hits: for every corpus document sharing at
    least one word ``n``-gram with any benchmark document, the number of
    distinct shared n-grams.

    Columns: ``doc_id``, ``n_hits`` (BIGINT). Clean documents are absent —
    removing contamination is an anti-join of the corpus against this
    result (composable, one line for the caller).

    Shingles are hashed with the portable ``h64`` (md5-derived, exact
    DuckDB twin) so the join shuffles 8-byte keys, not n-gram strings.
    The benchmark side is distinct-reduced and explicitly BROADCAST: eval
    benchmarks are MBs while the corpus is TBs, so the corpus-side explode
    feeds a map-side hash join — zero corpus shuffle before the per-doc
    count. For a pathologically large benchmark drop the broadcast hint
    and Spark falls back to a shuffled hash join with the same semantics.
    """
    bt = bench_text_col or text_col
    bench_h = (
        benchmark.select(
            F.explode(word_shingles(tokens(F.col(bt)), n)).alias("__dc_gram")
        )
        .select(h64(F.col("__dc_gram")).alias("__dc_h"))
        .distinct()
    )
    doc_h = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(tokens(F.col(text_col)), n)).alias(
            "__dc_gram"
        ),
    ).select("doc_id", h64(F.col("__dc_gram")).alias("__dc_h"))
    hits = doc_h.join(F.broadcast(bench_h), on="__dc_h", how="inner")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("__dc_h").cast("long").alias("n_hits")
    )


def decontaminate_sql(
    corpus_where: str, bench_where: str, n: int = 8, table: str = "documents"
) -> str:
    """DuckDB twin of ``decontaminate`` for a corpus/benchmark split of one
    table by predicates (ORDER BY doc_id)."""
    return f"""
WITH base AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM {table}
),
bench_grams AS (
  SELECT unnest({word_shingles_sql("toks", n)}) AS __dc_gram
  FROM base WHERE {bench_where}
),
bench_h AS (
  SELECT DISTINCT {h64_sql("__dc_gram")} AS __dc_h FROM bench_grams
),
doc_grams AS (
  SELECT doc_id, unnest({word_shingles_sql("toks", n)}) AS __dc_gram
  FROM base WHERE {corpus_where}
),
doc_h AS (
  SELECT doc_id, {h64_sql("__dc_gram")} AS __dc_h FROM doc_grams
)
SELECT doc_id, CAST(count(DISTINCT __dc_h) AS BIGINT) AS n_hits
FROM doc_h JOIN bench_h USING (__dc_h)
GROUP BY doc_id ORDER BY doc_id
"""
