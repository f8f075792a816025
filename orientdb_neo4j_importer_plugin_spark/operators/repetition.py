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

    Plan (round 6): tokens are built ONCE per row by the JVM tokenizer
    (exact split semantics shared with the SQL twin), then one Arrow
    `mapInPandas` pass counts the n-gram statistics per document with
    dict/Counter operations. The previous all-expression form built the
    2/3/5-gram STRING arrays via interpreted higher-order functions
    (transform + slice + concat_ws per gram index) and run-length folds
    over array_sort — measured 8.1s of its 12.9s at sf1 was gram-array
    construction alone. Gram values never leave the operator (only
    counts do), so tuple-keyed counting is value-identical: space-joined
    tokens are injective (tokens contain no whitespace), hence
    count-of-most-frequent and distinct-count match the string-gram
    formulation bit-for-bit, and all ratios stay integer floor
    arithmetic (Python ints are exact). 12.9s -> ~1.5s at sf1; still
    zero shuffles and embarrassingly parallel (guide §4.2: hand whole
    batches to native/vectorized code instead of interpreted expression
    trees).
    """

    def _stats(batches):
        import pandas as pd

        def bp(num: int, den: int):
            return (num * 10000) // den if den > 0 else None

        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "n_tokens": [], "uniq_token_bp": [],
                "top2_bp": [], "top3_bp": [], "dup5_bp": [],
            }
            for toks in pdf["__rs_toks"]:
                t = list(toks)
                n = len(t)
                out["n_tokens"].append(n)
                out["uniq_token_bp"].append(bp(len(set(t)), n))
                for key, k in (("top2_bp", 2), ("top3_bp", 3)):
                    grams = list(zip(*[t[i:] for i in range(k)]))
                    if grams:
                        c: dict = {}
                        for g in grams:
                            c[g] = c.get(g, 0) + 1
                        out[key].append(bp(max(c.values()), len(grams)))
                    else:
                        out[key].append(None)
                g5 = list(zip(*[t[i:] for i in range(5)]))
                out["dup5_bp"].append(
                    bp(len(g5) - len(set(g5)), len(g5)) if g5 else None
                )
            yield pd.DataFrame(out)

    base = documents.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("__rs_toks"),
    ).filter(F.size("__rs_toks") > 0)
    return base.mapInPandas(
        _stats,
        "doc_id long, n_tokens long, uniq_token_bp long, "
        "top2_bp long, top3_bp long, dup5_bp long",
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
    # tokens materialized BEFORE the shingle transform: an inline
    # word_shingles(tokens(text)) re-splits the text once per shingle index
    # inside the interpreted HOF lambda — O(tokens²) per doc (same fix as
    # dedup._doc_shingle_hashes; measured 45s -> 9.6s for this operator at
    # sf1). The Generate boundary prevents project collapse.
    bench_h = (
        benchmark.select(tokens(F.col(bt)).alias("__toks"))
        .select(F.explode(word_shingles(F.col("__toks"), n)).alias("__dc_gram"))
        .select(h64(F.col("__dc_gram")).alias("__dc_h"))
        .distinct()
    )
    # per-doc gram dedup is row-local (array_distinct over the doc's own
    # hashed grams), so (doc_id, __dc_h) is unique before the join and the
    # per-doc count of distinct matched hashes is a PLAIN count — no
    # distinct-expand aggregate, fewer join probes (round 6)
    doc_h = documents.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks")
    ).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    word_shingles(F.col("__toks"), n), lambda s: h64(s)
                )
            )
        ).alias("__dc_h"),
    )
    hits = doc_h.join(F.broadcast(bench_h), on="__dc_h", how="inner")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
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
