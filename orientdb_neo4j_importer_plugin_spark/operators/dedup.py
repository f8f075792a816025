"""Deduplication operators for training-data pipelines over `documents`.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup — each as a DataFrame
plan with an exact DuckDB SQL oracle twin (same md5-derived hashing, same
constants, same column names).

Reference analogue: idempotency via UNIQUE_HASH_INDEX on the source key
(``ONeo4jImporterVerticesAndEdgesMigrator.java:363-370``) — generalized from
"same key" to "same/near-same content".

Scale notes:

* exact dedup: one shuffle on a 60-bit content hash (groupBy); at 100 TB the
  hash column is what shuffles, not the text, thanks to early projection.
* MinHash LSH: candidate generation is a self-join on (band_id, band_hash) —
  an equi-join Catalyst executes as a shuffled hash join keyed by small ints;
  band buckets bound the quadratic blowup. Signatures are k min-aggregates
  over the exploded (doc, token) stream: ONE shuffle, map-side combinable.
* SimHash: bit-majority aggregate over exploded tokens, also one combinable
  shuffle; near-dup pairs = equal simhash (cheap) or hamming<=t via band join.
* n-gram Jaccard: exploded shingle equi-join; the |union| denominator uses
  precomputed per-doc distinct counts, so no second pass over text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import (
    MINHASH_PRIME,
    h64,
    h64_sql,
    minhash_apply,
    minhash_apply_sql,
    minhash_params,
    tokens,
    tokens_sql,
    word_shingles,
    word_shingles_sql,
)

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Groups of byte-identical texts (by 60-bit content hash).

    Columns: content_hash, n_docs, keep_doc_id (min id wins), dup_doc_ids.
    """
    return (
        documents.select("doc_id", h64(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.sort_array(F.collect_list("doc_id")).alias("dup_doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


EXACT_DEDUP_SQL = f"""
SELECT {h64_sql("text")} AS content_hash,
       count(*) AS n_docs,
       min(doc_id) AS keep_doc_id,
       list_sort(list(doc_id)) AS dup_doc_ids
FROM documents
GROUP BY 1
HAVING count(*) > 1
ORDER BY content_hash
"""


def exact_dedup_keep(documents: DataFrame) -> DataFrame:
    """Survivors after exact dedup: lowest doc_id per distinct content.

    Columns: doc_id. (The kept set — what a pipeline passes downstream.)
    """
    return (
        documents.select("doc_id", h64(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


EXACT_DEDUP_KEEP_SQL = f"""
SELECT min(doc_id) AS doc_id
FROM documents
GROUP BY {h64_sql("text")}
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

MINHASH_K = 16  # signature length
LSH_BANDS = 4  # bands of 4 rows -> catches jaccard >~ 0.5
SHINGLE_N = 3


def _doc_shingle_hashes(documents: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    """Distinct (doc_id, shingle-hash) pairs — the shared front half of
    every shingle-evidence operator (MinHash, Jaccard, shared-shingle
    edges).

    The token array is materialized in its OWN projection before the
    shingle transform: higher-order-function lambdas evaluate interpreted
    with no common-subexpression elimination, so an inline
    ``word_shingles(tokens(text))`` re-runs the regex split once per
    shingle INDEX — O(tokens²) per document (measured 42s -> 3.4s for the
    sf1 shingle explode; guide §1.2 "per-task work"). The Generate
    boundary keeps the optimizer from collapsing the projection back in.
    """
    return (
        documents.select("doc_id", tokens(F.col("text")).alias("__toks"))
        .select(
            "doc_id",
            # per-doc dedup is ROW-LOCAL (doc_id is part of the distinct
            # key, so array_distinct over the doc's own hashed shingles ==
            # the old post-explode .distinct()) — retires the 2.6M-row
            # distinct exchange entirely (7.4s -> 5.2s at sf1, round 6)
            F.explode(
                F.array_distinct(
                    F.transform(
                        word_shingles(F.col("__toks"), n),
                        lambda s: h64(s),
                    )
                )
            ).alias("sh"),
        )
    )


def cap_shingle_df(ds: DataFrame, max_df: int, col: str = "sh") -> DataFrame:
    """Drop shingles present in more than `max_df` docs (boilerplate
    guard bounding any later per-shingle self-join at max_df²). df per
    shingle as a whole-partition window: ONE shuffle by the hash in the
    same lineage (a separate hot-list aggregate + anti-join recomputes
    the exploded shingle stream — measured 2x slower; at extreme scale,
    persist ds once and use the broadcast anti-join)."""
    w = Window.partitionBy(col)
    return (
        ds.withColumn("__df", F.count("*").over(w))
        .filter(F.col("__df") <= max_df)
        .drop("__df")
    )


def minhash_signatures(documents: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """Per-doc MinHash signature columns mh_0..mh_{k-1} (one shuffle)."""
    params = minhash_params(k)
    ds = _doc_shingle_hashes(documents)
    aggs = [
        F.min(minhash_apply(F.col("sh"), a, b)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return ds.groupBy("doc_id").agg(*aggs)


def minhash_signatures_sql(k: int = MINHASH_K) -> str:
    params = minhash_params(k)
    shingles = word_shingles_sql(tokens_sql("text"), SHINGLE_N)
    mins = ", ".join(
        f"min({minhash_apply_sql('sh', a, b)}) AS mh_{i}"
        for i, (a, b) in enumerate(params)
    )
    return f"""
WITH ds AS (
  SELECT DISTINCT doc_id, {h64_sql("s.shingle")} AS sh
  FROM documents, unnest({shingles}) AS s(shingle)
)
SELECT doc_id, {mins} FROM ds GROUP BY doc_id
"""


MAX_BAND_SIZE = 50  # degenerate-band guard: a band bucket of b docs makes
# b^2/2 candidate rows; drop buckets past the cap (they are boilerplate, not
# near-dups). VERDICT r01 flagged the uncapped join as the quadratic path.


def minhash_lsh_pairs(
    documents: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    max_band_size: int | None = MAX_BAND_SIZE,
) -> DataFrame:
    """Candidate near-duplicate pairs sharing at least one LSH band.

    Columns: doc_a, doc_b, n_bands (how many bands matched).
    Band buckets larger than `max_band_size` (degenerate/boilerplate bands)
    are dropped before the self-join — a bucket of b docs makes b^2/2
    candidate rows, so the cap bounds the quadratic path.

    ORDERING CONTRACT at web scale: run EXACT dedup first (the
    content-hash stage `training_pipeline` leads with). A cohort of > cap
    byte-identical documents shares every band, hits the cap, and its
    pairs are dropped as boilerplate — exact duplicates are the exact
    dedup stage's job (one linear shuffle there vs a quadratic bucket
    here; same reasoning as similarity.near_dup_pairs' representative
    collapse, where identical EMBEDDINGS are collapsed inside the
    operator because no upstream exact stage exists for vectors).
    """
    rows_per_band = k // bands
    sig = minhash_signatures(documents, k)
    band_cols = []
    for b in range(bands):
        cols = [
            F.col(f"mh_{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        # band key = joined signature values (not a re-hash): exact parity
        # with the SQL oracle and no collision asymmetry between engines
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_id"), F.concat_ws(",", *cols).alias("band_hash")
            )
        )
    exploded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bd")
    ).select("doc_id", "bd.band_id", "bd.band_hash")
    # PLAN (round 6): group each band bucket into a sorted doc-id array and
    # expand the in-bucket pairs from the array — ONE lineage, no self-join.
    # The previous window-cap + self-join formulation computed the whole
    # signature pipeline (shingle explode + md5 + distinct + 16-way min
    # aggregate) TWICE (no exchange reuse across the join sides — see
    # plans/r06/dedup_minhash_lsh_pairs_before.txt) and shuffled every
    # in-bucket id pair into the join. The bucket-size cap is now simply
    # size(collect_list) <= cap — identical filter semantics (window count
    # over (band_id, band_hash) == group size). Pair set and n_bands are
    # unchanged: pairs are all i<j combinations per surviving bucket,
    # counted per (doc_a, doc_b) across bands. Measured 44.8s -> 6.5s at
    # sf1 with the token-materialization fix below (guide §2.4: remove
    # shuffles outright / share one exchange).
    grouped = (
        exploded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("__ds"))
        .filter(F.size("__ds").between(2, max_band_size)
                if max_band_size is not None
                else (F.size("__ds") >= 2))
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(__ds, (a, i) -> "
                "transform(slice(__ds, i + 2, size(__ds) - i - 1), "
                "b -> struct(a AS doc_a, b AS doc_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def minhash_lsh_pairs_sql(
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    max_band_size: int | None = MAX_BAND_SIZE,
) -> str:
    # NOTE: F.hash (Murmur3) has no DuckDB twin, so the SQL oracle bands on
    # the raw signature tuple instead of its hash — identical pair set.
    rows_per_band = k // bands
    sig = minhash_signatures_sql(k)
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        + "concat_ws(',', "
        + ", ".join(f"mh_{b * rows_per_band + r}" for r in range(rows_per_band))
        + ") AS band_key FROM sig"
        for b in range(bands)
    )
    cap = (
        f""",
capped AS (
  SELECT doc_id, band_id, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bs FROM bands
  ) WHERE bs <= {max_band_size}
)"""
        if max_band_size is not None
        else ", capped AS (SELECT * FROM bands)"
    )
    return f"""
WITH sig AS ({sig}),
bands AS ({band_selects}){cap}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
FROM capped a JOIN capped b
  ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash: bit b set iff sum over tokens of (bit b of token hash
    ? +1 : -1) > 0. Columns: doc_id, simhash."""
    toks = tokens(F.col("text"))
    dt = (
        documents.select("doc_id", F.explode(toks).alias("tok"))
        .select("doc_id", h64(F.col("tok")).alias("th"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(bits)
    ]
    summed = dt.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return summed.select("doc_id", sim.alias("simhash"))


def simhash_sql(bits: int = SIMHASH_BITS) -> str:
    th = h64_sql("t.tok")
    bit_sums = ", ".join(
        f"sum(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{b}"
        for b in range(bits)
    )
    sim = " + ".join(
        f"CASE WHEN s_{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(bits)
    )
    return f"""
WITH dt AS (
  SELECT doc_id, {th} AS th
  FROM documents, unnest({tokens_sql("text")}) AS t(tok)
),
sums AS (SELECT doc_id, {bit_sums} FROM dt GROUP BY doc_id)
SELECT doc_id, {sim} AS simhash FROM sums ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup pairs
# ---------------------------------------------------------------------------


MAX_SHINGLE_DF = 100  # hot-shingle guard: a shingle shared by d docs makes
# d^2/2 join rows; shingles past the doc-frequency cap carry no dedup signal
# (boilerplate) and are dropped from the sets on BOTH engines identically.


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = SHINGLE_N,
    threshold: float = 0.6,
    max_df: int | None = MAX_SHINGLE_DF,
) -> DataFrame:
    """Pairs with shingle-set Jaccard >= threshold (over the df-capped
    shingle sets — boilerplate shingles in > max_df docs are excluded from
    both intersection and union, bounding the self-join blowup).

    Columns: doc_a, doc_b, jaccard (rounded to 4 dp).
    |A ∩ B| from the shingle equi-join; |A ∪ B| = |A| + |B| - |A ∩ B| from
    precomputed distinct-shingle counts — no quadratic text comparison.
    """
    # PLAN (round 6): single lineage — the previous formulation reused the
    # df-capped shingle stream FOUR times (join a-side, join b-side, sizes
    # for doc_a, sizes for doc_b) and Catalyst recomputed the full explode +
    # md5 + distinct + window pipeline for each (no exchange reuse; see
    # plans/r06/dedup_ngram_jaccard_before.txt: four Scan+Generate+two-
    # Exchange subtrees). Now: distinct (doc, sh) -> df-cap window by sh ->
    # per-doc size window by doc -> group each shingle's (doc, n_sh) list ->
    # expand i<j pairs from the array -> count per pair. |A∩B| and
    # |A|/|B| are byte-identical to before (window count == group size; the
    # pair set is all in-bucket combinations), so jaccard is unchanged.
    # One scan, one md5 pass, five exchanges total (guide §2.4).
    ds = _doc_shingle_hashes(documents)
    if max_df is not None:
        ds = cap_shingle_df(ds, max_df)
    wd = Window.partitionBy("doc_id")
    with_sizes = ds.withColumn("n_sh", F.count("*").over(wd))
    grouped = (
        with_sizes.groupBy("sh")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "n_sh"))
            ).alias("__ds")
        )
        .filter(F.size("__ds") >= 2)
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(__ds, (a, i) -> "
                "transform(slice(__ds, i + 2, size(__ds) - i - 1), "
                "b -> struct(a.doc_id AS doc_a, b.doc_id AS doc_b, "
                "a.n_sh AS na, b.n_sh AS nb))))"
            )
        ).alias("p")
    ).select("p.*")
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count("*").alias("n_inter"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    return (
        inter.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_sql(
    n: int = SHINGLE_N,
    threshold: float = 0.6,
    max_df: int | None = MAX_SHINGLE_DF,
) -> str:
    shingles = word_shingles_sql(tokens_sql("text"), n)
    cap = (
        f"""ds AS (
  SELECT doc_id, sh FROM (
    SELECT *, count(*) OVER (PARTITION BY sh) AS df FROM ds0
  ) WHERE df <= {max_df}
),"""
        if max_df is not None
        else "ds AS (SELECT * FROM ds0),"
    )
    return f"""
WITH ds0 AS (
  SELECT DISTINCT doc_id, {h64_sql("s.shingle")} AS sh
  FROM documents, unnest({shingles}) AS s(shingle)
),
{cap}
sizes AS (SELECT doc_id, count(*) AS n_sh FROM ds GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM ds a JOIN ds b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 4) >= {threshold}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# Blocked edit-distance (Levenshtein) fuzzy pairs
# ---------------------------------------------------------------------------

LEV_PREFIX = 16  # blocking key length (chars of normalized prefix)
LEV_MAXLEN = 64  # compare a bounded prefix: edit distance is O(len^2) per pair


def levenshtein_pairs(
    documents: DataFrame, max_dist: int = 8, prefix: int = LEV_PREFIX
) -> DataFrame:
    """Near-identical document pairs by edit distance on a bounded text
    prefix, blocked so it never goes all-pairs: candidates must share the
    first `prefix` normalized characters (documents differing that early
    can't be near-identical anyway), then exact Levenshtein <= max_dist on
    the first LEV_MAXLEN chars. Complements the set-based dedup family
    (Jaccard/MinHash/SimHash) with an ORDER-sensitive measure — "ab cd" vs
    "cd ab" are identical sets but distant strings.

    Scale shape: one shuffle on the block key; pair blowup is bounded by
    block sizes (same guard philosophy as MAX_SHINGLE_DF — a pathological
    corpus sharing one prefix should raise `prefix`). Levenshtein is exact
    DP, bit-identical across engines.

    Columns: doc_a, doc_b, edit_dist.
    """
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    d = documents.select(
        F.col("doc_id"),
        F.substring(norm, 1, prefix).alias("blk"),
        F.substring(norm, 1, LEV_MAXLEN).alias("head"),
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"), "blk", F.col("head").alias("head_a")
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"), "blk", F.col("head").alias("head_b")
    )
    return (
        a.join(b, "blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("head_a", "head_b").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_dist)
    )


def levenshtein_pairs_sql(max_dist: int = 8, prefix: int = LEV_PREFIX) -> str:
    norm = "lower(regexp_replace(text, '\\s+', ' ', 'g'))"
    return f"""
WITH d AS (
  SELECT doc_id,
         substring({norm}, 1, {prefix}) AS blk,
         substring({norm}, 1, {LEV_MAXLEN}) AS head
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.head, b.head) AS edit_dist
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= {max_dist}
ORDER BY doc_a, doc_b
"""
