"""Graph operators over document-similarity edges: connected components
for duplicate-cluster resolution.

The reference imports a property GRAPH (vertices + relationships —
``ONeo4jImporterVerticesAndEdgesMigrator.java``); this module is the one
place the engine computes ON graph structure: collapsing pairwise
near-duplicate evidence (shared shingles, LSH pairs) into transitive
duplicate CLUSTERS, the step a real dedup pipeline needs between
pair-generation and keep-one-per-cluster.

Spark-first shape: iterative min-label propagation over the edge list —
per round, every vertex takes the min of its own and its neighbors'
labels; convergence in diameter rounds. Near-duplicate clusters are small
and shallow (dups of a common ancestor), so rounds stay in the low single
digits; a `max_iter` guard raises rather than silently truncating on an
adversarial long-chain graph (for those, switch to star-contraction —
O(log²) rounds — before raising the guard). Each round is ONE join + ONE
combinable min-aggregation, both hash-partitioned on the vertex id;
labels are re-persisted per round so lineage stays shallow and each round
costs O(E) regardless of how many rounds ran before.

The DuckDB oracle computes the same fixpoint with a RECURSIVE CTE — an
independent evaluation strategy (semi-naive datalog vs synchronous
rounds) that must land on identical components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import h64_sql, tokens_sql, word_shingles_sql
from .dedup import _doc_shingle_hashes, cap_shingle_df

# shared-shingle edge defaults: 8-gram evidence, boilerplate shingles in
# more than MAX_EDGE_DF docs are dropped before the self-join (the same
# quadratic guard as ngram_jaccard_pairs / minhash_lsh_pairs)
EDGE_SHINGLE_N = 8
MAX_EDGE_DF = 20


def connected_components(
    edges: DataFrame, src: str = "u", dst: str = "v", max_iter: int = 50
) -> DataFrame:
    """Connected components of an undirected edge list.

    Returns one row per vertex appearing in `edges`: ``vertex``,
    ``component`` (= the minimum vertex id reachable from it). Raises
    RuntimeError if the fixpoint is not reached within `max_iter`
    propagation rounds — i.e. `max_iter` bounds the component DIAMETER
    (one extra detection round is always run, so a diameter-`max_iter`
    graph converges, not raises). Intermediate caches are released on
    every exit path, including mid-round Spark failures.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select("u").distinct().withColumn("label", F.col("u")).persist()
    )
    converged = False
    try:
        labels.count()
        for _ in range(max_iter + 1):  # +1: fixpoint-detection round
            nbr = sym.join(
                labels.select(F.col("u").alias("v"), "label"), on="v"
            ).select("u", "label")
            new_labels = (
                labels.unionByName(nbr)
                .groupBy("u")
                .agg(F.min("label").alias("label"))
                .persist()
            )
            changed = (
                new_labels.join(
                    labels.select("u", F.col("label").alias("__cc_old")),
                    on="u",
                )
                .filter(F.col("label") < F.col("__cc_old"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
    finally:
        sym.unpersist()
        if not converged:
            labels.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels.select(
        F.col("u").alias("vertex"), F.col("label").alias("component")
    )


def shared_shingle_edges(
    documents: DataFrame, n: int = EDGE_SHINGLE_N, max_df: int = MAX_EDGE_DF
) -> DataFrame:
    """Undirected duplicate-evidence edges: (doc_a < doc_b) pairs sharing
    at least one word n-gram, with shingles present in > max_df documents
    dropped first (boilerplate guard — bounds the per-shingle self-join at
    max_df², same discipline as the LSH band cap). Shingling and the cap
    are the shared dedup primitives (`operators/dedup`), so the guard
    logic cannot drift between the pair operators and this one."""
    capped = cap_shingle_df(_doc_shingle_hashes(documents, n=n), max_df)
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.sh") == F.col("b.sh"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def dup_components(
    documents: DataFrame, n: int = EDGE_SHINGLE_N, max_df: int = MAX_EDGE_DF
) -> DataFrame:
    """Transitive duplicate clusters over shared-shingle evidence:
    ``doc_id``, ``component_id`` (min doc_id of the cluster) for every
    document connected to at least one other. The keep-one-per-cluster
    policy is then a one-line filter (`doc_id == component_id`)."""
    comps = connected_components(
        shared_shingle_edges(documents, n=n, max_df=max_df),
        src="doc_a",
        dst="doc_b",
    )
    return comps.select(
        F.col("vertex").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component_id"),
    )


def dup_components_sql(
    n: int = EDGE_SHINGLE_N, max_df: int = MAX_EDGE_DF, table: str = "documents"
) -> str:
    """DuckDB twin of ``dup_components`` (ORDER BY doc_id): identical edge
    construction, then the component fixpoint as a RECURSIVE CTE."""
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM {table}
),
grams AS (
  SELECT doc_id, unnest({word_shingles_sql("toks", n)}) AS __cc_g FROM base
),
shingles AS (
  SELECT DISTINCT doc_id, {h64_sql("__cc_g")} AS __cc_h FROM grams
),
capped AS (
  SELECT doc_id, __cc_h FROM shingles
  QUALIFY count(*) OVER (PARTITION BY __cc_h) <= {max_df}
),
edges_d AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM capped a JOIN capped b
    ON a.__cc_h = b.__cc_h AND a.doc_id < b.doc_id
),
edges AS (
  SELECT u, v FROM edges_d UNION SELECT v AS u, u AS v FROM edges_d
),
comp AS (
  SELECT u AS doc_id, u AS label FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.v AS doc_id, c.label
  FROM comp c JOIN edges e ON e.u = c.doc_id
)
SELECT doc_id, CAST(min(label) AS BIGINT) AS component_id
FROM comp GROUP BY doc_id ORDER BY doc_id
"""
