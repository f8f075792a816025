"""Scale-guard tests for the pair-generating dedup/similarity operators:
the quadratic paths flagged in round 1 must stay bounded (frequency caps)
and bucketed (no cartesian joins) — see VERDICT.md items 3-4.
"""

import pytest
from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.operators import dedup as D
from orientdb_neo4j_importer_plugin_spark.operators import similarity as V


@pytest.fixture(scope="module")
def docs(spark):
    # 6 docs sharing one boilerplate sentence; docs 0/1 are near-identical
    boiler = "subscribe to our newsletter for updates every single day"
    rows = [
        (0, "en", f"alpha beta gamma delta epsilon zeta {boiler}"),
        (1, "en", f"alpha beta gamma delta epsilon eta {boiler}"),
        (2, "en", f"one two three four five six seven {boiler}"),
        (3, "en", f"red orange yellow green blue indigo {boiler}"),
        (4, "en", f"cat dog bird fish horse cow sheep {boiler}"),
        (5, "en", f"north south east west up down around {boiler}"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_ngram_jaccard_df_cap_drops_boilerplate(docs):
    # boilerplate shingles appear in all 6 docs; cap at 3 excludes them,
    # so only the genuinely near-identical pair (0,1) survives the threshold
    capped = D.ngram_jaccard_pairs(docs, threshold=0.3, max_df=3)
    pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert pairs == {(0, 1)}
    # uncapped, boilerplate inflates every pair's intersection
    uncapped = D.ngram_jaccard_pairs(docs, threshold=0.3, max_df=None)
    assert uncapped.count() > 1


def test_minhash_band_cap_bounds_degenerate_bucket(spark):
    # 40 byte-identical docs -> every band bucket has size 40; a cap of 10
    # removes them all (no candidate pairs), uncapped makes 40*39/2 pairs
    rows = [(i, "en", "the same degenerate text repeated verbatim") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    assert D.minhash_lsh_pairs(docs, max_band_size=10).count() == 0
    assert D.minhash_lsh_pairs(docs, max_band_size=None).count() == 40 * 39 // 2


def test_near_dup_pairs_plan_has_no_cartesian(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (
        V.near_dup_pairs(emb, dim=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_near_dup_lsh_subset_of_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lsh = {(r.vec_a, r.vec_b) for r in V.near_dup_pairs(emb, dim=64).collect()}
    exact = {(r.vec_a, r.vec_b) for r in V.near_dup_pairs_exact(emb).collect()}
    assert lsh <= exact  # no false positives: exact cosine re-checked
    # the fixture's pairs all sit at cosine 0.45-0.6 — the HARD regime for
    # hyperplane LSH. The tuned defaults (t12/p3) must hold the recall
    # floor here, not just on easy high-cosine duplicates.
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.9


def test_near_dup_recall_floor(spark):
    """Recall-floor gate for the tuned near_dup_pairs defaults on the exact
    bench regime (sf0.1, first 1000 vectors, pairs at cosine 0.45-0.6):
    >= 0.9 recall vs the exact all-pairs ground truth, zero false
    positives. Guards the defaults against silent de-tuning (VERDICT r2
    item 1: the old t4/p4 defaults scored 0.487 here)."""
    import os

    import pytest

    path = "/root/testdata/sf0.1/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("sf0.1 fixtures not present")
    from pyspark.sql import functions as F

    emb = spark.read.parquet(path).filter(F.col("vec_id") < 1000)
    exact = {(r.vec_a, r.vec_b) for r in V.near_dup_pairs_exact(emb).collect()}
    assert len(exact) >= 20  # the regime is non-trivial
    lsh = {(r.vec_a, r.vec_b) for r in V.near_dup_pairs(emb, dim=64).collect()}
    assert lsh <= exact  # zero false positives
    assert len(lsh & exact) / len(exact) >= 0.9


def test_lsh_scale_params_law():
    """The scaling law's contract: exact tuned fixed point at bench scale,
    bucket size held ~constant as the corpus grows (planes up), recall
    bought back with tables up to the cap — candidates stay linear in n."""
    from orientdb_neo4j_importer_plugin_spark.operators.similarity import (
        NEAR_DUP_MAX_TABLES,
        NEAR_DUP_TARGET_BUCKET,
        lsh_scale_params,
    )

    # fixed point: the measured recall-1.0 configuration
    for n in (1, 500, 1000, 1024):
        assert lsh_scale_params(n) == (12, 3)
    prev_planes = 0
    for n in (10**4, 10**6, 10**9):
        tables, planes = lsh_scale_params(n)
        assert planes > prev_planes  # buckets held ~constant
        prev_planes = planes
        assert tables <= NEAR_DUP_MAX_TABLES
        # expected bucket size within [target/2, target]
        assert NEAR_DUP_TARGET_BUCKET / 2 <= n / 2**planes <= NEAR_DUP_TARGET_BUCKET


def test_near_dup_duplicate_collapse_exact_pair_set(spark, sf_dir):
    """Exact-duplicate collapse preserves the pair set EXACTLY: replicate
    the corpus x3 with identical vectors (the adversarial web-crawl shape
    that measured x93 wall uncollapsed in the sf1 sweep) and the result
    must equal the exact all-pairs ground truth restricted to
    LSH-discoverable pairs — which here is all of them, since identical
    vectors share every bucket and the base pairs were recall-1.0."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rep = base.crossJoin(
        F.broadcast(spark.range(3).select(F.col("id").alias("__c")))
    ).select(
        (F.col("vec_id") + F.col("__c") * 100_000).alias("vec_id"),
        "embedding",
        *[c for c in base.columns if c not in ("vec_id", "embedding")],
    )
    got = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in V.near_dup_pairs(
            rep, dim=64, tables=V.NEAR_DUP_TABLES, planes=V.NEAR_DUP_PLANES
        ).collect()
    }
    exact = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in V.near_dup_pairs_exact(rep).collect()
    }
    base_pairs = {
        (r.vec_a, r.vec_b)
        for r in V.near_dup_pairs(
            base, dim=64, tables=V.NEAR_DUP_TABLES, planes=V.NEAR_DUP_PLANES
        ).collect()
    }
    base_exact = {
        (r.vec_a, r.vec_b) for r in V.near_dup_pairs_exact(base).collect()
    }
    assert got <= exact  # no false positives, cosines bit-exact
    if base_pairs == base_exact:  # recall 1.0 on the base regime
        assert got == exact  # ...must stay 1.0 under duplication
    # every intra-group pair present: 3 copies -> 3 pairs per distinct vec
    n_distinct = base.select("embedding").distinct().count()
    intra = {p for p in got if abs(p[0] - p[1]) % 100_000 == 0}
    assert len(intra) == 3 * n_distinct
