"""Deterministic sampling invariants: membership is a pure function of the
key (stable under repartitioning), rates land near target, splits are
disjoint+exhaustive and never migrate."""

from orientdb_neo4j_importer_plugin_spark.operators import sampling as SM


def test_sample_stable_under_repartition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r.doc_id for r in SM.stratified_sample(docs).collect()}
    b = {r.doc_id for r in SM.stratified_sample(docs.repartition(13)).collect()}
    assert a == b and a  # df.sample would fail this even with a fixed seed


def test_sample_rates_near_target(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    ln = F.length("text")
    stratum = F.when(ln < 200, "short").when(ln < 400, "mid").otherwise("long")
    totals = {
        r.stratum: r.n
        for r in docs.select(stratum.alias("stratum")).groupBy("stratum")
        .agg(F.count("*").alias("n")).collect()
    }
    kept = {
        r.stratum: r.n
        for r in SM.stratified_sample(docs).groupBy("stratum")
        .agg(F.count("*").alias("n")).collect()
    }
    assert kept.get("long", 0) == totals.get("long", 0)  # rate 1.0 keeps all
    for name, rate in (("short", 0.25), ("mid", 0.5)):
        if totals.get(name, 0) >= 40:
            got = kept.get(name, 0) / totals[name]
            assert abs(got - rate) < 0.15, (name, got)


def test_split_disjoint_exhaustive_stable(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = SM.train_split(docs).collect()
    assert len(out) == docs.count()  # every doc assigned exactly once
    frac = {}
    for r in out:
        frac[r.split] = frac.get(r.split, 0) + 1
    assert set(frac) <= {"train", "val", "test"}
    assert frac["train"] / len(out) > 0.8
    # growing the corpus never reassigns an existing record
    sub = docs.limit(100)
    small = {r.doc_id: r.split for r in SM.train_split(sub).collect()}
    full = {r.doc_id: r.split for r in out}
    assert all(full[d] == s for d, s in small.items())


def test_pack_documents_invariants(spark, sf_dir):
    """Each pack fits the budget except at most its LAST member (the
    contiguous-packing overflow rule); packs are dense per bucket."""
    from pyspark.sql import functions as F

    budget = 128
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = SM.pack_documents(docs, budget=budget).collect()
    by_pack = {}
    for r in sorted(out, key=lambda r: (r.bucket, r.doc_id)):
        by_pack.setdefault((r.bucket, r.pack_id), []).append(r.n_tokens)
    for (bkt, pid), toks in by_pack.items():
        assert sum(toks) - toks[-1] < budget, (bkt, pid, toks)
    # dense pack ids per bucket (0..max with no gaps)
    per_bucket = {}
    for (bkt, pid) in by_pack:
        per_bucket.setdefault(bkt, set()).add(pid)
    for bkt, pids in per_bucket.items():
        assert pids == set(range(max(pids) + 1)), (bkt, sorted(pids))
    # every document packed exactly once
    assert len(out) == docs.count()


def test_quality_weighted_sample_proportional_and_stable(spark):
    from orientdb_neo4j_importer_plugin_spark.operators.sampling import (
        quality_weighted_sample,
    )

    # high-quality docs: long, stopword-rich; junk: short, punct-heavy
    good = "the quick brown fox jumps over the lazy dog and runs on " * 8
    junk = "!!! ??? ,,, ;;;"
    docs = spark.createDataFrame(
        [(i, good if i % 2 == 0 else junk) for i in range(2000)],
        "doc_id long, text string",
    )
    kept = quality_weighted_sample(docs).collect()
    by_parity = {0: 0, 1: 0}
    for r in kept:
        by_parity[r["doc_id"] % 2] += 1
    # quality-proportional: good docs survive at a much higher rate, junk
    # is thinned but NOT censored (floor keeps a trickle)
    assert by_parity[0] > 800  # good: near-certain keep
    assert 0 < by_parity[1] < 200  # junk: floor-rate trickle
    # clamp respected on the emitted keep probability
    assert all(500 <= r["quality_bp"] <= 10_000 for r in kept)
    # deterministic under repartition
    again = quality_weighted_sample(docs.repartition(13)).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in kept
    )
