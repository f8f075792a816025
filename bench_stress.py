"""sf1-scale stress pass of the heavy paths (VERDICT r2 item 10).

The driver provides parquet up to sf0.1; this harness scales the WORK to
sf1-equivalent by deterministic replication of the sf0.1-derived inputs
(replicate_feed for the CDC feed; suffix-replicated documents for the
dedup pair operators) — no external data, no RNG. The question is scale
SHAPE, not absolute speed: does each heavy path grow ~linearly in rows
(x10 data -> ~x10 wall on fixed cores), or does it hit a cliff
(quadratic pair blowup, driver-side loop, spill collapse) that the
sf0.01/sf0.1 runs cannot reveal?

Covered: MOR apply (+compaction), row-level changelog materialization,
MinHash-LSH pair dedup, n-gram Jaccard pair dedup, embedding near-dup
pairs. Prints one JSON line with sf0.1 and x10 walls and the growth
factor per path.

Usage: python bench_stress.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import feed_from_tpch, replicate_feed
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.operators import dedup as D
from orientdb_neo4j_importer_plugin_spark.operators import similarity as V
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS
from orientdb_neo4j_importer_plugin_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FACTOR = int(os.environ.get("SPARK_GRAFT_STRESS_FACTOR", "10"))
N_BATCHES = 8


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def replicate_docs(docs, times: int):
    """Deterministic corpus growth: `times` copies, each with a distinct
    doc_id namespace and a copy-tag appended to the text so replicas are
    near- but not exact-duplicates (keeps dedup candidate structure
    realistic instead of degenerate all-identical)."""
    rep = docs.crossJoin(
        F.broadcast(
            docs.sparkSession.range(times).select(F.col("id").alias("__copy"))
        )
    )
    return rep.select(
        F.concat(F.col("doc_id").cast("string"), F.lit("#"), F.col("__copy")).alias(
            "doc_id"
        ),
        F.concat(F.col("text"), F.lit(" c"), F.col("__copy")).alias("text"),
        *[
            c
            for c in docs.columns
            if c not in ("doc_id", "text")
        ],
    )


def replicate_embeddings(emb, times: int):
    rep = emb.crossJoin(
        F.broadcast(
            emb.sparkSession.range(times).select(F.col("id").alias("__copy"))
        )
    )
    return rep.select(
        (F.col("vec_id") + F.col("__copy") * 1_000_000).alias("vec_id"),
        "embedding",
        *[c for c in emb.columns if c not in ("vec_id", "embedding", "__copy")],
    )


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def mor_apply_and_materialize(spark, feed, root):
    wal = os.path.join(root, "wal")
    feed.write.parquet(wal)
    feed = spark.read.parquet(wal)
    table = SnapshotTable.create(
        spark, os.path.join(root, "t"), TRANSCRIPTS, "conv_id", num_buckets=64
    )

    def apply():
        for i in range(N_BATCHES):
            apply_changes(
                feed.filter(f"pmod(lsn, {N_BATCHES}) = {i}"),
                table,
                batch_id=f"s-{i}",
                mode="mor",
                collect_stats=False,
            )

    apply_sec = timed(apply)
    compact_sec = timed(lambda: table.compact())
    mat_sec = timed(lambda: table.materialize_changelog(max_workers=8))
    return apply_sec, compact_sec, mat_sec


def dedup_paths(spark, docs):
    from orientdb_neo4j_importer_plugin_spark.operators import graph as G
    from orientdb_neo4j_importer_plugin_spark.operators import repetition as RP

    out = {}
    out["minhash_lsh_pairs"] = timed(lambda: _run(D.minhash_lsh_pairs(docs)))
    out["ngram_jaccard_pairs"] = timed(lambda: _run(D.ngram_jaccard_pairs(docs)))
    # round-3 continuation additions: hygiene + clustering growth shapes
    # hash split: replicated corpora carry string doc_ids ('12#3')
    bench_pred = "pmod(xxhash64(cast(doc_id as string)), 41) = 0"
    out["decontaminate"] = timed(
        lambda: _run(
            RP.decontaminate(
                docs.filter(f"NOT ({bench_pred})"), docs.filter(bench_pred)
            )
        )
    )
    out["repetition_signals"] = timed(
        lambda: _run(RP.repetition_signals(docs))
    )
    # components over the raw primitives: replicated corpora carry string
    # doc_ids, so skip dup_components' long cast
    out["dup_components"] = timed(
        lambda: G.connected_components(
            G.shared_shingle_edges(docs), src="doc_a", dst="doc_b"
        ).count()
    )
    return out


def main():
    spark = get_spark(master=f"local[{CPUS}]", app_name="stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    feed = feed_from_tpch(spark, SF_DIR, parallelism=CPUS * 2)

    results: dict[str, dict] = {}
    for scale, factor in (("sf0.1", 1), (f"x{FACTOR}", FACTOR)):
        d = tempfile.mkdtemp(prefix=f"stress_{factor}_")
        f = feed if factor == 1 else replicate_feed(feed, factor)
        docs_s = docs if factor == 1 else replicate_docs(docs, factor)
        emb_s = emb if factor == 1 else replicate_embeddings(emb, factor)
        # materialize replicated inputs so replication cost is untimed
        docs_path = os.path.join(d, "docs")
        docs_s.write.parquet(docs_path)
        docs_s = spark.read.parquet(docs_path)
        emb_path = os.path.join(d, "emb")
        emb_s.write.parquet(emb_path)
        emb_s = spark.read.parquet(emb_path)

        apply_sec, compact_sec, mat_sec = mor_apply_and_materialize(spark, f, d)
        r = {
            "events": f.count() if factor > 1 else feed.count(),
            "docs": docs_s.count(),
            "mor_apply_sec": apply_sec,
            "compact_sec": compact_sec,
            "cdf_materialize_sec": mat_sec,
        }
        r.update(dedup_paths(spark, docs_s))
        r["emb_near_dup_pairs_sec"] = timed(
            lambda e=emb_s: _run(V.near_dup_pairs(e, threshold=0.6))
        )
        results[scale] = r

    growth = {
        k: round(results[f"x{FACTOR}"][k] / max(results["sf0.1"][k], 1e-9), 2)
        for k in (
            "mor_apply_sec",
            "compact_sec",
            "cdf_materialize_sec",
            "minhash_lsh_pairs",
            "ngram_jaccard_pairs",
            "decontaminate",
            "repetition_signals",
            "dup_components",
            "emb_near_dup_pairs_sec",
        )
    }
    print(
        json.dumps(
            {
                "metric": f"heavy-path stress sf0.1 vs x{FACTOR} (within-run)",
                "cpus": CPUS,
                "factor": FACTOR,
                "results": results,
                "wall_growth_at_x10_data": growth,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
