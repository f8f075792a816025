"""Per-file key bloom filters: build math, driver/JVM hash agreement,
lookup pruning on MOR deltas and cluster_by-compacted bases, persistence."""

import numpy as np
import pytest

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
from orientdb_neo4j_importer_plugin_spark.functions import bloom as bl
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1


# -- pure-python unit layer ----------------------------------------------------


def test_bloom_params_sizing():
    m, k = bl.bloom_params(1000, 0.01)
    assert m % 64 == 0
    assert 9000 <= m <= 10112  # ~9.585 bits/key, word-aligned
    assert k == 7
    assert bl.realized_fpp(1000, m, k) < 0.012
    # cap respected, k re-derived
    m2, k2 = bl.bloom_params(10_000_000, 0.01, max_bits=1 << 16)
    assert m2 == 1 << 16 and 1 <= k2 <= 16


def test_bloom_no_false_negatives_and_fpp():
    rng = np.random.default_rng(7)
    member = rng.integers(-(2**63), 2**63 - 1, size=5000, dtype=np.int64)
    m, k = bl.bloom_params(len(member), 0.01)
    bits = bl.build_bloom(member, m, k)
    assert len(bits) == m // 8
    for h in member[:500].tolist() + member[-500:].tolist():
        assert bl.might_contain(bits, m, k, int(h))
    probe = rng.integers(-(2**63), 2**63 - 1, size=20_000, dtype=np.int64)
    members = set(member.tolist())
    fp = sum(
        1
        for h in probe.tolist()
        if h not in members and bl.might_contain(bits, m, k, int(h))
    )
    assert fp / len(probe) < 0.03  # target 1%, generous CI bound


def test_bloom_b64_roundtrip():
    bits = bl.build_bloom(np.array([1, -2, 3], dtype=np.int64), 256, 5)
    assert bl.decode_bloom(bl.encode_bloom(bits)) == bits


# -- table integration ---------------------------------------------------------


def _mor_table(spark, tmp_path, **create_kw):
    feed = gen_feed(
        spark, n_convs=64, turns_per_conv=6, updates_per_key=2, delete_every=7
    )
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS_V1, "conv_id", num_buckets=4,
        **create_kw,
    )
    # several MOR batches -> multiple delta files per bucket, each spanning
    # nearly the full key range (min/max skipping is blind here). Slice by
    # CONVERSATION so each key's events live in exactly one delta per
    # bucket: the measurable pruning win for present keys
    for i in range(4):
        apply_changes(
            feed.filter(f"pmod(xxhash64(conv_id, 7), 4) = {i}"),
            table,
            batch_id=f"b{i}",
            mode="mor",
        )
    return table


def _skips(table, conv):
    snap = table.current()
    types = {f.name: f.dataType for f in snap.schema.fields}
    b = table._route_bucket(conv, types[snap.partition_key], snap.num_buckets)
    kept_b, kept_d, skipped = table._lookup_files(b, conv, snap)
    return len(kept_b) + len(kept_d), skipped


def test_bloom_prunes_delta_files_lookup_still_exact(spark, tmp_path):
    plain = _mor_table(spark, tmp_path / "plain")
    bloomed = _mor_table(spark, tmp_path / "bloomed", bloom_fpp=0.01)
    want = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in plain.read().collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in bloomed.read().collect()
    }
    assert want == got  # blooms change IO, never results
    convs = sorted({c for c, _ in want})
    total_plain = total_bloom = 0
    for conv in convs[:12]:
        rows = bloomed.lookup({"conv_id": conv}).collect()
        assert {(r["conv_id"], r["turn_idx"]) for r in rows} == {
            kk for kk in want if kk[0] == conv
        }
        kept_p, _ = _skips(plain, conv)
        kept_b, _ = _skips(bloomed, conv)
        assert kept_b <= kept_p
        total_plain += kept_p
        total_bloom += kept_b
    # a conversation's events hit 1-2 of the 4 lsn-sliced batches on
    # average; the bloom must prove most non-containing deltas absent
    assert total_bloom < total_plain


def test_bloom_absent_key_prunes_everything(spark, tmp_path):
    bloomed = _mor_table(spark, tmp_path / "b", bloom_fpp=0.001)
    kept, skipped = _skips(bloomed, "conv_does_not_exist_xyz")
    assert skipped > 0
    assert kept <= 1  # all files proven absent, modulo one fpp straggler
    assert bloomed.lookup({"conv_id": "conv_does_not_exist_xyz"}).count() == 0


def test_bloom_survives_reload_and_cluster_by_compaction(spark, tmp_path):
    table = _mor_table(spark, tmp_path / "t", bloom_fpp=0.01)
    # cluster base files by ts: key ranges widen to the full bucket, the
    # exact regime where only the bloom can prune point reads
    table.compact(max_file_rows=100, cluster_by=["ts"])
    want = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()
    }
    # FRESH instance: stats (blooms included) must come back from manifests
    reloaded = SnapshotTable.load(spark, table.root)
    conv = sorted({c for c, _ in want})[0]
    kept, skipped = _skips(reloaded, conv)
    assert skipped > 0, "ts-clustered bases must be bloom-pruned after reload"
    rows = reloaded.lookup({"conv_id": conv}).collect()
    assert {(r["conv_id"], r["turn_idx"]) for r in rows} == {
        kk for kk in want if kk[0] == conv
    }
    assert reloaded.table_props().get("bloom_fpp") == 0.01


def test_lookup_many_with_blooms(spark, tmp_path):
    table = _mor_table(spark, tmp_path / "t", bloom_fpp=0.01)
    want = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()
    }
    convs = sorted({c for c, _ in want})[:5]
    keys = [
        {"conv_id": c, "turn_idx": t} for (c, t) in sorted(want) if c in convs
    ][:20]
    got = table.lookup_many(keys).collect()
    assert {(r["conv_id"], r["turn_idx"]) for r in got} == {
        (k["conv_id"], k["turn_idx"]) for k in keys
    }


def test_maintain_enables_blooms_for_existing_table(spark, tmp_path):
    table = _mor_table(spark, tmp_path / "t")  # created WITHOUT blooms
    assert "bloom_fpp" not in table.table_props()
    summary = table.maintain(compact_if_deltas=1, bloom_fpp=0.01, changelog=False)
    assert summary["bloom_fpp"] == 0.01
    # the pass's compaction rewrote the delta backlog -> folded bases carry blooms
    stats = table.file_stats()
    assert any("key_bloom" in s for s in stats.values())
    kept, skipped = _skips(table, "conv_not_there_at_all")
    assert kept <= 1
    # and the property persists for future commits
    feed = gen_feed(spark, n_convs=8, turns_per_conv=2)
    apply_changes(feed, table, batch_id="later", mode="mor")
    new_deltas = table.current().delta_files()
    stats = table.file_stats()
    assert all("key_bloom" in stats.get(f, {}) for f in new_deltas)


def test_clone_carries_blooms_and_property(spark, tmp_path):
    src = _mor_table(spark, tmp_path / "src", bloom_fpp=0.01)
    dest = src.clone(str(tmp_path / "dest"))
    assert dest.table_props().get("bloom_fpp") == 0.01
    fresh = SnapshotTable.load(spark, dest.root)
    kept, skipped = _skips(fresh, "conv_absent_after_clone")
    assert kept <= 1 and skipped > 0
