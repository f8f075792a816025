"""Driver-side XXH64 == Spark's xxhash64, bit for bit, across every type
the bucket router supports. This equivalence is the correctness contract
for lookup()'s job-free routing: a single mismatching value would route a
point lookup to the wrong bucket and silently return empty."""

import datetime
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from orientdb_neo4j_importer_plugin_spark.functions.xxhash import spark_xxhash64


def _check_batch(spark, cases):
    """One Spark job for the whole batch (not one per value)."""
    rows = []
    exprs = []
    for i, (v, dt) in enumerate(cases):
        exprs.append(F.xxhash64(F.lit(v).cast(dt)).alias(f"h{i}"))
    got = spark.range(1).select(*exprs).first()
    for i, (v, dt) in enumerate(cases):
        mine = spark_xxhash64(v, dt)
        assert mine is not None, f"unsupported: {dt} {v!r}"
        assert mine == got[f"h{i}"], f"{dt} {v!r}: {mine} != {got[f'h{i}']}"
        rows.append(mine)
    return rows


def test_integral_types(spark):
    rng = random.Random(11)
    cases = [(0, T.LongType()), (-1, T.LongType()), (2**63 - 1, T.LongType()),
             (-(2**63), T.LongType()), (0, T.IntegerType()), (-1, T.IntegerType())]
    for _ in range(25):
        cases.append((rng.randint(-(2**31), 2**31 - 1), T.IntegerType()))
        cases.append((rng.randint(-(2**63), 2**63 - 1), T.LongType()))
        cases.append((rng.randint(-128, 127), T.ByteType()))
        cases.append((rng.randint(-(2**15), 2**15 - 1), T.ShortType()))
    cases += [(True, T.BooleanType()), (False, T.BooleanType())]
    _check_batch(spark, cases)
    # width sensitivity: the bug class this module exists to not re-create
    assert spark_xxhash64(42, T.IntegerType()) != spark_xxhash64(42, T.LongType())


def test_strings_all_tail_lengths(spark):
    """Cover every code path: <32 bytes, 32-byte stripes, the 8-byte word
    loop, the single 4-byte word, and the final byte loop — plus multibyte
    UTF-8 so byte (not char) semantics are exercised."""
    rng = random.Random(13)
    cases = [("x" * n, T.StringType()) for n in range(0, 70)]
    cases += [
        (s, T.StringType())
        for s in ["conv-000123", "héllo wörld", "日本語テキスト", "emoji 🙂🚀",
                  "tab\tnew\nline", "mixed日本x", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢" * 5]
    ]
    for _ in range(30):
        n = rng.randint(0, 120)
        cases.append(
            ("".join(chr(rng.randint(32, 0x2FFF)) for _ in range(n)),
             T.StringType())
        )
    _check_batch(spark, cases)


def test_floats_dates_timestamps(spark):
    rng = random.Random(17)
    cases = [(0.0, T.DoubleType()), (-0.0, T.DoubleType()),
             (0.0, T.FloatType()), (-0.0, T.FloatType()),
             (1.5, T.DoubleType()), (-1.5, T.FloatType())]
    for _ in range(15):
        cases.append((rng.uniform(-1e9, 1e9), T.DoubleType()))
        cases.append((round(rng.uniform(-1e3, 1e3), 3), T.FloatType()))
    cases += [
        (datetime.date(1970, 1, 1), T.DateType()),
        (datetime.date(2024, 2, 29), T.DateType()),
        (datetime.date(1969, 7, 20), T.DateType()),
        (datetime.datetime(2024, 3, 1, 12, 34, 56, 789012), T.TimestampType()),
        (datetime.datetime(1970, 1, 1), T.TimestampType()),
        (datetime.datetime(1960, 6, 1, 1, 2, 3, 4), T.TimestampType()),
    ]
    _check_batch(spark, cases)


def test_lookup_routes_without_a_job(spark, tmp_path):
    """lookup() on a string partition key takes the driver-side route and
    still lands on the right bucket (same rows as a full-scan filter)."""
    from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
    from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
    from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
    from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1

    feed = gen_feed(
        spark, n_convs=12, turns_per_conv=4, updates_per_key=1, delete_every=0
    )
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    apply_changes(feed, table, batch_id="b0", mode="mor")
    for conv in [r["conv_id"] for r in
                 table.read().select("conv_id").distinct().limit(4).collect()]:
        got = {(r["conv_id"], r["turn_idx"])
               for r in table.lookup({"conv_id": conv}).collect()}
        want = {(r["conv_id"], r["turn_idx"])
                for r in table.read().filter(F.col("conv_id") == conv).collect()}
        assert got == want and got


def test_timestamp_routing_matches_spark_under_non_utc_tz(spark):
    """Code-review r3 regression: a naive datetime literal is converted by
    PySpark via the driver's OS-LOCAL timezone (time.mktime), not UTC —
    the driver-side hash must reproduce exactly that, or timestamp-keyed
    lookups route to the wrong bucket on any non-UTC host. The Spark
    session in this test shares the worker's TZ, so we compare against the
    live F.lit conversion rather than assuming a zone."""
    import datetime as dt

    from orientdb_neo4j_importer_plugin_spark.functions.xxhash import (
        spark_xxhash64,
    )

    vals = [
        dt.datetime(2024, 3, 1, 12, 34, 56, 789012),
        dt.datetime(1970, 1, 1),
        dt.datetime(2031, 12, 31, 23, 59, 59, 1),
    ]
    for v in vals:
        want = (
            spark.range(1)
            .select(F.xxhash64(F.lit(v).cast(T.TimestampType())).alias("h"))
            .first()["h"]
        )
        assert spark_xxhash64(v, T.TimestampType()) == want

    # tz-aware values must NOT crash: either match Spark or return None
    aware = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    got = spark_xxhash64(aware, T.TimestampType())
    if got is not None:
        want = (
            spark.range(1)
            .select(F.xxhash64(F.lit(aware).cast(T.TimestampType())).alias("h"))
            .first()["h"]
        )
        assert got == want
