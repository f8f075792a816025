"""Deterministic change-feed generators (no RNG, no wall clock).

Reference analogue: the seeded Cypher fixture generators in the reference's
``README.md:40-122`` (``foreach (x in range(1,10) | create ...)``). Every
value here is a pure function of the event's position, so any scale factor
reproduces byte-identically — required for replay-equivalence testing and the
two-parallelism benchmark (same input at local[N] and local[4N]).

Two families:

* ``gen_feed`` — synthetic conversations, fully parameterized (updates,
  deletes, duplicate deliveries, hot-key skew, late events, v2 schema with
  the ``tool`` column). Generated with ``spark.range`` + column expressions —
  distributed, no driver-side loops, scales to 10^9+ events.
* ``feed_from_tpch`` — derives a transcripts change feed from the provided
  read-only TPC-H-ish tables (orders/lineitem), for bench + the driver's
  flagship entry; conversations = orders, turns = line numbers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = "2024-01-01 00:00:00"
ROLES = ["user", "assistant", "system", "tool"]


def _with_payload(df: DataFrame, rev_col, v2_from_lsn: int | None) -> DataFrame:
    """Attach deterministic payload columns given conv_id/turn_idx/lsn/op/rev."""
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (F.col("turn_idx") % 4 + 1).cast("int")
    )
    text = F.concat(
        role,
        F.lit(" turn "),
        F.col("turn_idx").cast("string"),
        F.lit(" of "),
        F.col("conv_id"),
        F.lit(" rev "),
        rev_col.cast("string"),
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_EPOCH).cast("timestamp")) + F.col("lsn")
    )
    df = (
        df.withColumn("role", F.when(F.col("op") == "D", F.lit(None)).otherwise(role))
        .withColumn("text", F.when(F.col("op") == "D", F.lit(None)).otherwise(text))
        .withColumn("ts", ts)
        .withColumn(
            "source_part", F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int")
        )
    )
    if v2_from_lsn is not None:
        tool = F.when(
            (F.col("lsn") >= v2_from_lsn) & (F.col("op") != "D"),
            F.concat(F.lit("tool_"), F.pmod(F.col("lsn"), F.lit(5)).cast("string")),
        )
        df = df.withColumn("tool", tool)
    return df


def gen_feed(
    spark: SparkSession,
    n_convs: int = 10,
    turns_per_conv: int = 10,
    updates_per_key: int = 0,
    delete_every: int = 0,
    duplicate: bool = False,
    hot_conv_share: float = 0.0,
    v2_from_lsn: int | None = None,
) -> DataFrame:
    """Deterministic change-event DataFrame (columns: lsn, op, conv_id,
    turn_idx, role, text, [tool], ts, source_part).

    * inserts: every (conv, turn) once, lsn = row ordinal.
    * updates: `updates_per_key` extra revisions for every key whose
      ``(conv*turns+turn) % 3 == 0``, with strictly higher lsn per revision.
    * deletes: op='D' for keys with ordinal % `delete_every` == 1 (if set),
      at lsn above all updates.
    * duplicate: every event emitted twice with the SAME lsn (at-least-once
      delivery; idempotency fixture).
    * hot_conv_share: fraction of EXTRA update events all hitting conv 0
      turn 0 (skew fixture).
    """
    n_base = n_convs * turns_per_conv
    conv = F.concat(
        F.lit("conv_"), F.lpad((F.col("id") / turns_per_conv).cast("long").cast("string"), 6, "0")
    )
    base = (
        spark.range(n_base)
        .withColumn("conv_id", conv)
        .withColumn("turn_idx", (F.col("id") % turns_per_conv).cast("int"))
        .withColumn("lsn", F.col("id"))
        .withColumn("op", F.lit("I"))
    )
    parts = [_prep(base)]
    next_lsn = n_base

    if updates_per_key > 0:
        upd_keys = base.filter(F.col("id") % 3 == 0).select("id", "conv_id", "turn_idx")
        revs = spark.range(1, updates_per_key + 1).withColumnRenamed("id", "rev")
        upd = (
            upd_keys.crossJoin(revs)
            .withColumn("lsn", F.lit(next_lsn) + F.col("id") * updates_per_key + (F.col("rev") - 1))
            .withColumn("op", F.lit("U"))
        )
        parts.append(_prep(upd.drop("id")))
        next_lsn += n_base * updates_per_key

    if hot_conv_share > 0:
        n_hot = int(n_base * hot_conv_share / max(1e-9, 1 - hot_conv_share))
        hot = (
            spark.range(n_hot)
            .withColumn("conv_id", F.lit("conv_000000"))
            .withColumn("turn_idx", F.lit(0).cast("int"))
            .withColumn("lsn", F.lit(next_lsn) + F.col("id"))
            .withColumn("op", F.lit("U"))
        )
        parts.append(_prep(hot.drop("id")))
        next_lsn += n_hot

    if delete_every > 0:
        # lsn above everything, offset by the base ordinal (no global window —
        # a Window.orderBy() here would serialize the whole feed on one task)
        dels = (
            base.filter(F.col("id") % delete_every == 1)
            .select("conv_id", "turn_idx", "id")
            .withColumn("lsn", F.lit(next_lsn) + F.col("id"))
            .withColumn("op", F.lit("D"))
            .drop("id")
        )
        parts.append(_prep(dels))

    events = parts[0]
    for p in parts[1:]:
        events = events.unionByName(p, allowMissingColumns=True)

    # revision number = how many prior events this key had; derivable: rev 0
    # for inserts, rev r for updates (encoded above via rev col), 0 for hot.
    events = _with_payload(events, F.coalesce(F.col("rev"), F.lit(0)), v2_from_lsn)
    events = events.drop("rev")
    if duplicate:
        events = events.unionByName(events)
    cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text"]
    if v2_from_lsn is not None:
        cols.append("tool")
    cols += ["ts", "source_part"]
    return events.select(*cols)


def _prep(df: DataFrame) -> DataFrame:
    """Normalize a part to (conv_id, turn_idx, lsn, op, rev?)."""
    if "rev" not in df.columns:
        df = df.withColumn("rev", F.lit(None).cast("long"))
    return df.select("conv_id", F.col("turn_idx").cast("int").alias("turn_idx"), "lsn", "op", "rev")


def write_feed_chunks(
    events: DataFrame, out_dir: str, chunk_size: int = 1000
) -> list[str]:
    """Write the feed as lsn-ordered parquet chunk files — the WAL directory a
    streaming query tails. One chunk ≈ one reference transaction batch
    (``VERTICES_BATCH_SIZE=1000``, Migrator:58). Returns chunk paths in order.
    """
    os.makedirs(out_dir, exist_ok=True)
    chunked = events.withColumn(
        "__chunk", (F.col("lsn") / chunk_size).cast("long")
    )
    chunked.repartition(1).sortWithinPartitions("lsn").write.partitionBy(
        "__chunk"
    ).mode("overwrite").parquet(out_dir + "/_staging")
    # flatten staging dirs into flat, name-ordered files (streaming source
    # lists files; flat layout keeps it simple)
    paths = []
    staging = out_dir + "/_staging"
    for entry in sorted(
        (e for e in os.listdir(staging) if e.startswith("__chunk=")),
        key=lambda e: int(e.split("=")[1]),
    ):
        chunk_no = int(entry.split("=")[1])
        src_dir = os.path.join(staging, entry)
        files = [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
        for i, f in enumerate(sorted(files)):
            dst = os.path.join(out_dir, f"chunk-{chunk_no:06d}-{i}.parquet")
            os.replace(os.path.join(src_dir, f), dst)
            paths.append(dst)
    import shutil

    shutil.rmtree(staging)
    return paths


def replicate_feed(feed: DataFrame, times: int) -> DataFrame:
    """Deterministically scale a change feed by `times`: each replica gets a
    distinct conv_id suffix (so key cardinality scales with volume — lsn
    order per key is preserved; lsn values may repeat across different keys,
    which is harmless: LWW only orders within a key)."""
    if times <= 1:
        return feed
    reps = F.explode(F.sequence(F.lit(0), F.lit(times - 1))).alias("__rep")
    return (
        feed.select("*", reps)
        .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("#"), F.col("__rep")))
        .drop("__rep")
    )


def _tpch_hashed_base(
    spark: SparkSession, sf_dir: str, parallelism: int | None = None
):
    """Shared front of the lineitem-derived feeds: the projected base
    columns plus the content-hash ordinal (h64, 60 bits) both op bands
    and the patch bands offset from. Returns (base DataFrame, ordinal
    Column)."""
    from .functions.hashes import h64

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    if parallelism:
        # the fixture is one small parquet file (1-2 splits); repartition the
        # RAW columns first so the md5/text derivation below parallelizes
        li = li.repartition(parallelism)
    conv = F.concat(F.lit("conv_"), F.lpad(F.col("l_orderkey").cast("string"), 9, "0"))
    base = li.select(
        conv.alias("conv_id"),
        F.col("l_linenumber").cast("int").alias("turn_idx"),
        F.col("l_partkey"),
        F.col("l_suppkey"),
        F.col("l_quantity"),
        F.col("l_shipdate"),
    )
    content = F.concat_ws(
        "|",
        F.col("conv_id"),
        F.col("turn_idx").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_quantity").cast("string"),
    )
    return base, h64(content)


def feed_from_tpch(
    spark: SparkSession,
    sf_dir: str,
    updates: bool = True,
    deletes: bool = True,
    parallelism: int | None = None,
    cluster_by_key: bool | str = False,
) -> DataFrame:
    """Derive a deterministic transcripts change feed from the provided
    read-only TPC-H-ish tables: conversation = order, turn = line number,
    text from part/supplier attributes. Inserts for every lineitem; one
    update revision for lines with l_partkey % 3 == 0; deletes for lines
    with l_partkey % 17 == 0.

    (l_orderkey, l_linenumber) is NOT unique in the fixture data, so the
    lsn is a content hash (h64, 60 bits) banded by op — deterministic,
    engine-portable (the SQL oracle recomputes it verbatim), and totally
    ordered the same way in both engines. Update band > insert band and
    delete band > update band, mirroring arrival order semantics.

    PLAN (round 6): ONE lineitem scan — each source row explodes into its
    op-band events (I always, U/D on their modulo predicates) from an
    in-row struct array, with the md5 ordinal materialized as a column
    first so it is computed once per source row. The previous three-branch
    union scanned lineitem three times and hashed 1.39x the rows; worse,
    every event row's md5/text derivation ran below any later exchange —
    i.e. in the scan stage's 1-3 input-split tasks (a 100 MB parquet file
    is a single 128 MB split) instead of on all cores. `cluster_by_key`
    repartitions the RAW projection by conv_id BEFORE the derivation:
    callers that immediately need conv_id clustering (the LWW replay ->
    conversation-analytics pipeline) get the heavy expressions evaluated
    post-shuffle on every core, the exchange carries the narrow raw
    columns instead of derived text, and no further shuffle exists
    anywhere downstream (guide §2.3/§2.4). Row multiset is identical
    either way; only arrival order differs, which nothing downstream
    observes (LWW orders by lsn).
    """
    return _tpch_feed_events(
        spark, sf_dir, updates=updates, deletes=deletes, patches=False,
        parallelism=parallelism, cluster_by_key=cluster_by_key,
    )


def _tpch_feed_events(
    spark: SparkSession,
    sf_dir: str,
    updates: bool,
    deletes: bool,
    patches: bool,
    parallelism: int | None,
    cluster_by_key: bool | str,
) -> DataFrame:
    """Single-scan band-explode core shared by feed_from_tpch (I/U/D) and
    patch_feed_from_tpch (+ the two op='P' bands)."""
    base, ordinal = _tpch_hashed_base(spark, sf_dir, parallelism)
    if cluster_by_key == "range":
        # RANGE partitioning: satisfies the same per-conv
        # ClusteredDistribution for every downstream aggregate/window, AND
        # lets a trailing orderBy(conv_id, ...) elide its range exchange
        # (RangePartitioning(conv_id) prefix-satisfies the
        # OrderedDistribution), so the expensive derived segment is never
        # recomputed by a sort's range-bound sampling job — only this
        # cheap raw projection is sampled (guide §2.4: establish the
        # partitioning once, in the right place). Use for pipelines whose
        # final sort leads with conv_id; plain hash clustering otherwise
        # (no sampling job at all).
        base = base.repartitionByRange("conv_id")
    elif cluster_by_key:
        base = base.repartition("conv_id")
    base = base.withColumn("__h", ordinal)  # md5 once per source row
    n_span = F.lit(1 << 60).cast("long") * 2  # op band offset
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (F.col("turn_idx") % 4 + 1).cast("int"),
    )
    tool = F.when(
        F.col("l_suppkey") % 2 == 0,
        F.concat(F.lit("tool_"), (F.col("l_suppkey") % 5).cast("string")),
    ).otherwise(F.lit(None).cast("string"))
    ts = F.col("l_shipdate").cast("timestamp")
    h = F.col("__h")

    def text(rev: int):
        return F.concat(
            role,
            F.lit(" says: part "),
            F.col("l_partkey").cast("string"),
            F.lit(" qty "),
            F.col("l_quantity").cast("string"),
            F.lit(" rev "),
            F.lit(rev).cast("string"),
        )

    def band(lsn_col, op: str, role_c, text_c, tool_c, ts_c):
        return F.struct(
            lsn_col.alias("lsn"),
            F.lit(op).alias("op"),
            role_c.alias("role"),
            text_c.alias("text"),
            tool_c.alias("tool"),
            ts_c.alias("ts"),
        )

    null_s = F.lit(None).cast("string")
    bands = [band(h, "I", role, text(0), tool, ts)]
    if updates:
        bands.append(
            F.when(
                F.col("l_partkey") % 3 == 0,
                band(h + n_span, "U", role, text(1), tool, ts),
            )
        )
    if deletes:
        bands.append(
            F.when(
                F.col("l_partkey") % 17 == 0,
                band(h + n_span + n_span, "D", null_s, null_s, null_s, ts),
            )
        )
    if patches:
        null_ts = F.lit(None).cast("timestamp")
        bands.append(
            F.when(
                F.col("l_suppkey") % 4 == 1,
                band(
                    h + n_span * 3, "P", null_s, null_s,
                    F.concat(
                        F.lit("patched_"), (F.col("l_suppkey") % 5).cast("string")
                    ),
                    null_ts,
                ),
            )
        )
        bands.append(
            F.when(
                F.col("l_partkey") % 5 == 0,
                band(
                    h + n_span * 3 + F.lit(1 << 60).cast("long"), "P", null_s,
                    F.concat(
                        F.lit("patched: part "), F.col("l_partkey").cast("string")
                    ),
                    null_s, null_ts,
                ),
            )
        )
    events = base.select(
        "conv_id",
        "turn_idx",
        F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int").alias("source_part"),
        F.explode(
            F.filter(F.array(*bands), lambda x: x.isNotNull())
        ).alias("e"),
    )
    return events.select(
        F.col("e.lsn").alias("lsn"),
        F.col("e.op").alias("op"),
        "conv_id",
        "turn_idx",
        F.col("e.role").alias("role"),
        F.col("e.text").alias("text"),
        F.col("e.tool").alias("tool"),
        F.col("e.ts").alias("ts"),
        "source_part",
    )


def patch_feed_from_tpch(
    spark: SparkSession,
    sf_dir: str,
    parallelism: int | None = None,
    cluster_by_key: bool | str = False,
) -> DataFrame:
    """``feed_from_tpch`` plus two PARTIAL-update bands (op='P', null
    payload columns mean "untouched") ABOVE the delete band:

    - tool patches for ``l_suppkey % 4 == 1`` (band 3x),
    - text patches for ``l_partkey % 5 == 0``  (band 3.5x).

    Band arithmetic stays within int64: h < 2^60 and the highest band
    offset is 3.5 * 2^61, so lsn ≤ 2^63 - 1 exactly. The patch filters
    overlap the delete band's (%17), so a correct column-level resolver
    (``cdc/lww.lww_resolve_patch``) must IGNORE patches landing on
    deleted keys — the contract query exercises that edge at data scale.

    Round 6: the patch bands ride the same single-scan band explode as
    the I/U/D feed (previously two extra lineitem scans + md5 passes);
    see feed_from_tpch's plan note.
    """
    return _tpch_feed_events(
        spark, sf_dir, updates=True, deletes=True, patches=True,
        parallelism=parallelism, cluster_by_key=cluster_by_key,
    )


def meta_feed_from_tpch(
    spark: SparkSession, sf_dir: str, parallelism: int | None = None
) -> DataFrame:
    """Second deterministic CDC source: per-conversation METADATA derived
    from the orders table (conversation = order, one row per conv_id),
    joinable to the transcripts feed on conv_id. Inserts for every order;
    a channel-reassignment update for o_custkey % 5 == 0; deletes
    (conversation unregistered) for o_custkey % 13 == 0.

    Same lsn scheme as ``feed_from_tpch``: content-hash ordinal (h64,
    60 bits) banded by op, so the DuckDB oracle recomputes the identical
    feed and any arrival order LWW-reduces to the same state. This is the
    dimension side of the two-source incremental join view
    (``lake.materialize.IncrementalJoinView``)."""
    from .functions.hashes import h64

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    if parallelism:
        orders = orders.repartition(parallelism)
    conv = F.concat(
        F.lit("conv_"), F.lpad(F.col("o_orderkey").cast("string"), 9, "0")
    )
    base = orders.select(
        conv.alias("conv_id"),
        F.col("o_custkey"),
        F.col("o_orderpriority"),
        F.col("o_orderdate"),
    )
    content = F.concat_ws(
        "|",
        F.col("conv_id"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderpriority"),
    )
    ordinal = h64(content)
    n_span = F.lit(1 << 60).cast("long") * 2  # op band offset

    def payload(df: DataFrame, rev: int) -> DataFrame:
        channel = F.concat(
            F.lit("ch_"),
            F.pmod(F.col("o_custkey") + F.lit(rev), F.lit(7)).cast("string"),
        )
        return (
            df.withColumn("channel", channel)
            .withColumn("priority", F.col("o_orderpriority"))
            .withColumn("ts", F.col("o_orderdate").cast("timestamp"))
        )

    inserts = payload(base.withColumn("lsn", ordinal).withColumn("op", F.lit("I")), 0)
    upd = payload(
        base.filter(F.col("o_custkey") % 5 == 0)
        .withColumn("lsn", ordinal + n_span)
        .withColumn("op", F.lit("U")),
        1,
    )
    del_ = (
        base.filter(F.col("o_custkey") % 13 == 0)
        .withColumn("lsn", ordinal + n_span + n_span)
        .withColumn("op", F.lit("D"))
        .withColumn("channel", F.lit(None).cast("string"))
        .withColumn("priority", F.lit(None).cast("string"))
        .withColumn("ts", F.col("o_orderdate").cast("timestamp"))
    )
    out = inserts.unionByName(upd).unionByName(del_)
    return out.select("lsn", "op", "conv_id", "channel", "priority", "ts")
