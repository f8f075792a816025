"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — the full CDC pipeline (TPC-H-derived change
  feed -> snapshot lake table -> final transcripts state) at sf0.001.
- ``queries()``: one entry per implemented operator (SURVEY.md §2 + the
  training-data operator suite).
- ``oracle_sql()``: DuckDB twins with identical column names/semantics.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import feed_from_tpch
from orientdb_neo4j_importer_plugin_spark.functions.hashes import (
    h64_sql,
    tokens_sql,
)
from orientdb_neo4j_importer_plugin_spark.functions import normalize as N
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.operators import dedup as D
from orientdb_neo4j_importer_plugin_spark.operators import sampling as SM
from orientdb_neo4j_importer_plugin_spark.operators import sessionize as S
from orientdb_neo4j_importer_plugin_spark.operators import sketches as SK
from orientdb_neo4j_importer_plugin_spark.operators import similarity as V
from orientdb_neo4j_importer_plugin_spark.operators import pipeline as PL
from orientdb_neo4j_importer_plugin_spark.operators import graph as G
from orientdb_neo4j_importer_plugin_spark.operators import repetition as RP
from orientdb_neo4j_importer_plugin_spark.operators import temporal as TP
from orientdb_neo4j_importer_plugin_spark.operators import transcripts as TR
from orientdb_neo4j_importer_plugin_spark.operators import textstats as T
from orientdb_neo4j_importer_plugin_spark.plans import relational as R
from orientdb_neo4j_importer_plugin_spark.plans import tpch as Q
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS

EMB_DIM = 64
EMB_QUERY_IDS = [0, 1, 2, 3, 4]
EMB_TOPK = 5
# Pinned LSH configurations (fixed-text-oracle rule: the SQL twin needs
# static constants, so the contract passes them explicitly on both sides).
LSH_TOPK_TABLES, LSH_TOPK_PLANES = 12, 3  # lsh_scale_params fixed point n<=1024
LSH_MULTI_TABLES, LSH_MULTI_PLANES = 8, 4  # measured recall-1.0 explicit point
# Context budget for the transcripts_truncate_budget contract row: ~3 of the
# feed's ~8-token turns survive, so both keep and drop paths are exercised.
TRUNCATE_BUDGET_TOKENS = 24
VOCAB_VIEW_K = 100  # vocabulary-head size for the cdc_vocab_view row


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Flagship: the CDC pipeline end-to-end
# ---------------------------------------------------------------------------


def cdc_replay_state(
    spark: SparkSession, sf_dir: str, mode: str = "cow"
) -> DataFrame:
    """Full pipeline: derive change feed from lineitem, MERGE into a fresh
    snapshot table, return final transcripts state (stable key order).

    mode="mor" applies as out-of-order delta batches + compaction — the
    sustained-ingest path through the same oracle."""
    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_entry_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    if mode == "mor":
        # deliberately out-of-lsn-order batches; compaction folds deltas
        apply_changes(feed.filter("pmod(lsn, 2) = 1"), table, batch_id="e1", mode="mor")
        apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="e0", mode="mor")
        table.compact()
    else:
        apply_changes(feed, table, batch_id="entry-0")
    return (
        table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx", "text")
    )


# The oracle re-derives the same feed in SQL and reduces it with a LWW
# window — an independent engine evaluating the same CDC spec.
_FEED_SQL = f"""
  WITH base AS (
    SELECT 'conv_' || lpad(CAST(l_orderkey AS VARCHAR), 9, '0') AS conv_id,
           l_linenumber AS turn_idx,
           l_partkey, l_suppkey, l_quantity, l_shipdate,
           CASE (l_linenumber % 4) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                WHEN 2 THEN 'system' ELSE 'tool' END AS role,
           CASE WHEN l_suppkey % 2 = 0
                THEN 'tool_' || CAST(l_suppkey % 5 AS VARCHAR) END AS tool,
           CAST(l_shipdate AS TIMESTAMP) AS ts
    FROM lineitem
  ),
  hashed AS (
    SELECT *, {h64_sql("conv_id || '|' || CAST(turn_idx AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR) || '|' || CAST(l_quantity AS VARCHAR)")} AS h
    FROM base
  ),
  feed AS (
    SELECT h AS lsn, 'I' AS op, conv_id, turn_idx, role,
           role || ' says: part ' || CAST(l_partkey AS VARCHAR) || ' qty '
                || CAST(l_quantity AS VARCHAR) || ' rev 0' AS text,
           tool, ts
    FROM hashed
    UNION ALL
    SELECT h + 2305843009213693952, 'U', conv_id, turn_idx, role,
           role || ' says: part ' || CAST(l_partkey AS VARCHAR) || ' qty '
                || CAST(l_quantity AS VARCHAR) || ' rev 1' AS text,
           tool, ts
    FROM hashed WHERE l_partkey % 3 = 0
    UNION ALL
    SELECT h + 4611686018427387904, 'D', conv_id, turn_idx,
           NULL, NULL, NULL, ts
    FROM hashed WHERE l_partkey % 17 = 0
  )
"""

CDC_REPLAY_SQL = f"""
{_FEED_SQL},
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
  ) AS rn
  FROM feed
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx, text
"""


_CHLOG_B1 = (
    "(op = 'I' AND pmod(turn_idx, 5) != 0) OR (op != 'I' AND pmod(turn_idx, 2) = 0)"
)
_CHLOG_B2 = (
    "(op = 'I' AND pmod(turn_idx, 5) = 0) OR (op != 'I' AND pmod(turn_idx, 2) = 1)"
)


def cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp time travel (Iceberg TIMESTAMP AS OF): apply the feed in
    two deterministic halves, resolve an as-of point BETWEEN the two
    commits' wall clocks, and read that snapshot — the oracle recomputes
    the first half's LWW state from scratch, proving the as-of read
    returns historical values, not the head."""
    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_tt_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter(_CHLOG_B1), table, batch_id="t1", mode="mor")
    s1 = table.current()
    apply_changes(feed.filter(_CHLOG_B2), table, batch_id="t2", mode="mor")
    s2 = table.current()
    asof = table.snapshot_as_of((s1.committed_at + s2.committed_at) / 2)
    if asof.version != s1.version:  # pragma: no cover - degenerate clock
        raise RuntimeError(
            f"as-of resolved v{asof.version}, expected v{s1.version} "
            f"(commits landed in the same clock tick)"
        )
    return (
        table.read(snapshot=asof)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx", "text")
    )


CDC_TIME_TRAVEL_SQL = f"""
{_FEED_SQL},
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
  ) AS rn
  FROM feed
  WHERE (op = 'I' AND turn_idx % 5 <> 0) OR (op <> 'I' AND turn_idx % 2 = 0)
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx, text
"""


def cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change-data-feed between two snapshot versions: apply the
    feed in two deterministic halves (some keys' inserts held back to the
    2nd batch so all of I/U/D appear), then diff v1 -> v2 with
    SnapshotTable.changelog."""
    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_chlog_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter(_CHLOG_B1), table, batch_id="c1", mode="mor")
    v1 = table.current().version
    apply_changes(feed.filter(_CHLOG_B2), table, batch_id="c2", mode="mor")
    return table.changelog(v1).orderBy("conv_id", "turn_idx")


# the oracle diffs the two LWW states the same two halves induce
CDC_CHANGELOG_SQL = f"""
{_FEED_SQL},
s1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
    ) AS rn
    FROM feed
    WHERE (op = 'I' AND turn_idx % 5 <> 0) OR (op <> 'I' AND turn_idx % 2 = 0)
  ) WHERE rn = 1
),
s2 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
    ) AS rn
    FROM feed
  ) WHERE rn = 1
),
d AS (
  SELECT coalesce(s2.conv_id, s1.conv_id) AS conv_id,
         coalesce(s2.turn_idx, s1.turn_idx) AS turn_idx,
         CASE WHEN (s1.lsn IS NULL OR s1.op = 'D') AND s2.op <> 'D' THEN 'I'
              WHEN s1.op <> 'D' AND (s2.lsn IS NULL OR s2.op = 'D') THEN 'D'
              WHEN s1.op <> 'D' AND s2.op <> 'D' AND s1.lsn <> s2.lsn THEN 'U'
         END AS chg,
         s2.role AS role, s2.text AS text, s2.tool AS tool, s2.ts AS ts
  FROM s1 FULL OUTER JOIN s2
    ON s1.conv_id = s2.conv_id AND s1.turn_idx = s2.turn_idx
)
SELECT conv_id, turn_idx, chg AS op,
       CASE WHEN chg <> 'D' THEN role END AS role,
       CASE WHEN chg <> 'D' THEN text END AS text,
       CASE WHEN chg <> 'D' THEN tool END AS tool,
       CASE WHEN chg <> 'D' THEN ts END AS ts
FROM d WHERE chg IS NOT NULL
ORDER BY conv_id, turn_idx
"""


def cdc_mirror_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous cascade replication: apply the feed to a primary table in
    two MOR batches, and converge a DIFFERENTLY-BUCKETED replica by tailing
    the primary's commit log through streaming.MirrorRunner — run once
    mid-history and once after head, so the second run is a checkpoint
    resume/catch-up, not a fresh sync. Returns the replica's final state;
    the oracle is the same independent LWW reduction as cdc_replay_state
    (the replica must equal what the feed alone dictates)."""
    from orientdb_neo4j_importer_plugin_spark.streaming import MirrorRunner

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_mirror_")
    src = SnapshotTable.create(
        spark, os.path.join(root, "primary"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    dst = SnapshotTable.create(
        spark, os.path.join(root, "replica"), TRANSCRIPTS, "conv_id",
        num_buckets=8, overwrite=True,
    )
    ckpt = os.path.join(root, "ckpt")
    apply_changes(feed.filter(_CHLOG_B1), src, batch_id="m1", mode="mor")
    MirrorRunner(spark, src, dst, checkpoint_dir=ckpt, mode="mor").run_to_completion(
        timeout_sec=600
    )
    apply_changes(feed.filter(_CHLOG_B2), src, batch_id="m2", mode="mor")
    MirrorRunner(
        spark, src, dst, checkpoint_dir=ckpt, mode="mor", compact_every=1
    ).run_to_completion(timeout_sec=600)
    return (
        dst.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx", "text")
    )


def cdc_changelog_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog as before/after row images (the Debezium-envelope diff a
    cascade replica consumes): same two-batch build as cdc_changelog, then
    SnapshotTable.changelog_envelope(v1) flattened to (op, before.text,
    after.text, winning lsn). The oracle recomputes both LWW states in SQL
    and joins the pre/post images independently."""
    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_env_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter(_CHLOG_B1), table, batch_id="e1", mode="mor")
    v1 = table.current().version
    apply_changes(feed.filter(_CHLOG_B2), table, batch_id="e2", mode="mor")
    env = table.changelog_envelope(v1)
    return env.select(
        "conv_id",
        "turn_idx",
        "op",
        F.col("before.text").alias("b_text"),
        F.col("after.text").alias("a_text"),
        "lsn",
    ).orderBy("conv_id", "turn_idx")


# envelope diff as a reusable CTE (`env`): the final LWW states of the two
# deterministic batch halves, full-outer joined into (op, before-text,
# after-text, winning lsn) rows — consumed by the envelope contract row and
# by the conversation-churn aggregate over it
_ENV_CTE = f"""
{_FEED_SQL},
s1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
    ) AS rn
    FROM feed
    WHERE (op = 'I' AND turn_idx % 5 <> 0) OR (op <> 'I' AND turn_idx % 2 = 0)
  ) WHERE rn = 1
),
s2 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
    ) AS rn
    FROM feed
  ) WHERE rn = 1
),
d AS (
  SELECT coalesce(s2.conv_id, s1.conv_id) AS conv_id,
         coalesce(s2.turn_idx, s1.turn_idx) AS turn_idx,
         CASE WHEN (s1.lsn IS NULL OR s1.op = 'D') AND s2.op <> 'D' THEN 'I'
              WHEN s1.op <> 'D' AND (s2.lsn IS NULL OR s2.op = 'D') THEN 'D'
              WHEN s1.op <> 'D' AND s2.op <> 'D' AND s1.lsn <> s2.lsn THEN 'U'
         END AS chg,
         CASE WHEN s1.lsn IS NOT NULL AND s1.op <> 'D' THEN s1.text END AS b_text,
         s2.text AS s2_text, s2.lsn AS s2_lsn
  FROM s1 FULL OUTER JOIN s2
    ON s1.conv_id = s2.conv_id AND s1.turn_idx = s2.turn_idx
),
env AS (
  SELECT conv_id, turn_idx, chg AS op,
         b_text,
         CASE WHEN chg <> 'D' THEN s2_text END AS a_text,
         s2_lsn AS lsn
  FROM d WHERE chg IS NOT NULL
)"""

CDC_CHANGELOG_ENVELOPE_SQL = f"""
{_ENV_CTE}
SELECT conv_id, turn_idx, op, b_text, a_text, lsn
FROM env
ORDER BY conv_id, turn_idx
"""


def cdc_tool_usage_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed per-tool usage counters (fourth streamed-sketch member):
    apply the feed in two MOR batches, refresh the delete-algebraic
    (tool, conv) cell table after EACH, and read the per-tool rollup —
    the oracle recomputes the same counters from the final LWW state from
    scratch (min/max turn_idx deliberately absent: not delete-algebraic,
    see lake/sketchview.StreamedToolUsageView)."""
    from orientdb_neo4j_importer_plugin_spark.lake.sketchview import (
        StreamedToolUsageView,
    )

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_tuv_")
    source = SnapshotTable.create(
        spark, os.path.join(root, "src"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    state = StreamedToolUsageView.create_state(
        spark, os.path.join(root, "cells"), num_buckets=8
    )
    view = StreamedToolUsageView(source, state)
    apply_changes(feed.filter(_CHLOG_B1), source, batch_id="t1", mode="mor")
    view.refresh()
    apply_changes(feed.filter(_CHLOG_B2), source, batch_id="t2", mode="mor")
    view.refresh()
    return view.usage()


def cdc_lang_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed language-distribution cells (fifth streamed-sketch member,
    written against the StreamedCellView base): apply the feed in two MOR
    batches, refresh the delete-algebraic (lang, role) cell table after
    EACH, and read the language mix — the oracle recomputes the same
    marker-word argmax + rollup from the final LWW state from scratch."""
    from orientdb_neo4j_importer_plugin_spark.lake.sketchview import (
        StreamedLangDistView,
    )

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_lang_")
    source = SnapshotTable.create(
        spark, os.path.join(root, "src"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    state = StreamedLangDistView.create_state(
        spark, os.path.join(root, "cells"), num_buckets=4
    )
    view = StreamedLangDistView(source, state)
    apply_changes(feed.filter(_CHLOG_B1), source, batch_id="l1", mode="mor")
    view.refresh()
    apply_changes(feed.filter(_CHLOG_B2), source, batch_id="l2", mode="mor")
    view.refresh()
    return view.dist()


def cdc_key_hotness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key write-hotness diagnostic over the raw change feed (the
    input to skew-management decisions): event/op counts, turns touched,
    lsn span per conversation. Oracle = the same rollup in SQL over the
    independently derived feed CTE."""
    from orientdb_neo4j_importer_plugin_spark.cdc.verify import key_hotness

    return key_hotness(feed_from_tpch(spark, sf_dir))


CDC_KEY_HOTNESS_SQL = f"""
{_FEED_SQL}
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
       CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updates,
       CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
       CAST(count(DISTINCT turn_idx) AS BIGINT) AS n_turns_touched,
       CAST(max(lsn) - min(lsn) AS BIGINT) AS lsn_span
FROM feed
GROUP BY conv_id
ORDER BY conv_id
"""


def cdc_conv_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation churn between two snapshots: the same envelope diff
    as cdc_changelog_envelope, reduced by transcripts.conversation_churn
    (new/dropped/rewritten turn counts + token movement). The oracle
    aggregates the independently recomputed env CTE."""
    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_churn_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter(_CHLOG_B1), table, batch_id="h1", mode="mor")
    v1 = table.current().version
    apply_changes(feed.filter(_CHLOG_B2), table, batch_id="h2", mode="mor")
    return TR.conversation_churn(table.changelog_envelope(v1))


def cdc_cdf_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consume the table's change feed through the `lake_cdf` Python Data
    Source (spark.read.format, same planner as the readStream tail) and
    LWW-reduce the full history back to final state — proving the
    subscription path against the same independent oracle as the direct
    read (CDC_REPLAY_SQL). MOR batches applied out of lsn order, no
    compaction, so the tail carries exactly the per-batch winner rows."""
    from orientdb_neo4j_importer_plugin_spark.streaming.cdf_source import (
        LakeCdfDataSource,
    )

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_cdf_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter(_CHLOG_B1), table, batch_id="t1", mode="mor")
    apply_changes(feed.filter(_CHLOG_B2), table, batch_id="t2", mode="mor")
    spark.dataSource.register(LakeCdfDataSource)
    hist = (
        spark.read.format("lake_cdf")
        .option("path", table.root)
        .option("fromVersion", 0)
        .load()
    )
    payload = ["role", "text", "tool", "ts"]
    w = F.max(F.struct(F.col("_lsn"), F.col("op"), *[F.col(c) for c in payload]))
    return (
        hist.groupBy("conv_id", "turn_idx")
        .agg(w.alias("w"))
        .filter("w.op <> 'D'")
        .select("conv_id", "turn_idx", *[F.col(f"w.{c}").alias(c) for c in payload])
        .orderBy("conv_id", "turn_idx", "text")
    )


# LWW-replayed live state straight from the feed (no table build — the
# table-backed path is cdc_replay_state; equivalence is tested there), the
# input to the conversation-level analytics operators.
def _replayed_state(
    spark: SparkSession, sf_dir: str, cluster: str = "range"
) -> DataFrame:
    from orientdb_neo4j_importer_plugin_spark.cdc.lww import lww_resolve

    # cluster_by_key pre-partitions the RAW lineitem projection by conv_id
    # INSIDE the feed derivation: that partitioning satisfies the
    # clustered distribution of BOTH the (conv_id, turn_idx) LWW aggregate
    # and the downstream conversation-level window/agg, so the entire
    # replay->analytics pipeline still runs in ONE data shuffle — and
    # (round 6) that one exchange carries the narrow raw columns while the
    # md5/text derivation runs post-shuffle on every core instead of in
    # the scan's 1-3 input-split tasks (see feedgen.feed_from_tpch).
    # cluster="range" additionally lets a consumer whose final sort leads
    # with conv_id elide the sort's own exchange + its range-sampling
    # recompute of the whole derived segment; consumers ordering by other
    # keys pass cluster="hash" (no sampling job on the feed).
    feed = feed_from_tpch(spark, sf_dir, cluster_by_key=cluster)
    return lww_resolve(feed, keys=["conv_id", "turn_idx"]).filter("op <> 'D'")


def cdc_patch_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level LWW over a feed with PARTIAL updates (op='P' rows
    patch only their non-null columns; cdc/lww.lww_resolve_patch): the
    live merged state after insert/update/delete/patch bands, where
    patches above the last full write apply per column, patches under it
    are overridden, and patches on deleted keys are ignored. The oracle
    computes the same fold with an independent WINDOW formulation
    (row_number anchors + per-column ranked patch joins) vs the engine's
    single algebraic aggregation."""
    from orientdb_neo4j_importer_plugin_spark.cdc.lww import lww_resolve_patch
    from orientdb_neo4j_importer_plugin_spark.feedgen import patch_feed_from_tpch

    # cluster_by_key: same one-shuffle shape as _replayed_state (round 6)
    feed = patch_feed_from_tpch(spark, sf_dir, cluster_by_key="range").drop(
        "source_part"
    )
    st = lww_resolve_patch(feed, keys=["conv_id", "turn_idx"]).filter("op <> 'D'")
    return st.select("conv_id", "turn_idx", "role", "text", "tool", "ts").orderBy(
        "conv_id", "turn_idx", "text"
    )


def cdc_patch_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial updates through the exactly-once TABLE apply path
    (cdc/apply.apply_patch_changes): anchors land as ordinary MOR
    batches, then two patch batches merge against the table's CURRENT
    state (bucket-pruned read of exactly the patch keys), one of them
    replayed to prove the ledger no-op, then compaction folds the deltas.
    The final table state must equal the same pure-fold oracle as the
    resolver-level query (CDC_PATCH_STATE_SQL) — patches arrive after
    their anchors here, so apply-time and fold semantics coincide."""
    from orientdb_neo4j_importer_plugin_spark.cdc.apply import (
        apply_patch_changes,
    )
    from orientdb_neo4j_importer_plugin_spark.feedgen import patch_feed_from_tpch

    feed = patch_feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_patch_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    anchors = feed.filter("op <> 'P'")
    apply_changes(anchors.filter("pmod(lsn, 2) = 1"), table, batch_id="pa1", mode="mor")
    apply_changes(anchors.filter("pmod(lsn, 2) = 0"), table, batch_id="pa0", mode="mor")
    p1 = feed.filter(f"op = 'P' AND lsn < {_PATCH_BAND_35X}")
    p2 = feed.filter(f"op = 'P' AND lsn >= {_PATCH_BAND_35X}")
    apply_patch_changes(p1, table, batch_id="pp1", mode="mor")
    apply_patch_changes(p1, table, batch_id="pp1", mode="mor")  # replay no-op
    apply_patch_changes(p2, table, batch_id="pp2", mode="mor")
    table.compact()
    return (
        table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx", "text")
    )


_PATCH_BAND_3X = 3 * (1 << 61)
_PATCH_BAND_35X = 3 * (1 << 61) + (1 << 60)

CDC_PATCH_STATE_SQL = f"""{_FEED_SQL},
pfeed AS (
  SELECT * FROM feed
  UNION ALL
  SELECT h + {_PATCH_BAND_3X}, 'P', conv_id, turn_idx, NULL, NULL,
         'patched_' || CAST(l_suppkey % 5 AS VARCHAR), CAST(NULL AS TIMESTAMP)
  FROM hashed WHERE l_suppkey % 4 = 1
  UNION ALL
  SELECT h + {_PATCH_BAND_35X}, 'P', conv_id, turn_idx, NULL,
         'patched: part ' || CAST(l_partkey AS VARCHAR), NULL,
         CAST(NULL AS TIMESTAMP)
  FROM hashed WHERE l_partkey % 5 = 0
),
anchors AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
  ) AS rn
  FROM pfeed WHERE op IN ('I', 'U', 'D')
),
anchor AS (
  SELECT conv_id, turn_idx, lsn, op, role, text, tool, ts
  FROM anchors WHERE rn = 1
),
p_role AS (
  SELECT conv_id, turn_idx, role AS v, lsn, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM pfeed WHERE op = 'P' AND role IS NOT NULL
),
p_text AS (
  SELECT conv_id, turn_idx, text AS v, lsn, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM pfeed WHERE op = 'P' AND text IS NOT NULL
),
p_tool AS (
  SELECT conv_id, turn_idx, tool AS v, lsn, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM pfeed WHERE op = 'P' AND tool IS NOT NULL
),
p_ts AS (
  SELECT conv_id, turn_idx, ts AS v, lsn, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM pfeed WHERE op = 'P' AND ts IS NOT NULL
)
SELECT a.conv_id, a.turn_idx,
       CASE WHEN pr.lsn > a.lsn THEN pr.v ELSE a.role END AS role,
       CASE WHEN pt.lsn > a.lsn THEN pt.v ELSE a.text END AS text,
       CASE WHEN pl.lsn > a.lsn THEN pl.v ELSE a.tool END AS tool,
       CASE WHEN ps.lsn > a.lsn THEN ps.v ELSE a.ts END AS ts
FROM anchor a
LEFT JOIN p_role pr ON pr.conv_id = a.conv_id
  AND pr.turn_idx = a.turn_idx AND pr.rn = 1
LEFT JOIN p_text pt ON pt.conv_id = a.conv_id
  AND pt.turn_idx = a.turn_idx AND pt.rn = 1
LEFT JOIN p_tool pl ON pl.conv_id = a.conv_id
  AND pl.turn_idx = a.turn_idx AND pl.rn = 1
LEFT JOIN p_ts ps ON ps.conv_id = a.conv_id
  AND ps.turn_idx = a.turn_idx AND ps.rn = 1
WHERE a.op <> 'D'
ORDER BY 1, 2, 4
"""


# the same state as a DuckDB CTE named `state`
_STATE_CTE = f"""{_FEED_SQL},
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
  ) AS rn
  FROM feed
),
state AS (
  SELECT conv_id, turn_idx, role, text, tool, ts
  FROM ranked WHERE rn = 1 AND op <> 'D'
)"""


CDC_TOOL_USAGE_VIEW_SQL = f"""
{_STATE_CTE}
SELECT tool,
       CAST(count(*) AS BIGINT) AS n_calls,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(sum(CAST(len(list_filter(regexp_split_to_array(
           coalesce(text, ''), '\\s+'), x -> len(x) > 0)) AS BIGINT))
         AS BIGINT) AS n_tokens
FROM state WHERE tool IS NOT NULL
GROUP BY tool
ORDER BY tool
"""


def _lang_view_hits_sql(lang: str) -> str:
    lst = "[" + ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang]) + "]"
    toks = tokens_sql("coalesce(text, '')")
    return f"len(list_filter({toks}, x -> list_contains({lst}, x)))"


_LANGS = list(T.LANG_MARKERS)

CDC_LANG_VIEW_SQL = f"""
{_STATE_CTE},
scored AS (
  SELECT role,
         CAST(len({tokens_sql("coalesce(text, '')")}) AS BIGINT) AS t,
         {", ".join(f"{_lang_view_hits_sql(lg)} AS hits_{lg}" for lg in _LANGS)}
  FROM state
),
g AS (
  SELECT {T._pick_best_lang_sql(_LANGS, "hits_{}")} AS lang, role, t
  FROM (
    SELECT *, greatest({", ".join(f"hits_{lg}" for lg in _LANGS)}) AS best
    FROM scored
  )
)
SELECT lang, role,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(t) AS BIGINT) AS n_tokens
FROM g
GROUP BY lang, role
ORDER BY lang, role
"""


def cdc_cdf_rowlevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CDC subscription: apply two MOR batches, materialize the
    per-version changelog files (Delta CDF change-file analogue), and read
    the full I/U/D history through lake_cdf mode=rowlevel. The oracle
    recomputes both versions' row-level diffs from scratch in SQL."""
    from orientdb_neo4j_importer_plugin_spark.streaming.cdf_source import (
        LakeCdfDataSource,
    )

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_rl_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter(_CHLOG_B1), table, batch_id="r1", mode="mor")
    apply_changes(feed.filter(_CHLOG_B2), table, batch_id="r2", mode="mor")
    table.materialize_changelog()
    spark.dataSource.register(LakeCdfDataSource)
    return (
        spark.read.format("lake_cdf")
        .option("path", table.root)
        .option("mode", "rowlevel")
        .option("fromVersion", 0)
        .load()
        .orderBy("_commit_version", "conv_id", "turn_idx")
    )


CDC_CDF_ROWLEVEL_SQL = f"""
{_FEED_SQL},
s1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
    ) AS rn
    FROM feed
    WHERE (op = 'I' AND turn_idx % 5 <> 0) OR (op <> 'I' AND turn_idx % 2 = 0)
  ) WHERE rn = 1
),
s2 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
    ) AS rn
    FROM feed
  ) WHERE rn = 1
),
v1 AS (
  SELECT conv_id, turn_idx, 'I' AS op, role, text, tool, ts,
         CAST(1 AS BIGINT) AS _commit_version
  FROM s1 WHERE op <> 'D'
),
d2 AS (
  SELECT coalesce(s2.conv_id, s1.conv_id) AS conv_id,
         coalesce(s2.turn_idx, s1.turn_idx) AS turn_idx,
         CASE WHEN (s1.lsn IS NULL OR s1.op = 'D') AND s2.op <> 'D' THEN 'I'
              WHEN s1.op <> 'D' AND (s2.lsn IS NULL OR s2.op = 'D') THEN 'D'
              WHEN s1.op <> 'D' AND s2.op <> 'D' AND s1.lsn <> s2.lsn THEN 'U'
         END AS chg,
         s2.role AS role, s2.text AS text, s2.tool AS tool, s2.ts AS ts
  FROM s1 FULL OUTER JOIN s2
    ON s1.conv_id = s2.conv_id AND s1.turn_idx = s2.turn_idx
),
v2 AS (
  SELECT conv_id, turn_idx, chg AS op,
         CASE WHEN chg <> 'D' THEN role END AS role,
         CASE WHEN chg <> 'D' THEN text END AS text,
         CASE WHEN chg <> 'D' THEN tool END AS tool,
         CASE WHEN chg <> 'D' THEN ts END AS ts,
         CAST(2 AS BIGINT) AS _commit_version
  FROM d2 WHERE chg IS NOT NULL
)
SELECT * FROM v1
UNION ALL
SELECT * FROM v2
ORDER BY _commit_version, conv_id, turn_idx
"""


def cdc_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view: maintain per-conversation aggregates
    from the source table's commit log in O(changed keys) per refresh
    (lake/materialize.IncrementalView) — refreshed after EACH of two
    out-of-order source batches, then compared against the oracle's
    from-scratch aggregate over the final LWW state."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from orientdb_neo4j_importer_plugin_spark.lake.materialize import (
        IncrementalView,
    )

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_mv_")
    source = SnapshotTable.create(
        spark, os.path.join(root, "src"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    view_schema = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("n_turns", LongType(), True),
            StructField("n_chars", LongType(), True),
        ]
    )
    target = SnapshotTable.create(
        spark, os.path.join(root, "view"), view_schema, "conv_id",
        num_buckets=8, key_columns=["conv_id"], overwrite=True,
    )

    def agg_fn(rows: DataFrame) -> DataFrame:
        return rows.groupBy("conv_id").agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )

    view = IncrementalView(source, target, "conv_id", agg_fn)
    apply_changes(feed.filter(_CHLOG_B1), source, batch_id="m1", mode="mor")
    view.refresh()
    apply_changes(feed.filter(_CHLOG_B2), source, batch_id="m2", mode="mor")
    view.refresh()
    return target.read().orderBy("conv_id")


CDC_MV_SQL = f"""
{_STATE_CTE}
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM state
GROUP BY conv_id
ORDER BY conv_id
"""


def cdc_incremental_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained TRAINING-EXPORT view: the chat render
    (transcripts.render_conversations — ordered "role: text" concat +
    token estimate) kept current from the source table's commit log in
    O(changed conversations) per refresh, via the same IncrementalView
    machinery as cdc_incremental_view. A turn update/delete re-renders
    ONLY its conversation; the oracle recomputes every render from the
    final LWW state from scratch."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from orientdb_neo4j_importer_plugin_spark.lake.materialize import (
        IncrementalView,
    )

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_mvr_")
    source = SnapshotTable.create(
        spark, os.path.join(root, "src"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    view_schema = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("n_turns", LongType(), True),
            StructField("conv_text", StringType(), True),
            StructField("n_tokens", LongType(), True),
        ]
    )
    target = SnapshotTable.create(
        spark, os.path.join(root, "render"), view_schema, "conv_id",
        num_buckets=8, key_columns=["conv_id"], overwrite=True,
    )
    view = IncrementalView(source, target, "conv_id", TR.render_conversations)
    apply_changes(feed.filter(_CHLOG_B1), source, batch_id="r1", mode="mor")
    view.refresh()
    apply_changes(feed.filter(_CHLOG_B2), source, batch_id="r2", mode="mor")
    view.refresh()
    return target.read().orderBy("conv_id")


def cdc_keyrange_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-pruned key-range read: apply the feed as out-of-order MOR
    batches, compact with max_file_rows so each bucket splits into tight
    disjoint key-range files, then read_keyrange over a conv_id band —
    the scan reads only files whose recorded key bounds overlap the band
    (test_maintain proves the skipping; this row proves the VALUES against
    the oracle's filtered LWW state)."""
    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_krs_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), table, batch_id="k1", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="k0", mode="mor")
    table.compact(max_file_rows=2000)
    return (
        table.read_keyrange("conv_000000100", "conv_000000999")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx", "text")
    )


CDC_KEYRANGE_SQL = f"""
{_STATE_CTE}
SELECT conv_id, turn_idx, role, text, tool, ts
FROM state
WHERE conv_id BETWEEN 'conv_000000100' AND 'conv_000000999'
ORDER BY conv_id, turn_idx, text
"""


def cdc_tsrange_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range read over NON-KEY column stats: apply the feed as
    out-of-order MOR batches, compact (tight per-file stats for every
    payload column, ts included — timestamps are written TIMESTAMP_MICROS
    so parquet footers carry min/max), then read_colrange over a ts band.
    Only files whose recorded ts bounds overlap the band are read in
    delta-free buckets (test_maintain proves the skipping; this row
    proves the VALUES against the oracle's time-filtered LWW state)."""
    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_tsr_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), table, batch_id="t1", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="t0", mode="mor")
    table.compact(max_file_rows=2000)
    return (
        table.read_colrange("ts", "1996-03-01 00:00:00", "1996-09-30 00:00:00")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx", "text")
    )


CDC_TSRANGE_SQL = f"""
{_STATE_CTE}
SELECT conv_id, turn_idx, role, text, tool, ts
FROM state
WHERE ts BETWEEN TIMESTAMP '1996-03-01 00:00:00' AND TIMESTAMP '1996-09-30 00:00:00'
ORDER BY conv_id, turn_idx, text
"""


_LOOKUP_CONVS = [
    "conv_000000007",
    "conv_000000042",
    "conv_000000123",
    "conv_000000456",
    "conv_000000789",
    "conv_000001001",
    "conv_000001337",
    "conv_000009999",  # may or may not exist at a given sf — both fine
    "conv_absent_zzz",  # never exists: bloom proves absence, zero rows
]


def cdc_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched point lookup through per-file key BLOOM filters: apply the
    feed as out-of-order MOR batches into a bloom-enabled table (every
    commit equips its new files with a partition-key bloom), then
    lookup_many a fixed conversation list — the driver routes each key to
    its bucket, min/max-range-prunes, then bloom-probes the survivors, so
    the read touches only files that actually contain a requested
    conversation (tests/test_bloom.py proves the skipping; this row proves
    the VALUES against the oracle's key-filtered LWW state)."""
    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_plk_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True, bloom_fpp=0.01,
    )
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), table, batch_id="p1", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="p0", mode="mor")
    return (
        table.lookup_many([{"conv_id": c} for c in _LOOKUP_CONVS])
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx", "text")
    )


CDC_POINT_LOOKUP_SQL = f"""
{_STATE_CTE}
SELECT conv_id, turn_idx, role, text, tool, ts
FROM state
WHERE conv_id IN ({", ".join(repr(c) for c in _LOOKUP_CONVS)})
ORDER BY conv_id, turn_idx, text
"""


def cdc_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO with all three clauses: replay the feed into a MOR
    table, then merge a derived source — conversations' turn-0 rows with
    uppercased text (matched: DELETE where the turn-0 speaker is 'user',
    UPDATE text otherwise) plus synthetic new conversations seeded from
    turn-3 rows (NOT MATCHED: INSERT). The merge compiles to ONE change
    batch through apply_changes (cdc/merge.py); the oracle replicates the
    clause algebra as a three-branch UNION over the from-scratch LWW
    state. Source reads are snapshot-pinned, so deriving the source from
    the pre-merge table is stable while the merge commits."""
    from orientdb_neo4j_importer_plugin_spark.cdc import merge_into

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_mrg_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), table, batch_id="m1", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="m0", mode="mor")
    state = table.read()
    src = (
        state.filter("turn_idx = 0")
        .select(
            "conv_id",
            "turn_idx",
            "role",
            F.upper("text").alias("text"),
            "tool",
            "ts",
        )
        .union(
            state.filter("turn_idx = 3").select(
                F.concat(F.lit("conv_new_"), F.col("conv_id")).alias("conv_id"),
                F.lit(0).alias("turn_idx"),
                F.lit("system").alias("role"),
                F.lit("seeded").alias("text"),
                F.lit(None).cast("string").alias("tool"),
                "ts",
            )
        )
    )
    merge_into(
        table,
        src,
        when_matched_delete="s.role = 'user'",
        when_matched_update={"text": "s.text"},
        when_not_matched_insert="*",
        batch_id="the-merge",
        mode="mor",
    )
    return (
        table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx", "text")
    )


CDC_MERGE_SQL = f"""
{_STATE_CTE},
src AS (
  SELECT conv_id, turn_idx, role, upper(text) AS text, tool, ts
  FROM state WHERE turn_idx = 0
  UNION ALL
  SELECT 'conv_new_' || conv_id, 0, 'system', 'seeded', CAST(NULL AS VARCHAR), ts
  FROM state WHERE turn_idx = 3
),
merged AS (
  SELECT st.conv_id, st.turn_idx, st.role, st.text, st.tool, st.ts
  FROM state st LEFT JOIN src s
    ON st.conv_id = s.conv_id AND st.turn_idx = s.turn_idx
  WHERE s.conv_id IS NULL
  UNION ALL
  SELECT st.conv_id, st.turn_idx, st.role, s.text, st.tool, st.ts
  FROM state st JOIN src s
    ON st.conv_id = s.conv_id AND st.turn_idx = s.turn_idx
  WHERE NOT (s.role = 'user')
  UNION ALL
  SELECT s.conv_id, s.turn_idx, s.role, s.text, s.tool, s.ts
  FROM src s LEFT JOIN state st
    ON st.conv_id = s.conv_id AND st.turn_idx = s.turn_idx
  WHERE st.conv_id IS NULL
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM merged
ORDER BY conv_id, turn_idx, text
"""


def cdc_dml_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE ... WHERE then DELETE ... WHERE compiled onto the CDC path
    (cdc/merge.py delete_where/update_where): replay the feed as
    out-of-order MOR batches, UPDATE user turns to uppercase text, then
    DELETE rows matching a predicate over a NULLABLE column — `tool >=
    'a'` is NULL for tool-less turns, so the row proves three-valued SQL
    DELETE semantics (NULL keeps the row) as well as statement ordering
    (the delete sees post-update state). Each statement is one state
    scan plus one full-row event per victim at max-stored-lsn+1 through
    apply_changes — exactly-once, changelog/mirror-visible. Oracle:
    same algebra over the from-scratch LWW state with CASE + IS NOT
    TRUE."""
    from orientdb_neo4j_importer_plugin_spark.cdc import (
        delete_where,
        update_where,
    )

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_dml_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), table, batch_id="w1", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="w0", mode="mor")
    update_where(
        table, "role = 'user'", {"text": "upper(text)"},
        batch_id="uw", mode="mor",
    )
    delete_where(
        table, "tool >= 'a' AND turn_idx >= 2", batch_id="dw", mode="mor"
    )
    return (
        table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx", "text")
    )


CDC_DML_WHERE_SQL = f"""
{_STATE_CTE},
updated AS (
  SELECT conv_id, turn_idx, role,
         CASE WHEN role = 'user' THEN upper(text) ELSE text END AS text,
         tool, ts
  FROM state
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM updated
WHERE (tool >= 'a' AND turn_idx >= 2) IS NOT TRUE
ORDER BY conv_id, turn_idx, text
"""


def cdc_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish through refs (lake/table.py create_branch /
    publish_branch): replay the feed as out-of-order MOR batches, fork a
    zero-copy branch, stage an UPDATE plus a DELETE on the BRANCH (main
    never sees them), then fast-forward publish — one atomic commit that
    adopts the branch's files by hard-link. Returned state is MAIN after
    publish; the oracle applies the staged algebra directly to the
    from-scratch LWW state, so the row proves the published values are
    exactly the audited ones (not merely row counts)."""
    from orientdb_neo4j_importer_plugin_spark.cdc import (
        delete_where,
        update_where,
    )

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_wap_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), table, batch_id="w1", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="w0", mode="mor")
    br = table.create_branch("wap")
    update_where(
        br, "role = 'assistant'", {"text": "concat(text, ' [audited]')"},
        batch_id="stage-u", mode="mor",
    )
    delete_where(br, "turn_idx >= 6", batch_id="stage-d", mode="mor")
    table.publish_branch("wap")
    return (
        table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx", "text")
    )


CDC_WAP_PUBLISH_SQL = f"""
{_STATE_CTE},
updated AS (
  SELECT conv_id, turn_idx, role,
         CASE WHEN role = 'assistant' THEN text || ' [audited]' ELSE text END AS text,
         tool, ts
  FROM state
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM updated
WHERE turn_idx < 6
ORDER BY conv_id, turn_idx, text
"""


def cdc_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE ... AS OF via compensating events (cdc/merge.restore_as_of):
    apply the odd-lsn half of the feed, tag the snapshot, apply the even
    half PLUS a destructive DML pass, then restore to the tag. The final
    state must equal the LWW reduction of the odd half alone — computed
    from scratch by the oracle — while history moved only FORWARD (the
    restore is one ordinary CDC batch at max-lsn+1, so mirrors/views
    converge; tests/test_restore.py proves the replication property)."""
    from orientdb_neo4j_importer_plugin_spark.cdc import (
        delete_where,
        restore_as_of,
    )

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_rst_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), table, batch_id="odd", mode="mor")
    table.create_tag("good")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="even", mode="mor")
    delete_where(table, "turn_idx >= 4", batch_id="oops", mode="mor")
    restore_as_of(table, "good", mode="mor")
    return (
        table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx", "text")
    )


CDC_RESTORE_SQL = f"""
{_FEED_SQL},
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
  ) AS rn
  FROM feed WHERE lsn % 2 = 1
),
state AS (
  SELECT conv_id, turn_idx, role, text, tool, ts
  FROM ranked WHERE rn = 1 AND op <> 'D'
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM state
ORDER BY conv_id, turn_idx, text
"""


def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 batch fold (cdc/scd.scd2_history): every I/U event in
    the feed becomes a history row valid [its lsn, the key's next event's
    lsn); deletes close intervals without emitting rows; is_current marks
    keys whose last event was not a delete. ONE key-partitioned window —
    the oracle is DuckDB's own LEAD over the identical feed."""
    from orientdb_neo4j_importer_plugin_spark.cdc import scd2_history

    # range-cluster by conv_id inside the feed derivation (round 6): the
    # LEAD window's ClusteredDistribution(conv_id, turn_idx) and the final
    # orderBy(conv_id, ...) are both satisfied by RangePartitioning(conv_id)
    # — one exchange total and no sort-sampling recompute of the fold
    feed = feed_from_tpch(spark, sf_dir, cluster_by_key="range")
    return scd2_history(
        feed, ["conv_id", "turn_idx"],
        payload_cols=["role", "text", "tool", "ts"],
    ).orderBy("conv_id", "turn_idx", "valid_from_lsn")


CDC_SCD2_SQL = f"""
{_FEED_SQL},
hist AS (
  SELECT *, lead(lsn) OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn
  ) AS valid_to_lsn
  FROM feed
)
SELECT conv_id, turn_idx, role, text, tool, ts,
       lsn AS valid_from_lsn, valid_to_lsn,
       (valid_to_lsn IS NULL) AS is_current
FROM hist WHERE op <> 'D'
ORDER BY conv_id, turn_idx, valid_from_lsn
"""


def cdc_scd2_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained SCD2 history table (cdc/scd.Scd2View):
    apply the feed as three op-band commits (I, then U, then D — each key
    changes at most once per commit modulo in-band LWW collapse), then
    refresh the view per source version over changelog_envelope. The
    oracle reconstructs per-commit granularity independently: band
    winners (in-band LWW) chained by LEAD."""
    from orientdb_neo4j_importer_plugin_spark.cdc.scd import Scd2View

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_scd2_")
    table = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    b = 1 << 61
    apply_changes(feed.filter(f"lsn < {b}"), table, batch_id="i", mode="mor")
    apply_changes(
        feed.filter(f"lsn >= {b} and lsn < {2 * b}"), table,
        batch_id="u", mode="mor",
    )
    apply_changes(feed.filter(f"lsn >= {2 * b}"), table, batch_id="d", mode="mor")
    view = Scd2View.create(table, os.path.join(root, "hist"))
    view.refresh(mode="mor")
    return view.read().select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "valid_from_lsn", "valid_to_lsn", "is_current",
    ).orderBy("conv_id", "turn_idx", "valid_from_lsn")


CDC_SCD2_VIEW_SQL = f"""
{_FEED_SQL},
banded AS (
  SELECT *, CASE WHEN lsn < 2305843009213693952 THEN 0
                 WHEN lsn < 4611686018427387904 THEN 1 ELSE 2 END AS band
  FROM feed
),
winners AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx, band ORDER BY lsn DESC
    ) AS rn
    FROM banded
  ) WHERE rn = 1
),
hist AS (
  SELECT *, lead(lsn) OVER (
    PARTITION BY conv_id, turn_idx ORDER BY lsn
  ) AS valid_to_lsn
  FROM winners
)
SELECT conv_id, turn_idx, role, text, tool, ts,
       lsn AS valid_from_lsn, valid_to_lsn,
       (valid_to_lsn IS NULL) AS is_current
FROM hist WHERE op <> 'D'
ORDER BY conv_id, turn_idx, valid_from_lsn
"""


def _hist_setup(spark: SparkSession, sf_dir: str):
    """Shared fixture of the two hist-view contract queries: an events
    snapshot table, an empty cell-state table wired into a
    StreamedHistView, and the deterministic I/U/D feed thirds derived
    from the events parquet. Returns (source, view, ins, upd, dels,
    root)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from orientdb_neo4j_importer_plugin_spark.lake.sketchview import (
        StreamedHistView,
    )

    schema = StructType(
        [
            StructField("event_id", LongType(), False),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
        ]
    )
    base = _read(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="cdc_hist_")
    source = SnapshotTable.create(
        spark, os.path.join(root, "events"), schema, "event_id",
        num_buckets=16, overwrite=True, key_columns=["event_id"],
    )
    state = StreamedHistView.create_state(spark, os.path.join(root, "hist"))
    view = StreamedHistView(source, state)
    ins = base.select(
        F.col("event_id").alias("lsn"), F.lit("I").alias("op"),
        "event_id", "event_type", "value",
    )
    # 7.25 is an exact binary fraction: value + 7.25 is the identical FP
    # op in Spark and DuckDB, so the twin stays bit-exact with no rounding
    upd = base.filter("event_id % 5 = 0").select(
        (F.col("event_id") + F.lit(1_000_000_000)).alias("lsn"),
        F.lit("U").alias("op"), "event_id", "event_type",
        (F.col("value") + F.lit(7.25)).alias("value"),
    )
    dels = base.filter("event_id % 7 = 3").select(
        (F.col("event_id") + F.lit(2_000_000_000)).alias("lsn"),
        F.lit("D").alias("op"), "event_id",
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
    )
    return source, view, ins, upd, dels, root


def cdc_hist_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed quantile-sketch maintenance end-to-end
    (lake/sketchview.StreamedHistView + SnapshotTable.changelog_delta):
    an I/U/D feed derived from the events table lands in a snapshot table
    across three commits; the view folds each window's pre-image changelog
    into its (event_type, value) cell multiset — refresh after the insert
    commit, then after updates+deletes, so the second refresh must
    DECREMENT cells via pre-images (values change and rows vanish, moving
    every group's min/max). The returned histogram must equal the DuckDB
    twin computed directly from the LWW-resolved live state."""
    source, view, ins, upd, dels, _root = _hist_setup(spark, sf_dir)
    apply_changes(ins, source, batch_id="h1", mode="mor")
    view.refresh()
    apply_changes(upd, source, batch_id="h2", mode="mor")
    apply_changes(dels, source, batch_id="h3", mode="mor")
    view.refresh()
    view.refresh()  # no new source version: committed no-op
    return view.hist()


def cdc_hist_view_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME sketch as `cdc_hist_view`, but maintained by the
    CHECKPOINTED streaming path (StreamedHistView.stream): the source's
    lake_cdf feed wakes the maintainer, each trigger folds the pre-image
    changelog window, and the stream is killed and resumed from its
    checkpoint between commit waves — the update+delete wave lands while
    the maintainer is down and must be absorbed on resume. Identical
    oracle (CDC_HIST_VIEW_SQL): the end state must not depend on which
    maintenance path ran, nor on where the kill fell."""
    source, view, ins, upd, dels, root = _hist_setup(spark, sf_dir)
    ckpt = os.path.join(root, "ckpt")

    def wave() -> None:
        q = view.stream(ckpt)
        q.awaitTermination(600)
        if q.isActive:  # pragma: no cover - hang guard
            q.stop()
            raise RuntimeError("streamed hist wave did not drain")

    apply_changes(ins, source, batch_id="h1", mode="mor")
    wave()
    # maintainer down: updates + deletes commit, then a checkpoint RESUME
    apply_changes(upd, source, batch_id="h2", mode="mor")
    apply_changes(dels, source, batch_id="h3", mode="mor")
    wave()
    return view.hist()


CDC_HIST_VIEW_SQL = f"""
WITH live AS (
  SELECT event_type,
         CASE WHEN event_id % 5 = 0 THEN value + CAST(7.25 AS DOUBLE)
              ELSE value END AS value
  FROM events
  WHERE event_id % 7 <> 3
),
{TP.value_quantiles_hist_sql("live")}
"""


def cdc_cms_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second streamed sketch (lake/sketchview.StreamedCmsView):
    count-min cells of event_type frequency maintained incrementally over
    the same I/U/D feed as cdc_hist_view — CMS counters are delete-
    algebraic, so the delete wave DECREMENTS cells via pre-images (the
    update wave keeps event_type, so its pre/post pairs must cancel to
    zero state touches). Probe estimates against the maintained cells
    must equal the DuckDB twin's fresh sketch over the resolved live
    state."""
    from orientdb_neo4j_importer_plugin_spark.lake.sketchview import (
        StreamedCmsView,
    )

    source, _hist, ins, upd, dels, root = _hist_setup(spark, sf_dir)
    state = StreamedCmsView.create_state(spark, os.path.join(root, "cms"))
    view = StreamedCmsView(source, state, value_col="event_type")
    apply_changes(ins, source, batch_id="h1", mode="mor")
    view.refresh()
    apply_changes(upd, source, batch_id="h2", mode="mor")
    apply_changes(dels, source, batch_id="h3", mode="mor")
    view.refresh()
    probes = (
        _read(spark, sf_dir, "events")
        .select("event_type")
        .filter(F.col("event_type").isNotNull())
        .distinct()
    )
    return view.estimate(probes, F.col("event_type"))


CDC_CMS_VIEW_SQL = SK.cms_estimate_sql(
    "(SELECT event_type FROM events WHERE event_id % 7 <> 3) live",
    "event_type",
    "SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL",
    ["event_type"],
    "event_type",
)


def cdc_vocab_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third streamed sketch (lake/sketchview.StreamedVocabView):
    per-token (occurrences, containing-rows) counters of the LIVE
    transcript corpus, maintained incrementally over the standard I/U/D
    feed — vocabulary drift monitoring without corpus rescans. The
    update wave rewrites text ("rev 0" -> "rev 1": old tokens decrement
    via pre-images, new tokens increment) and the delete wave removes
    whole rows' token counts. The returned top-k head must equal the
    DuckDB twin's fresh vocabulary over the LWW-resolved live state —
    count desc / token asc is a total order, so the cut is deterministic
    in both engines."""
    from orientdb_neo4j_importer_plugin_spark.lake.sketchview import (
        StreamedVocabView,
    )

    feed = feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_vocab_")
    source = SnapshotTable.create(
        spark, os.path.join(root, "transcripts"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    state = StreamedVocabView.create_state(spark, os.path.join(root, "vocab"))
    view = StreamedVocabView(source, state)
    apply_changes(feed.filter("op = 'I'"), source, batch_id="v1", mode="mor")
    view.refresh()
    apply_changes(feed.filter("op <> 'I'"), source, batch_id="v2", mode="mor")
    view.refresh()
    view.refresh()  # no new source version: committed no-op
    return view.topk(VOCAB_VIEW_K)


CDC_VOCAB_VIEW_SQL = f"""
{_STATE_CTE},
vv_toks AS (
  SELECT conv_id, turn_idx, unnest({tokens_sql("text")}) AS token
  FROM state WHERE text IS NOT NULL
),
vv_per_row AS (
  SELECT token, conv_id, turn_idx, count(*) AS c
  FROM vv_toks GROUP BY token, conv_id, turn_idx
)
SELECT token,
       CAST(sum(c) AS BIGINT) AS n_occurrences,
       CAST(count(*) AS BIGINT) AS n_docs
FROM vv_per_row GROUP BY token
ORDER BY n_occurrences DESC, token ASC LIMIT {VOCAB_VIEW_K}
"""


def _mvj_setup(spark: SparkSession, sf_dir: str):
    """Shared fixture of the two join-view contract queries: transcripts
    (fact, from lineitem) + per-conversation metadata (changing dimension,
    from orders) + an empty target, wired into an IncrementalJoinView on
    conv_id. Returns (src_a, src_b, view, target, feed, meta, root)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from orientdb_neo4j_importer_plugin_spark.feedgen import meta_feed_from_tpch
    from orientdb_neo4j_importer_plugin_spark.lake.materialize import (
        IncrementalJoinView,
    )
    from orientdb_neo4j_importer_plugin_spark.schema import CONV_META

    feed = feed_from_tpch(spark, sf_dir)
    meta = meta_feed_from_tpch(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_mvj_")
    src_a = SnapshotTable.create(
        spark, os.path.join(root, "turns"), TRANSCRIPTS, "conv_id",
        num_buckets=16, overwrite=True,
    )
    src_b = SnapshotTable.create(
        spark, os.path.join(root, "meta"), CONV_META, "conv_id",
        num_buckets=8, key_columns=["conv_id"], overwrite=True,
    )
    view_schema = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("channel", StringType(), True),
            StructField("priority", StringType(), True),
            StructField("n_turns", LongType(), True),
            StructField("n_chars", LongType(), True),
        ]
    )
    target = SnapshotTable.create(
        spark, os.path.join(root, "view"), view_schema, "conv_id",
        num_buckets=8, key_columns=["conv_id"], overwrite=True,
    )

    def view_fn(turns: DataFrame, m: DataFrame) -> DataFrame:
        agg = turns.groupBy("conv_id").agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )
        return agg.join(
            m.select("conv_id", "channel", "priority"), on="conv_id", how="inner"
        )

    view = IncrementalJoinView(src_a, src_b, target, "conv_id", view_fn)
    return src_a, src_b, view, target, feed, meta, root


def cdc_incremental_view_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-source incremental JOIN view (lake/materialize.
    IncrementalJoinView): transcripts (fact, from lineitem) equi-joined to
    per-conversation metadata (changing dimension, from orders) on
    conv_id, maintained in O(changed join keys) per refresh off BOTH
    commit logs. Batches land interleaved across the two sources with a
    refresh after each wave; the oracle recomputes the joined aggregate
    from scratch over both final LWW states."""
    src_a, src_b, view, target, feed, meta, _ = _mvj_setup(spark, sf_dir)
    # interleaved waves: fact-only, dim-only, then both at once
    apply_changes(feed.filter(_CHLOG_B1), src_a, batch_id="ja1", mode="mor")
    view.refresh()
    apply_changes(meta.filter("pmod(lsn, 2) = 0"), src_b, batch_id="jb1", mode="mor")
    view.refresh()
    apply_changes(feed.filter(_CHLOG_B2), src_a, batch_id="ja2", mode="mor")
    apply_changes(meta.filter("pmod(lsn, 2) = 1"), src_b, batch_id="jb2", mode="mor")
    view.refresh()
    return target.read().orderBy("conv_id")


def cdc_incremental_view_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME join view as `cdc_incremental_view_join`, but maintained by
    the rowlevel-STREAMED path (IncrementalJoinView.stream(rowlevel=True)):
    both sources' materialized row-level changelogs are tailed through the
    `lake_cdf` data source, the micro-batch's join keys drive
    refresh_from_changes directly (zero consumer-side diff work), and the
    stream is killed and resumed from its checkpoint between commit waves.
    Identical oracle (CDC_MVJ_SQL): the end state must not depend on which
    maintenance path ran."""
    src_a, src_b, view, target, feed, meta, root = _mvj_setup(spark, sf_dir)
    ckpt = os.path.join(root, "ckpt")

    def wave() -> None:
        src_a.materialize_changelog()
        src_b.materialize_changelog()
        q = view.stream(ckpt, rowlevel=True)
        q.awaitTermination(600)
        if q.isActive:  # pragma: no cover - hang guard
            q.stop()
            raise RuntimeError("streamed join-view wave did not drain")

    # two waves (streaming start/stop dominates wall at contract scale):
    # fresh checkpoint on a fact-only commit, then a checkpoint RESUME over
    # commits on both sources at once
    apply_changes(feed.filter(_CHLOG_B1), src_a, batch_id="ja1", mode="mor")
    wave()
    apply_changes(meta.filter("pmod(lsn, 2) = 0"), src_b, batch_id="jb1", mode="mor")
    apply_changes(feed.filter(_CHLOG_B2), src_a, batch_id="ja2", mode="mor")
    apply_changes(meta.filter("pmod(lsn, 2) = 1"), src_b, batch_id="jb2", mode="mor")
    wave()
    return target.read().orderBy("conv_id")


# the dimension feed recomputed verbatim in SQL, LWW-reduced, joined to the
# transcripts state from scratch — an independent end-state oracle for the
# incrementally-maintained join view
CDC_MVJ_SQL = f"""
{_STATE_CTE},
meta_base AS (
  SELECT 'conv_' || lpad(CAST(o_orderkey AS VARCHAR), 9, '0') AS conv_id,
         o_custkey, o_orderpriority
  FROM orders
),
meta_hashed AS (
  SELECT *, {h64_sql("conv_id || '|' || CAST(o_custkey AS VARCHAR) || '|' || o_orderpriority")} AS h
  FROM meta_base
),
meta_feed AS (
  SELECT h AS lsn, 'I' AS op, conv_id,
         'ch_' || CAST(o_custkey % 7 AS VARCHAR) AS channel,
         o_orderpriority AS priority
  FROM meta_hashed
  UNION ALL
  SELECT h + 2305843009213693952, 'U', conv_id,
         'ch_' || CAST((o_custkey + 1) % 7 AS VARCHAR), o_orderpriority
  FROM meta_hashed WHERE o_custkey % 5 = 0
  UNION ALL
  SELECT h + 4611686018427387904, 'D', conv_id, NULL, NULL
  FROM meta_hashed WHERE o_custkey % 13 = 0
),
meta_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY lsn DESC) AS rn
  FROM meta_feed
),
meta_state AS (
  SELECT conv_id, channel, priority FROM meta_ranked WHERE rn = 1 AND op <> 'D'
),
conv_agg AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(length(text)) AS BIGINT) AS n_chars
  FROM state GROUP BY conv_id
)
SELECT a.conv_id, m.channel, m.priority, a.n_turns, a.n_chars
FROM conv_agg a JOIN meta_state m ON a.conv_id = m.conv_id
ORDER BY a.conv_id
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return cdc_replay_state(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Query registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # CDC / event semantics
        "cdc_replay_state": cdc_replay_state,
        "cdc_replay_state_mor": lambda s, d: cdc_replay_state(s, d, mode="mor"),
        "cdc_changelog": cdc_changelog,
        "cdc_time_travel": cdc_time_travel,
        "cdc_changelog_envelope": cdc_changelog_envelope,
        "cdc_mirror_stream": cdc_mirror_stream,
        "cdc_conv_churn": cdc_conv_churn,
        "cdc_key_hotness": cdc_key_hotness,
        "cdc_tool_usage_view": cdc_tool_usage_view,
        "cdc_lang_view": cdc_lang_view,
        "cdc_incremental_render": cdc_incremental_render,
        "cdc_cdf_tail": cdc_cdf_tail,
        "cdc_cdf_rowlevel": cdc_cdf_rowlevel,
        "cdc_incremental_view": cdc_incremental_view,
        "cdc_incremental_view_join": cdc_incremental_view_join,
        "cdc_incremental_view_join_stream": cdc_incremental_view_join_stream,
        "cdc_keyrange_scan": cdc_keyrange_scan,
        "cdc_point_lookup": cdc_point_lookup,
        "cdc_merge_into": cdc_merge_into,
        "cdc_dml_where": cdc_dml_where,
        "cdc_wap_publish": cdc_wap_publish,
        "cdc_restore": cdc_restore,
        "cdc_scd2": cdc_scd2,
        "cdc_scd2_view": cdc_scd2_view,
        "cdc_tsrange_scan": cdc_tsrange_scan,
        "cdc_hist_view": cdc_hist_view,
        "cdc_hist_view_stream": cdc_hist_view_stream,
        "cdc_cms_view": cdc_cms_view,
        "cdc_vocab_view": cdc_vocab_view,
        "cdc_patch_state": cdc_patch_state,
        "cdc_patch_apply": cdc_patch_apply,
        "transcripts_integrity": lambda s, d: TR.conversation_integrity(
            _replayed_state(s, d)
        ),
        "transcripts_render": lambda s, d: TR.render_conversations(
            _replayed_state(s, d)
        ),
        "transcripts_training_examples": lambda s, d: TR.training_examples(
            _replayed_state(s, d)
        ),
        "transcripts_sft_pairs": lambda s, d: TR.sft_pairs(_replayed_state(s, d)),
        "transcripts_truncate_budget": lambda s, d: TR.truncate_to_budget(
            _replayed_state(s, d), max_tokens=TRUNCATE_BUDGET_TOKENS
        ),
        "transcripts_merge_roles": lambda s, d: TR.merge_consecutive_roles(
            _replayed_state(s, d)
        ),
        "transcripts_template_groups": lambda s, d: TR.conversation_template_groups(
            _replayed_state(s, d, cluster="hash")
        ),
        "transcripts_export_pipeline": lambda s, d: TR.export_pipeline(
            _replayed_state(s, d), max_tokens=TRUNCATE_BUDGET_TOKENS
        ),
        "transcripts_tool_transitions": lambda s, d: TR.tool_transitions(
            _replayed_state(s, d, cluster="hash")
        ),
        "transcripts_tool_usage": lambda s, d: TR.tool_usage_stats(
            _replayed_state(s, d, cluster="hash")
        ),
        "transcripts_tool_paths": lambda s, d: TR.tool_paths(
            _replayed_state(s, d, cluster="hash")
        ),
        "transcripts_response_latency": lambda s, d: TR.response_latency_stats(
            _replayed_state(s, d)
        ),
        "cdc_latest_state": lambda s, d: S.latest_state(_read(s, d, "events")),
        "events_sessionize": lambda s, d: S.sessionize(_read(s, d, "events")),
        # daily grain: the fixture's first-events split into distinct
        # cohorts (weekly would collapse to one cohort at 100% retention —
        # a green-but-vacuous row, the cdc_tsrange lesson from round 4)
        "events_cohort_retention": lambda s, d: S.cohort_retention(
            _read(s, d, "events"), granularity="day"
        ).orderBy("cohort", "period_offset"),
        # 24h window: the fixture funnels 150 -> 60 -> 14 users (unbounded
        # would be flat 150/150/150 — vacuous)
        "events_funnel": lambda s, d: S.funnel(
            _read(s, d, "events"),
            ["view", "click", "purchase"],
            within_seconds=86400,
        ).orderBy("step_idx"),
        "events_session_window": lambda s, d: S.session_window_agg(
            _read(s, d, "events")
        ),
        "events_pivot_type_by_hour": lambda s, d: S.pivot_type_by_hour(
            _read(s, d, "events")
        ),
        "events_tumbling_counts": lambda s, d: S.tumbling_counts(
            _read(s, d, "events")
        ),
        "events_rolling_stats": lambda s, d: S.rolling_stats(_read(s, d, "events")),
        "events_kmv_users_by_type": lambda s, d: SK.kmv_distinct_by(
            _read(s, d, "events"),
            "event_type",
            F.col("user_id").cast("string"),
        ),
        "events_kmv_user_overlap": lambda s, d: SK.kmv_overlap(
            _read(s, d, "events"),
            "event_type",
            F.col("user_id").cast("string"),
            "click",
            "view",
        ),
        "events_cms_user_counts": lambda s, d: SK.cms_estimate(
            _read(s, d, "events"),
            F.col("user_id").cast("string"),
            s.range(10).select(F.col("id").alias("user_id")),
            F.col("user_id").cast("string"),
        ),
        # relational plans
        "tpch_q1": lambda s, d: Q.q1_pricing_summary(_read(s, d, "lineitem")),
        "tpch_q3": lambda s, d: Q.q3_shipping_priority(
            _read(s, d, "customer"), _read(s, d, "orders"), _read(s, d, "lineitem")
        ),
        "tpch_q4": lambda s, d: Q.q4_order_priority(
            _read(s, d, "orders"), _read(s, d, "lineitem")
        ),
        "tpch_q5": lambda s, d: Q.q5_local_supplier_volume(
            _read(s, d, "customer"),
            _read(s, d, "orders"),
            _read(s, d, "lineitem"),
            _read(s, d, "supplier"),
            _read(s, d, "nation"),
            _read(s, d, "region"),
        ),
        "tpch_q6": lambda s, d: Q.q6_forecast_revenue(_read(s, d, "lineitem")),
        "tpch_q7": lambda s, d: Q.q7_volume_shipping(
            _read(s, d, "customer"),
            _read(s, d, "orders"),
            _read(s, d, "lineitem"),
            _read(s, d, "supplier"),
            _read(s, d, "nation"),
        ),
        "tpch_q12": lambda s, d: Q.q12_priority_by_linestatus(
            _read(s, d, "orders"), _read(s, d, "lineitem")
        ),
        "tpch_q14": lambda s, d: Q.q14_promo_revenue(
            _read(s, d, "lineitem"), _read(s, d, "part")
        ),
        "tpch_q19": lambda s, d: Q.q19_discounted_revenue(
            _read(s, d, "lineitem"), _read(s, d, "part")
        ),
        "tpch_q18": lambda s, d: Q.q18_large_volume_customer(
            _read(s, d, "customer"), _read(s, d, "orders"), _read(s, d, "lineitem")
        ),
        "tpch_q2": lambda s, d: R.q2_min_cost_supplier(
            _read(s, d, "lineitem"),
            _read(s, d, "part"),
            _read(s, d, "supplier"),
            _read(s, d, "nation"),
            _read(s, d, "region"),
        ),
        "tpch_q10": lambda s, d: R.q10_returned_items(
            _read(s, d, "customer"),
            _read(s, d, "orders"),
            _read(s, d, "lineitem"),
            _read(s, d, "nation"),
        ),
        "tpch_q16": lambda s, d: R.q16_supplier_cnt(
            _read(s, d, "lineitem"), _read(s, d, "part")
        ),
        "tpch_q8": lambda s, d: R.q8_market_share(
            _read(s, d, "lineitem"),
            _read(s, d, "orders"),
            _read(s, d, "customer"),
            _read(s, d, "supplier"),
            _read(s, d, "nation"),
            _read(s, d, "region"),
            _read(s, d, "part"),
        ),
        "tpch_q13": lambda s, d: R.q13_order_distribution(
            _read(s, d, "customer"), _read(s, d, "orders")
        ),
        "tpch_q15": lambda s, d: R.q15_top_supplier(
            _read(s, d, "lineitem"), _read(s, d, "supplier")
        ),
        "tpch_q17": lambda s, d: R.q17_small_quantity_revenue(
            _read(s, d, "lineitem"), _read(s, d, "part")
        ),
        "tpch_q9": lambda s, d: R.q9_product_type_profit(
            _read(s, d, "lineitem"),
            _read(s, d, "orders"),
            _read(s, d, "part"),
            _read(s, d, "supplier"),
            _read(s, d, "nation"),
        ),
        "tpch_q11": lambda s, d: R.q11_important_parts(
            _read(s, d, "lineitem"),
            _read(s, d, "supplier"),
            _read(s, d, "nation"),
            _read(s, d, "region"),
        ),
        "tpch_q20": lambda s, d: R.q20_promo_suppliers(
            _read(s, d, "lineitem"), _read(s, d, "supplier"), _read(s, d, "part")
        ),
        "tpch_q21": lambda s, d: R.q21_waiting_suppliers(
            _read(s, d, "lineitem"), _read(s, d, "orders"), _read(s, d, "supplier")
        ),
        "tpch_q22": lambda s, d: R.q22_global_sales_opportunity(
            _read(s, d, "customer"), _read(s, d, "orders")
        ),
        "rollup_returns": lambda s, d: R.rollup_returns(_read(s, d, "lineitem")),
        "cube_ship_years": lambda s, d: R.cube_ship_years(_read(s, d, "lineitem")),
        "gsets_order_mix": lambda s, d: R.gsets_order_mix(_read(s, d, "orders")),
        "setop_customer_segments": lambda s, d: R.setop_customer_segments(
            _read(s, d, "customer"), _read(s, d, "orders")
        ),
        # text analysis
        "docs_token_stats": lambda s, d: T.token_stats(_read(s, d, "documents")),
        "docs_quality_score": lambda s, d: T.quality_score(_read(s, d, "documents")),
        "docs_lang_id": lambda s, d: T.lang_id(_read(s, d, "documents")),
        "docs_lang_id_ngram": lambda s, d: T.lang_id_ngram(_read(s, d, "documents")),
        "docs_fingerprint": lambda s, d: T.fingerprint(_read(s, d, "documents")),
        "docs_dup_components": lambda s, d: G.dup_components(
            _read(s, d, "documents")
        ),
        "docs_repetition_signals": lambda s, d: RP.repetition_signals(
            _read(s, d, "documents")
        ),
        "docs_decontaminate": lambda s, d: RP.decontaminate(
            _read(s, d, "documents").filter("doc_id % 41 <> 0"),
            _read(s, d, "documents").filter("doc_id % 41 = 0"),
        ),
        "docs_vocab_topk": lambda s, d: RP.vocab_topk(
            _read(s, d, "documents")
        ),
        "docs_redact_pii": lambda s, d: T.redact_pii(_read(s, d, "documents")),
        "docs_training_pipeline": lambda s, d: PL.training_pipeline(
            _read(s, d, "documents")
        ),
        "docs_stratified_sample": lambda s, d: SM.stratified_sample(
            _read(s, d, "documents")
        ),
        "docs_train_split": lambda s, d: SM.train_split(_read(s, d, "documents")),
        "docs_quality_weighted_sample": lambda s, d: SM.quality_weighted_sample(
            _read(s, d, "documents")
        ),
        "docs_pack_sequences": lambda s, d: SM.pack_documents(
            _read(s, d, "documents")
        ),
        # dedup suite
        "dedup_exact_groups": lambda s, d: D.exact_dedup_groups(
            _read(s, d, "documents")
        ).select("content_hash", "n_docs", "keep_doc_id"),
        "dedup_exact_keep": lambda s, d: D.exact_dedup_keep(_read(s, d, "documents")),
        "dedup_minhash_signatures": lambda s, d: D.minhash_signatures(
            _read(s, d, "documents")
        ),
        "dedup_minhash_lsh_pairs": lambda s, d: D.minhash_lsh_pairs(
            _read(s, d, "documents")
        ),
        "dedup_simhash": lambda s, d: D.simhash(_read(s, d, "documents")),
        "dedup_ngram_jaccard": lambda s, d: D.ngram_jaccard_pairs(
            _read(s, d, "documents")
        ),
        "dedup_levenshtein_pairs": lambda s, d: D.levenshtein_pairs(
            _read(s, d, "documents")
        ),
        # scalar-function / probe analogues (SURVEY §2.5-2.7)
        "events_props_parse": lambda s, d: S.props_parse(_read(s, d, "events")),
        "events_first_value": lambda s, d: S.first_value_sample(
            _read(s, d, "events")
        ),
        "events_span_summary": lambda s, d: S.span_summary(_read(s, d, "events")),
        "events_error_window_join": lambda s, d: TP.error_window_hits(
            _read(s, d, "events")
        ),
        "events_asof_join": lambda s, d: TP.purchase_asof_click(
            _read(s, d, "events")
        ),
        "events_value_quantiles": lambda s, d: TP.value_quantiles(
            _read(s, d, "events")
        ),
        "events_value_quantiles_hist": lambda s, d: TP.value_quantiles_hist(
            _read(s, d, "events")
        ),
        "docs_contains_probe": lambda s, d: T.contains_probe(
            _read(s, d, "documents")
        ),
        "docs_normalize": lambda s, d: _read(s, d, "documents").select(
            "doc_id", N.normalize_text_expr("text").alias("norm_text")
        ),
        # similarity search
        "emb_topk_cosine": lambda s, d: V.brute_force_topk(
            _read(s, d, "embeddings"), EMB_QUERY_IDS, EMB_TOPK
        ),
        # tables/planes PINNED to the SQL twin's static constants: the
        # operator's default derives them from the corpus size, which
        # diverges from the fixed-text oracle above n=1024 (sf0.1+)
        "emb_near_dup_pairs": lambda s, d: V.near_dup_pairs(
            _read(s, d, "embeddings"), dim=EMB_DIM,
            tables=V.NEAR_DUP_TABLES, planes=V.NEAR_DUP_PLANES,
        ),
        # LSH top-k: both entries run the multi-table+multiprobe path with
        # PINNED (tables, planes) matching their fixed-text SQL twins.
        # emb_lsh_topk pins the lsh_scale_params fixed point for n <= 1024
        # (what the no-argument default derives at the contract scales);
        # emb_lsh_topk_multi pins the measured recall-1.0 explicit point.
        # The old single-table default measured recall 0.0-0.16 in the
        # bench's hard regime — retired from the contract (the function
        # keeps it behind an explicit `planes=` for the bench curve).
        "emb_lsh_topk": lambda s, d: V.lsh_topk_multi(
            _read(s, d, "embeddings"), EMB_QUERY_IDS, EMB_TOPK, dim=EMB_DIM,
            tables=LSH_TOPK_TABLES, planes=LSH_TOPK_PLANES,
        ),
        "emb_lsh_topk_multi": lambda s, d: V.lsh_topk_multi(
            _read(s, d, "embeddings"), EMB_QUERY_IDS, EMB_TOPK, dim=EMB_DIM,
            tables=LSH_MULTI_TABLES, planes=LSH_MULTI_PLANES,
        ),
        "emb_centroid_by_label": lambda s, d: V.centroid_by_label_str(
            _read(s, d, "embeddings"), dim=EMB_DIM
        ),
        "emb_ivf_topk": lambda s, d: V.ivf_topk(
            _read(s, d, "embeddings"), EMB_QUERY_IDS, EMB_TOPK
        ),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_replay_state": CDC_REPLAY_SQL,
        "cdc_replay_state_mor": CDC_REPLAY_SQL,
        "cdc_changelog": CDC_CHANGELOG_SQL,
        "cdc_time_travel": CDC_TIME_TRAVEL_SQL,
        "cdc_changelog_envelope": CDC_CHANGELOG_ENVELOPE_SQL,
        "cdc_mirror_stream": CDC_REPLAY_SQL,
        "cdc_conv_churn": TR.conversation_churn_sql(_ENV_CTE),
        "cdc_key_hotness": CDC_KEY_HOTNESS_SQL,
        "cdc_tool_usage_view": CDC_TOOL_USAGE_VIEW_SQL,
        "cdc_lang_view": CDC_LANG_VIEW_SQL,
        "cdc_incremental_render": TR.render_conversations_sql(_STATE_CTE),
        "cdc_cdf_tail": CDC_REPLAY_SQL,
        "cdc_cdf_rowlevel": CDC_CDF_ROWLEVEL_SQL,
        "cdc_incremental_view": CDC_MV_SQL,
        "cdc_incremental_view_join": CDC_MVJ_SQL,
        "cdc_incremental_view_join_stream": CDC_MVJ_SQL,
        "cdc_keyrange_scan": CDC_KEYRANGE_SQL,
        "cdc_point_lookup": CDC_POINT_LOOKUP_SQL,
        "cdc_merge_into": CDC_MERGE_SQL,
        "cdc_dml_where": CDC_DML_WHERE_SQL,
        "cdc_wap_publish": CDC_WAP_PUBLISH_SQL,
        "cdc_restore": CDC_RESTORE_SQL,
        "cdc_scd2": CDC_SCD2_SQL,
        "cdc_scd2_view": CDC_SCD2_VIEW_SQL,
        "cdc_tsrange_scan": CDC_TSRANGE_SQL,
        "cdc_hist_view": CDC_HIST_VIEW_SQL,
        "cdc_hist_view_stream": CDC_HIST_VIEW_SQL,
        "cdc_cms_view": CDC_CMS_VIEW_SQL,
        "cdc_vocab_view": CDC_VOCAB_VIEW_SQL,
        "cdc_patch_state": CDC_PATCH_STATE_SQL,
        "cdc_patch_apply": CDC_PATCH_STATE_SQL,
        "transcripts_integrity": TR.conversation_integrity_sql(_STATE_CTE),
        "transcripts_render": TR.render_conversations_sql(_STATE_CTE),
        "transcripts_training_examples": TR.training_examples_sql(_STATE_CTE),
        "transcripts_sft_pairs": TR.sft_pairs_sql(_STATE_CTE),
        "transcripts_truncate_budget": TR.truncate_to_budget_sql(
            _STATE_CTE, max_tokens=TRUNCATE_BUDGET_TOKENS
        ),
        "transcripts_merge_roles": TR.merge_consecutive_roles_sql(_STATE_CTE),
        "transcripts_template_groups": TR.conversation_template_groups_sql(
            _STATE_CTE
        ),
        "transcripts_export_pipeline": TR.export_pipeline_sql(
            _STATE_CTE, max_tokens=TRUNCATE_BUDGET_TOKENS
        ),
        "transcripts_tool_transitions": TR.tool_transitions_sql(_STATE_CTE),
        "transcripts_tool_usage": TR.tool_usage_stats_sql(_STATE_CTE),
        "transcripts_tool_paths": TR.tool_paths_sql(_STATE_CTE),
        "transcripts_response_latency": TR.response_latency_stats_sql(_STATE_CTE),
        "cdc_latest_state": S.LATEST_STATE_SQL,
        "events_sessionize": S.sessionize_sql(),
        "events_cohort_retention": S.cohort_retention_sql("day"),
        "events_funnel": S.funnel_sql(
            ["view", "click", "purchase"], within_seconds=86400
        ),
        "events_session_window": S.session_window_agg_sql(),
        "events_pivot_type_by_hour": S.pivot_type_by_hour_sql(),
        "events_tumbling_counts": S.tumbling_counts_sql(),
        "events_rolling_stats": S.rolling_stats_sql(),
        "events_kmv_users_by_type": SK.kmv_distinct_by_sql(
            "events", "event_type", "CAST(user_id AS VARCHAR)"
        ),
        "events_kmv_user_overlap": SK.kmv_overlap_sql(
            "events", "event_type", "CAST(user_id AS VARCHAR)", "click", "view"
        ),
        "events_cms_user_counts": SK.cms_estimate_sql(
            "events",
            "CAST(user_id AS VARCHAR)",
            "SELECT CAST(range AS BIGINT) AS user_id FROM range(0, 10)",
            ["user_id"],
            "CAST(user_id AS VARCHAR)",
        ),
        "tpch_q1": Q.Q1_SQL,
        "tpch_q3": Q.Q3_SQL,
        "tpch_q4": Q.Q4_SQL,
        "tpch_q5": Q.Q5_SQL,
        "tpch_q6": Q.Q6_SQL,
        "tpch_q7": Q.Q7_SQL,
        "tpch_q12": Q.Q12_SQL,
        "tpch_q14": Q.Q14_SQL,
        "tpch_q19": Q.Q19_SQL,
        "tpch_q18": Q.q18_sql(),
        "tpch_q2": R.Q2_SQL,
        "tpch_q10": R.Q10_SQL,
        "tpch_q16": R.Q16_SQL,
        "tpch_q8": R.q8_sql(),
        "tpch_q13": R.Q13_SQL,
        "tpch_q15": R.Q15_SQL,
        "tpch_q17": R.Q17_SQL,
        "tpch_q9": R.Q9_SQL,
        "tpch_q11": R.q11_sql(),
        "tpch_q20": R.q20_sql(),
        "tpch_q21": R.q21_sql(),
        "tpch_q22": R.q22_sql(),
        "rollup_returns": R.ROLLUP_RETURNS_SQL,
        "cube_ship_years": R.CUBE_SHIP_YEARS_SQL,
        "gsets_order_mix": R.GSETS_ORDER_MIX_SQL,
        "setop_customer_segments": R.SETOP_CUSTOMER_SEGMENTS_SQL,
        "docs_token_stats": T.TOKEN_STATS_SQL,
        "docs_quality_score": T.QUALITY_SCORE_SQL,
        "docs_lang_id": T.LANG_ID_SQL,
        "docs_lang_id_ngram": T.LANG_ID_NGRAM_SQL,
        "docs_fingerprint": T.FINGERPRINT_SQL,
        "docs_dup_components": G.dup_components_sql(),
        "docs_repetition_signals": RP.repetition_signals_sql(),
        "docs_decontaminate": RP.decontaminate_sql(
            "doc_id % 41 <> 0", "doc_id % 41 = 0"
        ),
        "docs_vocab_topk": RP.vocab_topk_sql(),
        "docs_redact_pii": T.redact_pii_sql(),
        "docs_training_pipeline": PL.training_pipeline_sql(),
        "docs_stratified_sample": SM.stratified_sample_sql(),
        "docs_train_split": SM.train_split_sql(),
        "docs_quality_weighted_sample": SM.quality_weighted_sample_sql(),
        "docs_pack_sequences": SM.pack_documents_sql(),
        "dedup_exact_groups": f"""
            SELECT {h64_sql("text")} AS content_hash,
                   count(*) AS n_docs, min(doc_id) AS keep_doc_id
            FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1
        """,
        "dedup_exact_keep": D.EXACT_DEDUP_KEEP_SQL,
        "dedup_minhash_signatures": D.minhash_signatures_sql(),
        "dedup_minhash_lsh_pairs": D.minhash_lsh_pairs_sql(),
        "dedup_simhash": D.simhash_sql(),
        "dedup_ngram_jaccard": D.ngram_jaccard_pairs_sql(),
        "dedup_levenshtein_pairs": D.levenshtein_pairs_sql(),
        "emb_topk_cosine": V.brute_force_topk_sql(
            EMB_QUERY_IDS, EMB_TOPK, dim=EMB_DIM
        ),
        "emb_near_dup_pairs": V.near_dup_pairs_sql(dim=EMB_DIM),
        "emb_lsh_topk": V.lsh_topk_multi_sql(
            EMB_QUERY_IDS, EMB_TOPK, dim=EMB_DIM,
            tables=LSH_TOPK_TABLES, planes=LSH_TOPK_PLANES,
        ),
        "emb_lsh_topk_multi": V.lsh_topk_multi_sql(
            EMB_QUERY_IDS, EMB_TOPK, dim=EMB_DIM,
            tables=LSH_MULTI_TABLES, planes=LSH_MULTI_PLANES,
        ),
        "emb_centroid_by_label": V.centroid_by_label_str_sql(dim=EMB_DIM),
        "emb_ivf_topk": V.ivf_topk_sql(EMB_QUERY_IDS, EMB_TOPK, dim=EMB_DIM),
        "events_props_parse": S.PROPS_PARSE_SQL,
        "events_first_value": S.FIRST_VALUE_SAMPLE_SQL,
        "events_span_summary": S.SPAN_SUMMARY_SQL,
        "events_error_window_join": TP.ERROR_WINDOW_HITS_SQL,
        "events_asof_join": TP.PURCHASE_ASOF_CLICK_SQL,
        "events_value_quantiles": TP.VALUE_QUANTILES_SQL,
        "events_value_quantiles_hist": TP.VALUE_QUANTILES_HIST_SQL,
        "docs_contains_probe": T.contains_probe_sql(),
        "docs_normalize": (
            "SELECT doc_id, "
            + N.NORMALIZE_SQL_EXPR.format(col="text")
            + " AS norm_text FROM documents ORDER BY doc_id"
        ),
    }
