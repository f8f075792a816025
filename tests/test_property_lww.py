"""Property-based replay equivalence: random op sequences -> engine state
equals the pure-Python oracle, regardless of batching, order, or mode.

Hypothesis generates event sequences (the reference's seeded fixture
generators taken to their logical conclusion); the oracle is
``oracle.reduce_events_python`` — no Spark, no SQL, ~15 lines.
"""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.oracle import reduce_events_python
from orientdb_neo4j_importer_plugin_spark.schema import CHANGE_EVENT_V1, TRANSCRIPTS_V1

BASE = datetime.datetime(2024, 1, 1)


@st.composite
def event_sequences(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    events = []
    for lsn in range(n):
        conv = draw(st.integers(min_value=0, max_value=3))
        turn = draw(st.integers(min_value=0, max_value=3))
        op = draw(st.sampled_from(["I", "U", "D"]))
        events.append(
            {
                "lsn": lsn,
                "op": op,
                "source_part": 0,
                "conv_id": f"conv_{conv}",
                "turn_idx": turn,
                "role": None if op == "D" else "user",
                "text": None if op == "D" else f"text {conv}/{turn} @ {lsn}",
                "ts": BASE + datetime.timedelta(seconds=lsn),
            }
        )
    # duplicate delivery of a random subset (at-least-once)
    dup_idx = draw(
        st.lists(st.integers(min_value=0, max_value=n - 1), max_size=5, unique=True)
    )
    events += [events[i] for i in dup_idx]
    n_batches = draw(st.integers(min_value=1, max_value=3))
    mode = draw(st.sampled_from(["cow", "mor"]))
    # batch assignment (arbitrary split, arbitrary apply order)
    assignment = draw(
        st.lists(
            st.integers(min_value=0, max_value=n_batches - 1),
            min_size=len(events),
            max_size=len(events),
        )
    )
    return events, assignment, n_batches, mode


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.data_too_large],
)
@given(event_sequences())
def test_engine_equals_python_oracle(spark, tmp_path_factory, seq):
    events, assignment, n_batches, mode = seq
    tmp = tmp_path_factory.mktemp("prop")
    table = SnapshotTable.create(
        spark, str(tmp / "t"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    rows = [
        (
            e["lsn"], e["op"], e["source_part"], e["conv_id"], e["turn_idx"],
            e["role"], e["text"], e["ts"],
        )
        for e in events
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_V1)
    for b in range(n_batches):
        idx = [i for i, a in enumerate(assignment) if a == b]
        lsns = {events[i]["lsn"] for i in idx}
        batch = df.filter(df.lsn.isin(list(lsns)) if lsns else df.lsn < 0)
        apply_changes(batch, table, batch_id=f"p-{b}", mode=mode)
    got = [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"])
        for r in table.read().orderBy("conv_id", "turn_idx").collect()
    ]
    want = [
        (r.conv_id, r.turn_idx, r.role, r.text)
        for r in reduce_events_python(events)
    ]
    assert got == want
