"""Property-based fuzz of the LWW merge semantics: ANY random batch of
I/U/D events over a tiny keyspace — duplicated, shuffled, with ts
ties, sprinkled with INVALID events (unknown op, null merge key) —
must replay to exactly the oracle state, with exactly the oracle's
dead-letter set quarantined. Catches tie-break, tombstone, and
validity-routing edge cases the seeded scenarios may miss."""

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state, oracle_quarantine
from etl_geodata_pipeline_ray.cdc.replay import (
    lake_final_table,
    read_quarantine,
    replay,
)
from etl_geodata_pipeline_ray.cdc.schema import EVENT_SCHEMA

_BASE_TS = 1_700_000_000_000_000

event_strategy = st.fixed_dictionaries(
    {
        # "X" = unknown op, None conv_id = unroutable: both quarantine
        "op": st.sampled_from(["I", "U", "D", "I", "U", "D", "X"]),
        "conv_id": st.sampled_from(["a", "b", "c", "a", "b", "c", None]),
        "turn_idx": st.integers(0, 2),
        # small ts range on purpose → frequent ties, op_seq tiebreaks
        "ts_off": st.integers(0, 4),
    }
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event_strategy, min_size=1, max_size=40),
    split=st.integers(1, 39),
)
def test_random_event_log_matches_oracle(ray_session, tmp_path_factory, events, split):
    tmp = tmp_path_factory.mktemp("fuzz")
    wal, lake = tmp / "wal", tmp / "lake"
    wal.mkdir()

    rows = {k: [] for k in EVENT_SCHEMA.names}
    for seq, e in enumerate(events):
        rows["op"].append(e["op"])
        rows["op_seq"].append(seq)
        rows["ts"].append(_BASE_TS + e["ts_off"])
        rows["conv_id"].append(e["conv_id"])
        rows["turn_idx"].append(e["turn_idx"])
        is_del = e["op"] == "D"
        rows["role"].append(None if is_del else "user")
        rows["text"].append(None if is_del else f"txt-{e['conv_id']}-{e['turn_idx']}-{seq}")
        rows["tool"].append(None)
    table = pa.table(rows, schema=EVENT_SCHEMA)

    cut = min(split, table.num_rows)
    pq.write_table(table.slice(0, cut), wal / "seg-000000000000.parquet")
    if table.num_rows > cut:
        pq.write_table(table.slice(cut), wal / f"seg-{cut:012d}.parquet")

    st_ = replay(wal, lake, num_shards=4)
    eng = lake_final_table(lake)
    ora = oracle_final_state(wal)
    assert eng.equals(ora), f"\nengine:\n{eng.to_pandas()}\noracle:\n{ora.to_pandas()}"
    oq = oracle_quarantine(wal)
    assert st_.get("quarantined_rows", 0) == oq.num_rows
    if oq.num_rows:
        got = (
            read_quarantine(lake)
            .to_pandas()
            .sort_values("op_seq")
            .reset_index(drop=True)
        )
        want = oq.to_pandas().reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event_strategy, min_size=4, max_size=18),
    seg_rows=st.integers(1, 5),
    compact_runs=st.integers(2, 4),
)
def test_incremental_append_with_folds_matches_oracle(
    ray_session, tmp_path_factory, events, seg_rows, compact_runs
):
    """Segment-at-a-time append replay with an aggressively small run
    budget: size-tiered folds fire mid-stream (including over
    quarantined batches and tombstones), and every prefix must still
    land on exactly the oracle state."""
    tmp = tmp_path_factory.mktemp("fuzzfold")
    wal, lake = tmp / "wal", tmp / "lake"
    wal.mkdir()

    rows = {k: [] for k in EVENT_SCHEMA.names}
    for seq, e in enumerate(events):
        rows["op"].append(e["op"])
        rows["op_seq"].append(seq)
        rows["ts"].append(_BASE_TS + e["ts_off"])
        rows["conv_id"].append(e["conv_id"])
        rows["turn_idx"].append(e["turn_idx"])
        is_del = e["op"] == "D"
        rows["role"].append(None if is_del else "user")
        rows["text"].append(None if is_del else f"txt-{e['conv_id']}-{e['turn_idx']}-{seq}")
        rows["tool"].append(None)
    table = pa.table(rows, schema=EVENT_SCHEMA)

    n_segs = 0
    for start in range(0, table.num_rows, seg_rows):
        pq.write_table(table.slice(start, seg_rows), wal / f"seg-{start:012d}.parquet")
        n_segs += 1

    for i in range(1, n_segs + 1):  # one commit per segment
        replay(
            wal, lake, num_shards=2, mode="append",
            max_segments=i, compact_runs=compact_runs,
        )
    eng = lake_final_table(lake)
    ora = oracle_final_state(wal)
    assert eng.equals(ora), f"\nengine:\n{eng.to_pandas()}\noracle:\n{ora.to_pandas()}"
