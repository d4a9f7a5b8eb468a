"""upsert_dataset: commit a Ray Dataset through the engine's commit
protocol — LWW upserts, deletes via an op column, crash-staged
segments finished by the next call, GC of committed stream files."""

import pyarrow as pa
import pytest
import ray.data

from etl_geodata_pipeline_ray.cdc.ingest import gc_ingested, upsert_dataset
from etl_geodata_pipeline_ray.cdc.replay import lake_final_table, replay


def _rows(items):
    return ray.data.from_arrow(pa.table({
        "conv_id": [i[0] for i in items],
        "turn_idx": pa.array([i[1] for i in items], pa.int32()),
        "ts": pa.array([1_700_000_000_000_000 + i[2] for i in items],
                       pa.timestamp("us")),
        "text": pa.array([i[3] for i in items], pa.large_string()),
    }))


def test_upsert_lww_and_delete(ray_session, tmp_path):
    lake = tmp_path / "lake"
    st = upsert_dataset(_rows([("a", 0, 1, "v1"), ("a", 1, 1, "x"),
                               ("b", 0, 1, "y")]), lake, num_shards=4)
    assert st["committed_segments"] >= 1
    assert lake_final_table(lake).num_rows == 3

    # newer ts wins; older ts loses; delete removes
    st = upsert_dataset(_rows([("a", 0, 5, "v2"), ("b", 0, 0, "stale")]),
                        lake, num_shards=4)
    t = lake_final_table(lake).to_pandas().set_index(["conv_id", "turn_idx"])
    assert t.loc[("a", 0), "text"] == "v2"
    assert t.loc[("b", 0), "text"] == "y"

    dele = ray.data.from_arrow(pa.table({
        "conv_id": ["a"], "turn_idx": pa.array([1], pa.int32()),
        "ts": pa.array([1_700_000_000_000_009], pa.timestamp("us")),
        "op": ["D"],
    }))
    upsert_dataset(dele, lake, num_shards=4)
    t = lake_final_table(lake)
    keys = set(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
    assert ("a", 1) not in keys and len(keys) == 2

    # idempotent follow-up: staged segments all committed, GC removes them
    n = gc_ingested(lake)
    assert n >= 3
    assert not list((lake / "_ingest").glob("seg-*.parquet"))
    assert lake_final_table(lake).num_rows == 2


def test_upsert_refuses_foreign_stream_lake(ray_session, tmp_path):
    from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal

    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(WalSpec(n_convs=50, seed=1), wal, overwrite=True)
    replay(wal, lake, num_shards=4)
    with pytest.raises(ValueError, match="tails WAL stream"):
        upsert_dataset(_rows([("z", 0, 1, "t")]), lake, num_shards=4)


def test_upsert_missing_key_columns_raise(ray_session, tmp_path):
    ds = ray.data.from_arrow(pa.table({"conv_id": ["a"], "text": ["t"]}))
    with pytest.raises(ValueError, match="missing"):
        upsert_dataset(ds, tmp_path / "lake", num_shards=2)


def test_upsert_finishes_crash_staged_segments(ray_session, tmp_path):
    """Segments staged by a crashed upsert (present in _ingest, absent
    from the log) are committed by the next upsert call, and the next
    base offset never collides with them."""
    lake = tmp_path / "lake"
    upsert_dataset(_rows([("a", 0, 1, "v1")]), lake, num_shards=2)
    # simulate a crash AFTER staging, BEFORE replay: strip the log
    log = lake / "_manifests" / "_commits.jsonl"
    log.write_bytes(b"")
    names0 = {p.name for p in (lake / "_ingest").glob("seg-*.parquet")}
    st = upsert_dataset(_rows([("b", 0, 1, "v1")]), lake, num_shards=2)
    names1 = {p.name for p in (lake / "_ingest").glob("seg-*.parquet")}
    assert names0 < names1  # new offsets, no collision
    # BOTH the orphaned slice and the new one are now committed
    t = lake_final_table(lake)
    assert set(t["conv_id"].to_pylist()) == {"a", "b"}
    assert st["committed_segments"] == len(names1)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),      # conv
                st.integers(0, 2),                      # turn
                st.integers(0, 6),                      # ts offset
                st.booleans(),                          # delete?
            ),
            min_size=1, max_size=8,
        ),
        min_size=1, max_size=4,
    )
)
def test_upsert_fuzz_matches_pandas_lww(ray_session, tmp_path_factory, batches):
    """Random upsert/delete sequences must land on exactly the pandas
    LWW oracle: per key keep the max (ts, op_seq) revision, drop it if
    that revision is a delete. op_seq is made explicit and globally
    unique so every winner is deterministic."""
    import pandas as pd

    lake = tmp_path_factory.mktemp("upfuzz") / "lake"
    all_rows, seq = [], 0
    for batch in batches:
        rows = []
        for conv, turn, tso, is_del in batch:
            rows.append((conv, turn, tso, is_del, seq))
            seq += 1
        all_rows.extend(rows)
        ds = ray.data.from_arrow(pa.table({
            "conv_id": [r[0] for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([1_700_000_000_000_000 + r[2] for r in rows],
                           pa.timestamp("us")),
            "op": ["D" if r[3] else "U" for r in rows],
            "op_seq": pa.array([r[4] for r in rows], pa.int64()),
            "text": [None if r[3] else f"t{r[4]}" for r in rows],
        }))
        upsert_dataset(ds, lake, num_shards=2)

    df = pd.DataFrame(all_rows, columns=["conv_id", "turn_idx", "tso", "is_del", "op_seq"])
    win = (
        df.sort_values(["tso", "op_seq"])
        .groupby(["conv_id", "turn_idx"])
        .last()
        .reset_index()
    )
    want = win[~win.is_del][["conv_id", "turn_idx", "op_seq"]]
    got = lake_final_table(lake).to_pandas()
    got["op_seq_from_text"] = got["text"].str.removeprefix("t").astype(int)
    got = got[["conv_id", "turn_idx", "op_seq_from_text"]]
    want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["conv_id"].values == want["conv_id"].values).all()
    assert (got["turn_idx"].values == want["turn_idx"].values).all()
    assert (got["op_seq_from_text"].values == want["op_seq"].values).all()
