"""Partition evolution (``reshard``): a lake's hash shard count can
grow or shrink through a crash-safe two-phase swap. State must be
byte-equal before and after; readers must resolve exactly through
every crash point of the swap (marker overlay); time travel across a
reshard is truncated LOUDLY, never silently empty."""

import json
from pathlib import Path

import pytest

import etl_geodata_pipeline_ray.cdc.replay as rp
from etl_geodata_pipeline_ray.cdc import manifest as mf
from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state
from etl_geodata_pipeline_ray.cdc.replay import (
    commit_log,
    lake_final_table,
    lake_stats,
    read_conversation,
    read_lake,
    replay,
    reshard,
    vacuum,
)
from etl_geodata_pipeline_ray.cdc.validate import validate_lake

SPEC = WalSpec(
    n_convs=220, seed=47, dup_rate=0.06, shuffle_window=150,
    seg_size=600, schema_change_frac=0.5,
)


def _lake(tmp_path: Path, num_shards=8, max_segments=None, mode="append"):
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    if not wal.exists():
        write_wal(SPEC, wal, overwrite=True)
    replay(wal, lake, num_shards=num_shards, mode=mode,
           max_segments=max_segments, retain_versions=2)
    return wal, lake


@pytest.mark.parametrize("new_n", [16, 4])
def test_reshard_preserves_state_and_layout(ray_session, tmp_path, new_n):
    wal, lake = _lake(tmp_path, num_shards=8, mode="append",
                      max_segments=None)
    before = lake_final_table(lake)
    st = reshard(lake, new_n)
    assert st["resharded"] and st["num_shards"] == new_n
    assert lake_final_table(lake).equals(before)
    assert lake_final_table(lake).equals(oracle_final_state(wal))
    # layout flipped everywhere: meta, manifests, routing invariant I4
    stats = lake_stats(lake)
    assert stats["num_shards"] == new_n and not stats["pending_reshard"]
    manifests = mf.read_all_manifests(lake)
    assert set(manifests) <= set(range(new_n))
    v = validate_lake(lake)
    assert v["ok"], v["violations"]
    # old layout's files are GC'd; commit log carries the reshard record
    rec = [e for e in commit_log(lake) if e.get("reshard")]
    assert rec and rec[-1]["reshard"] == {"from": 8, "to": new_n}


def test_reshard_noop_and_coprime_warning(ray_session, tmp_path):
    _, lake = _lake(tmp_path, num_shards=8)
    assert reshard(lake, 8) == {"resharded": False, "num_shards": 8}
    before = lake_final_table(lake)
    with pytest.warns(UserWarning, match="gcd"):
        st = reshard(lake, 13)  # gcd 1: 13 reads per file — warned
    assert st["resharded"]
    assert lake_final_table(lake).equals(before)
    assert validate_lake(lake)["ok"]


def test_reshard_truncates_time_travel_loudly(ray_session, tmp_path):
    wal, lake = _lake(tmp_path, num_shards=8, max_segments=3)
    replay(wal, lake, mode="append")
    data = [e for e in commit_log(lake) if e["n_segments"]]
    pre = data[0]["commit"]
    reshard(lake, 16)
    with pytest.raises(ValueError, match="reshard"):
        lake_final_table(lake, at_commit=pre)
    # the reshard commit itself and later commits resolve fine
    rcid = [e for e in commit_log(lake) if e.get("reshard")][0]["commit"]
    assert lake_final_table(lake, at_commit=rcid).equals(
        oracle_final_state(wal)
    )


def test_reshard_crash_windows_read_exact(ray_session, tmp_path, monkeypatch):
    """Kill the swap at its two interesting crash points — marker
    committed but nothing finalized, and finalize half-done — and
    prove readers resolve the NEW state exactly at both, then that the
    next writer completes the swap."""
    wal, lake = _lake(tmp_path, num_shards=8, mode="append")
    want = lake_final_table(lake)
    ora = want.to_pandas()

    # crash point 1: marker written, finalize never ran
    monkeypatch.setattr(rp, "_finalize_reshard_if_pending",
                        lambda *a, **k: False)
    st = reshard(lake, 16)
    monkeypatch.undo()
    marker = mf.reshard_marker(lake)
    assert marker is not None and marker["to"] == 16
    assert lake_stats(lake)["pending_reshard"]
    assert lake_stats(lake)["num_shards"] == 16
    assert lake_final_table(lake).equals(want)
    cid = ora["conv_id"].iloc[0]
    got = read_conversation(lake, cid).to_pandas().reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got, ora[ora["conv_id"] == cid].reset_index(drop=True)
    )
    with pytest.raises(ValueError, match="not yet finalized"):
        lake_final_table(lake, at_commit=st["commit"])

    # crash point 2: one staged manifest already moved into place
    sdir = mf.reshard_staging_dir(lake, marker["commit"])
    staged = sorted(sdir.glob("shard-*.json"))
    import os

    os.replace(staged[0], Path(lake) / mf.MANIFEST_DIR / staged[0].name)
    assert lake_final_table(lake).equals(want)
    assert set(mf.read_all_manifests(lake)) == set(range(16))
    # next writer (vacuum) finalizes the swap
    rep = vacuum(lake)
    assert mf.reshard_marker(lake) is None
    assert not lake_stats(lake)["pending_reshard"]
    assert lake_final_table(lake).equals(want)
    assert validate_lake(lake)["ok"]
    assert [e for e in commit_log(lake) if e.get("reshard")]
    # old layout PINNED (not GC'd): a lock-free reader that resolved
    # the pre-reshard manifests keeps its files for a retention grace
    live = {Path(f).name for f in rp.lake_files(lake)}
    on_disk = {p.name for p in Path(lake).glob("shard=*/*.parquet")}
    assert on_disk > live, "old layout should survive the grace window"
    assert list((Path(lake) / mf.MANIFEST_DIR).glob("_reshard_dead-*.json"))
    # after retain_versions (=2) subsequent commits the pin expires and
    # the old layout is reclaimed
    import pyarrow as pa
    import pyarrow.parquet as pq

    top = max(int(p.stem.split("-")[1]) for p in Path(wal).glob("seg-*.parquet"))
    for i in range(2):
        row = pa.table(
            {"op": ["U"], "op_seq": pa.array([10**9 + i], pa.int64()),
             "ts": pa.array([10**15 + i], pa.timestamp("us")),
             "conv_id": [f"zz{i}"], "turn_idx": pa.array([0], pa.int32()),
             "role": ["user"], "text": pa.array([f"t{i}"], pa.large_string())}
        )
        pq.write_table(row, Path(wal) / f"seg-{top + 10 * (i + 1):012d}.parquet")
        replay(wal, lake, mode="append")
    vacuum(lake)
    assert not list((Path(lake) / mf.MANIFEST_DIR).glob("_reshard_dead-*.json"))
    live = {Path(f).name for f in rp.lake_files(lake)}
    on_disk = {p.name for p in Path(lake).glob("shard=*/*.parquet")}
    assert on_disk == live
    assert validate_lake(lake)["ok"]


def test_replay_continues_after_reshard(ray_session, tmp_path):
    """A resharded lake keeps tailing its WAL: later segments commit
    under the new layout and the final state matches the oracle."""
    wal, lake = _lake(tmp_path, num_shards=4, max_segments=2, mode="append")
    reshard(lake, 8)
    replay(wal, lake, mode="append")
    assert lake_final_table(lake).equals(oracle_final_state(wal))
    assert lake_stats(lake)["num_shards"] == 8
    assert validate_lake(lake)["ok"]
    # and read_lake streams the same state
    n = read_lake(lake).count()
    assert n == oracle_final_state(wal).num_rows
