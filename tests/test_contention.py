"""Writer-contention behavior of the long-running surfaces: a tail
loop must survive a concurrent vacuum/compact holding the lake lock,
an upsert whose segments are already PUBLISHED must retry the commit
replay instead of forcing callers to re-stage a duplicate copy, and
gc_ingested must refuse to sweep an in-flight upsert's staging."""

import fcntl
import os
import threading
import time
from pathlib import Path

import pyarrow as pa
import pytest
import ray.data

from etl_geodata_pipeline_ray.cdc import manifest as mf
from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
from etl_geodata_pipeline_ray.cdc.ingest import gc_ingested, upsert_dataset
from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state
from etl_geodata_pipeline_ray.cdc.replay import lake_final_table, replay
from etl_geodata_pipeline_ray.cdc.tail import tail

SPEC = WalSpec(n_convs=60, seed=7, dup_rate=0.05, shuffle_window=50,
               seg_size=300, schema_change_frac=0.5)


def _rows(n=4, ts0=1_000):
    return pa.table(
        {
            "conv_id": [f"c{i}" for i in range(n)],
            "turn_idx": pa.array([0] * n, pa.int32()),
            "ts": pa.array([ts0 + i for i in range(n)], pa.timestamp("us")),
            "text": pa.array([f"t{i}" for i in range(n)], pa.large_string()),
        }
    )


def test_tail_survives_lake_lock_contention(ray_session, tmp_path):
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(SPEC, wal, overwrite=True)
    replay(wal, lake, num_shards=4, max_segments=1, mode="append")
    # a concurrent writer (vacuum/compact shape) holds the lake lock
    # for the first ~0.3s of the tail loop; tail must treat the
    # contended polls as idle, then drain the WAL normally
    release = threading.Event()

    def hold():
        with mf.LakeLock(lake):
            release.set()
            time.sleep(0.3)

    t = threading.Thread(target=hold)
    t.start()
    release.wait(5)
    commits = tail(wal, lake, poll_interval_s=0.1, idle_polls=8, num_shards=4)
    t.join()
    assert commits, "tail never committed after the lock was released"
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_tail_defaults_to_append_mode(ray_session, tmp_path, monkeypatch):
    seen = {}
    import etl_geodata_pipeline_ray.cdc.tail as tl

    def fake_replay(wal_dir, lake_dir, **kw):
        seen.update(kw)
        return {"committed_segments": 0}

    monkeypatch.setattr(tl, "replay", fake_replay)
    tail(tmp_path / "w", tmp_path / "l", poll_interval_s=0.01, idle_polls=1)
    assert seen.get("mode") == "append"
    seen.clear()
    tail(tmp_path / "w", tmp_path / "l", poll_interval_s=0.01, idle_polls=1,
         mode="rewrite")
    assert seen.get("mode") == "rewrite"  # caller override respected


def test_upsert_retries_commit_replay_under_contention(ray_session, tmp_path):
    lake = tmp_path / "lake"
    upsert_dataset(ray.data.from_arrow(_rows()), lake, num_shards=4)

    release = threading.Event()

    def hold():
        with mf.LakeLock(lake):
            release.set()
            time.sleep(0.4)

    t = threading.Thread(target=hold)
    t.start()
    release.wait(5)
    # lock held right now: the commit replay inside upsert must retry
    # until the holder exits, not raise after publication
    st = upsert_dataset(
        ray.data.from_arrow(_rows(ts0=2_000)), lake, num_shards=4,
        lock_wait_s=10.0,
    )
    t.join()
    assert st["committed_segments"] > 0
    final = lake_final_table(lake)
    assert final.num_rows == 4
    assert set(final["ts"].cast(pa.int64()).to_pylist()) == {2000, 2001, 2002, 2003}


def test_upsert_timeout_leaves_segments_committable(ray_session, tmp_path):
    lake = tmp_path / "lake"
    upsert_dataset(ray.data.from_arrow(_rows()), lake, num_shards=4)

    stop = threading.Event()

    def hold():
        with mf.LakeLock(lake):
            stop.wait(20)

    t = threading.Thread(target=hold)
    t.start()
    time.sleep(0.1)
    with pytest.raises(mf.LakeLockedError, match="staged exactly-once"):
        upsert_dataset(
            ray.data.from_arrow(_rows(ts0=3_000)), lake, num_shards=4,
            lock_wait_s=0.3,
        )
    stop.set()
    t.join()
    # the published-but-uncommitted segments commit on the next replay
    st = replay(lake / "_ingest", lake, mode="append")
    assert st["committed_segments"] > 0
    assert set(
        lake_final_table(lake)["ts"].cast(pa.int64()).to_pylist()
    ) == {3000, 3001, 3002, 3003}


def test_gc_ingested_skips_under_live_upsert_flock(ray_session, tmp_path):
    lake = tmp_path / "lake"
    upsert_dataset(ray.data.from_arrow(_rows()), lake, num_shards=4)
    stream = Path(lake) / "_ingest"
    # simulate an in-flight upsert mid-stage: staging dir + held flock
    (stream / ".staging-live").mkdir()
    fd = os.open(stream / ".upsert.lock", os.O_CREAT | os.O_RDWR, 0o644)
    fcntl.flock(fd, fcntl.LOCK_EX)
    try:
        assert gc_ingested(lake) == 0
        assert (stream / ".staging-live").exists()
    finally:
        os.close(fd)
    assert gc_ingested(lake) > 0  # lock released: sweep proceeds
    assert not (stream / ".staging-live").exists()
