"""Continuous ingest: segments appear while tail() is polling; every
batch commits exactly-once; final state equals the oracle."""

import shutil
import threading
import time
from pathlib import Path

from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state
from etl_geodata_pipeline_ray.cdc.replay import lake_final_table
from etl_geodata_pipeline_ray.cdc.tail import tail


def test_tail_ingests_arriving_segments(ray_session, tmp_path):
    spec = WalSpec(
        n_convs=150, seed=33, dup_rate=0.1, shuffle_window=200,
        schema_change_frac=0.6, seg_size=600,
    )
    staging = tmp_path / "staging"
    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    wal.mkdir()
    segs = write_wal(spec, staging, overwrite=True)
    assert len(segs) >= 4

    def producer():
        # drip segments into the live WAL dir (atomic per file: copy to
        # temp name then rename, like a real log shipper)
        for p in segs:
            tmp = wal / (".tmp-" + p.name)
            shutil.copyfile(p, tmp)
            tmp.rename(wal / p.name)
            time.sleep(0.35)

    t = threading.Thread(target=producer)
    t.start()
    commits = tail(
        wal, lake, poll_interval_s=0.2, idle_polls=6,
        num_shards=8, mode="append",
    )
    t.join()
    assert len(commits) >= 2, "tail should have committed in multiple batches"
    assert sum(c["committed_segments"] for c in commits) == len(segs)
    assert lake_final_table(lake).equals(oracle_final_state(staging))


def test_tail_quarantines_invalid_events_across_commits(ray_session, tmp_path):
    """The continuous-ingest surface inherits the dead-letter path:
    invalid events arriving over multiple tail commits accumulate in
    quarantine with one manifest per committing poll, and the lake
    stays clean."""
    from etl_geodata_pipeline_ray.cdc.oracle import oracle_quarantine
    from etl_geodata_pipeline_ray.cdc.replay import commit_log, read_quarantine

    spec = WalSpec(
        n_convs=120, seed=35, dup_rate=0.05, seg_size=500, invalid_rate=0.04,
    )
    staging, wal, lake = tmp_path / "staging", tmp_path / "wal", tmp_path / "lake"
    wal.mkdir()
    segs = write_wal(spec, staging, overwrite=True)
    assert len(segs) >= 3

    def producer():
        for p in segs:
            time.sleep(0.4)
            tmp = wal / (".tmp-" + p.name)
            shutil.copy(p, tmp)
            tmp.rename(wal / p.name)

    t = threading.Thread(target=producer)
    t.start()
    commits = tail(wal, lake, poll_interval_s=0.2, idle_polls=6, num_shards=8)
    t.join()
    assert len(commits) >= 2
    assert sum(c.get("quarantined_rows", 0) for c in commits) > 0
    assert lake_final_table(lake).equals(oracle_final_state(wal))
    got = (
        read_quarantine(lake).to_pandas()
        .drop_duplicates(subset=["op_seq"]).sort_values("op_seq").reset_index(drop=True)
    )
    want = oracle_quarantine(wal).to_pandas().reset_index(drop=True)
    assert len(got) == len(want)
    assert len(commit_log(lake)) == len(commits)


def test_commit_log_tolerates_torn_tail(ray_session, tmp_path):
    """A crash mid-append leaves a torn JSONL line; commit_log must
    skip it and the next commit must append cleanly after it."""
    from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
    from etl_geodata_pipeline_ray.cdc.replay import commit_log, replay

    spec = WalSpec(n_convs=60, seed=36, seg_size=400)
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(spec, wal, overwrite=True)
    segs = sorted(wal.glob("seg-*.parquet"))
    replay(wal, lake, num_shards=4, max_segments=len(segs) - 1)
    n1 = len(commit_log(lake))
    assert n1 >= 1
    # simulate the torn tail
    with open(lake / "_manifests" / "_commits.jsonl", "a") as f:
        f.write('{"commit": "torn-half')
    assert len(commit_log(lake)) == n1  # torn line skipped
    replay(wal, lake, num_shards=4)
    log = commit_log(lake)
    assert len(log) == n1 + 1  # clean append after the torn line
    assert log[-1]["n_segments"] == 1
