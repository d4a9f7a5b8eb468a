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
