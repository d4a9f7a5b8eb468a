"""LSM append-mode ingest: commits land delta runs without rewriting
the base; readers LWW-merge runs; compact() collapses them; auto-
compaction engages at the run-count threshold."""

from pathlib import Path

from etl_geodata_pipeline_ray.cdc import manifest as mf
from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state
from etl_geodata_pipeline_ray.cdc.replay import (
    compact,
    lake_final_table,
    read_lake,
    replay,
)

SPEC = WalSpec(
    n_convs=200, seed=21, dup_rate=0.1, shuffle_window=250,
    schema_change_frac=0.6, zipf_s=1.1, seg_size=600,
)


def _setup(tmp_path: Path):
    wal = tmp_path / "wal"
    segs = write_wal(SPEC, wal, overwrite=True)
    return wal, tmp_path / "lake", segs


def test_append_mode_accumulates_runs_and_reads_merge(ray_session, tmp_path):
    wal, lake, segs = _setup(tmp_path)
    n = len(segs)
    assert n >= 3
    # three incremental commits in append mode
    for upto in (n // 3, 2 * n // 3, n):
        replay(wal, lake, num_shards=8, mode="append", max_segments=upto)

    manifests = mf.read_all_manifests(lake)
    assert any(len(m["files"]) > 1 for m in manifests.values()), "no runs accumulated"
    # engine state equals oracle DESPITE uncompacted runs
    assert lake_final_table(lake).equals(oracle_final_state(wal))
    # streaming read path merges runs too
    ds = read_lake(lake)
    assert ds.count() == oracle_final_state(wal).num_rows


def test_compact_collapses_runs(ray_session, tmp_path):
    wal, lake, segs = _setup(tmp_path)
    n = len(segs)
    for upto in (n // 2, n):
        replay(wal, lake, num_shards=8, mode="append", max_segments=upto)
    st = compact(lake)
    assert st["shards_compacted"] > 0
    manifests = mf.read_all_manifests(lake)
    for m in manifests.values():
        assert len(m["files"]) <= max(1, m.get("salt_k", 1))
    assert lake_final_table(lake).equals(oracle_final_state(wal))
    # compaction is idempotent
    assert compact(lake)["shards_compacted"] == 0


def test_auto_compaction_threshold(ray_session, tmp_path):
    wal, lake, segs = _setup(tmp_path)
    n = len(segs)
    # compact_runs=2 → the third touch of a shard triggers rewrite
    for upto in range(1, n + 1):
        replay(wal, lake, num_shards=8, mode="append", max_segments=upto, compact_runs=2)
    manifests = mf.read_all_manifests(lake)
    assert all(len(m["files"]) <= 2 for m in manifests.values())
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_append_partial_then_rewrite_mixed(ray_session, tmp_path):
    """Mixing modes across commits converges to the same state."""
    wal, lake, segs = _setup(tmp_path)
    n = len(segs)
    replay(wal, lake, num_shards=8, mode="append", max_segments=n // 2)
    replay(wal, lake, num_shards=8, mode="rewrite")
    manifests = mf.read_all_manifests(lake)
    for m in manifests.values():
        assert len(m["files"]) <= max(1, m.get("salt_k", 1))
    assert lake_final_table(lake).equals(oracle_final_state(wal))
