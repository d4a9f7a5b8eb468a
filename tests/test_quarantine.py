"""Dead-letter (quarantine) path: malformed change events — unknown op
codes, null merge keys — must neither merge nor vanish. They commit to
``quarantine/commit=<id>/reason=<r>/`` with a per-commit manifest and
survive crash/restart without loss or double-counting.

Reference analog: the validity-repair/preflight idea
(``stuttgart_comprehensive_script.py:806-845``) — but a CDC tail must
KEEP the rejects with lineage, not just filter them."""

import json
import shutil
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq

from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state, oracle_quarantine
from etl_geodata_pipeline_ray.cdc.replay import (
    lake_final_table,
    read_quarantine,
    replay,
)

SPEC = WalSpec(
    n_convs=200, seed=77, dup_rate=0.1, shuffle_window=250,
    schema_change_frac=0.6, zipf_s=1.1, seg_size=800, invalid_rate=0.03,
)


def _logical_quarantine(lake) -> pd.DataFrame:
    """Quarantined rows deduped to logical events (dup deliveries of an
    invalid event quarantine once per delivery, like any redelivery)."""
    df = read_quarantine(lake).to_pandas()
    return (
        df.drop_duplicates(subset=["op_seq"]).sort_values("op_seq").reset_index(drop=True)
    )


def _setup(tmp_path: Path, spec=SPEC, **kw):
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(spec, wal, overwrite=True)
    stats = replay(wal, lake, num_shards=8, **kw)
    return wal, lake, stats


def test_quarantine_matches_oracle_and_state_unpolluted(ray_session, tmp_path):
    wal, lake, stats = _setup(tmp_path)
    assert stats["quarantined_rows"] > 0
    # invalid rows never reach the lake
    assert lake_final_table(lake).equals(oracle_final_state(wal))
    got = _logical_quarantine(lake)
    want = oracle_quarantine(wal).to_pandas().reset_index(drop=True)
    assert set(got["dlq_reason"]) == {"invalid_op", "unroutable_key"}
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_quarantine_idempotent_and_micro_batched(ray_session, tmp_path):
    wal, lake, stats = _setup(tmp_path, max_bytes_per_commit=150_000)
    assert stats.get("micro_batches", 0) >= 2
    n1 = len(_logical_quarantine(lake))
    assert stats["quarantined_rows"] >= n1 > 0
    st2 = replay(wal, lake, num_shards=8)
    assert st2["committed_segments"] == 0
    assert len(_logical_quarantine(lake)) == n1
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_orphan_quarantine_rolls_back(ray_session, tmp_path):
    """A quarantine entry whose commit never reached the shard
    manifests (crash in the window between the two) is rolled back on
    the next replay — and the rows re-quarantine with the segments."""
    wal, lake, _ = _setup(tmp_path)
    before = _logical_quarantine(lake)

    # forge a crash leftover: quarantine manifest + dir for a commit
    # whose segments were never committed
    fake = lake / "quarantine" / "commit=deadbeef0000" / "reason=invalid_op"
    fake.mkdir(parents=True)
    src = next((lake / "quarantine").glob("commit=*/reason=*/*.parquet"))
    shutil.copy(src, fake / "leftover.parquet")
    (lake / "_manifests" / "quarantine-deadbeef0000.json").write_text(
        json.dumps({
            "commit": "deadbeef0000",
            "segments": ["seg-999999999999.parquet"],
            "rows": 1,
            "files": [{
                "path": "quarantine/commit=deadbeef0000/reason=invalid_op/leftover.parquet",
                "rows": 1, "bytes": 1, "reason": "invalid_op",
            }],
        })
    )
    replay(wal, lake, num_shards=8)  # no pending segments; still rolls back
    assert not (lake / "quarantine" / "commit=deadbeef0000").exists()
    assert not (lake / "_manifests" / "quarantine-deadbeef0000.json").exists()
    pd.testing.assert_frame_equal(_logical_quarantine(lake), before)


def test_unmanifested_quarantine_dir_is_gcd(ray_session, tmp_path):
    """Crash BEFORE the quarantine manifest lands: the moved files are
    invisible to read_quarantine and removed by the next commit's GC."""
    wal, lake, _ = _setup(tmp_path)
    orphan = lake / "quarantine" / "commit=feedface1111" / "reason=invalid_op"
    orphan.mkdir(parents=True)
    (orphan / "orphan.parquet").write_bytes(b"not a parquet")
    n = len(_logical_quarantine(lake))  # unreadable orphan not included

    # a fresh commit (new segments) triggers GC
    spec2 = WalSpec(**{**SPEC.__dict__, "n_convs": 40, "seed": 78})
    extra = tmp_path / "extra"
    write_wal(spec2, extra, overwrite=True)
    segs = sorted((tmp_path / "wal").glob("seg-*.parquet"))
    last = max(int(p.stem.split("-")[1]) for p in segs)
    for i, p in enumerate(sorted(extra.glob("seg-*.parquet"))):
        shutil.copy(p, tmp_path / "wal" / f"seg-{last + (i + 1) * 10**6:012d}.parquet")
    replay(wal, lake, num_shards=8)
    assert not (lake / "quarantine" / "commit=feedface1111").exists()
    assert len(_logical_quarantine(lake)) > n  # new commit's rejects landed


def test_validate_lake_covers_quarantine(ray_session, tmp_path):
    from etl_geodata_pipeline_ray.cdc.validate import validate_lake

    wal, lake, _ = _setup(tmp_path)
    v = validate_lake(lake)
    assert v["ok"], v["violations"]

    # corrupt one quarantine manifest row count -> I6 fires
    mpath = next((lake / "_manifests").glob("quarantine-*.json"))
    rec = json.loads(mpath.read_text())
    rec["files"][0]["rows"] += 1
    mpath.write_text(json.dumps(rec))
    v2 = validate_lake(lake)
    assert not v2["ok"] and any("I6" in s for s in v2["violations"])


def test_clean_wal_has_no_quarantine(ray_session, tmp_path):
    spec = WalSpec(n_convs=60, seed=21)
    wal, lake, stats = _setup(tmp_path, spec)
    assert stats["quarantined_rows"] == 0
    assert not (lake / "quarantine").exists()
    q = read_quarantine(lake)
    assert q.count() == 0
    assert "dlq_reason" in q.schema().names
