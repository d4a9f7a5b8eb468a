"""Replay-correctness suite: engine final state vs single-process oracle
under the FIXTURES.md F2 scenario matrix (clean / dupes / out_of_order /
schema_change / hot_key / crash_restart)."""

from pathlib import Path

import pyarrow.parquet as pq
import pytest

from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state
from etl_geodata_pipeline_ray.cdc.replay import lake_final_table, read_lake, replay

SCENARIOS = {
    "clean": WalSpec(n_convs=150, seed=11),
    "dupes": WalSpec(n_convs=150, seed=12, dup_rate=0.1),
    "out_of_order": WalSpec(n_convs=150, seed=13, shuffle_window=300),
    "schema_change": WalSpec(n_convs=150, seed=14, schema_change_frac=0.5, seg_size=500),
    "hot_key": WalSpec(n_convs=150, seed=15, zipf_s=1.2, dup_rate=0.05),
    "everything": WalSpec(
        n_convs=200, seed=16, dup_rate=0.1, shuffle_window=250,
        schema_change_frac=0.6, zipf_s=1.1, seg_size=800,
    ),
}


def _run(tmp_path: Path, spec: WalSpec, **replay_kw):
    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    write_wal(spec, wal, overwrite=True)
    stats = replay(wal, lake, num_shards=8, **replay_kw)
    return wal, lake, stats


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_scenario_matches_oracle(ray_session, tmp_path, name):
    spec = SCENARIOS[name]
    wal, lake, _ = _run(tmp_path, spec)
    eng = lake_final_table(lake)
    ora = oracle_final_state(wal)
    assert eng.num_rows == ora.num_rows
    assert eng.equals(ora), f"{name}: engine state != oracle state"


def test_replay_is_idempotent(ray_session, tmp_path):
    spec = SCENARIOS["everything"]
    wal, lake, stats1 = _run(tmp_path, spec)
    stats2 = replay(wal, lake, num_shards=8)
    assert stats2["committed_segments"] == 0
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_crash_restart_partial_commit(ray_session, tmp_path):
    """Apply half the WAL, then 'crash' in the torn window of the
    commit protocol — shard manifests durable but the commit-log
    append (THE commit point) never landed — by stripping the last log
    record. The segments must read as uncommitted, re-replay
    idempotently, and converge to the oracle state."""
    spec = SCENARIOS["everything"]
    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    segs = write_wal(spec, wal, overwrite=True)
    assert len(segs) >= 3
    st1 = replay(wal, lake, num_shards=8, max_segments=len(segs) // 2)
    assert st1["committed_segments"] == len(segs) // 2

    log = lake / "_manifests" / "_commits.jsonl"
    lines = log.read_bytes().splitlines(keepends=True)
    log.write_bytes(b"".join(lines[:-1]))  # the commit never happened

    st2 = replay(wal, lake, num_shards=8)
    assert st2["committed_segments"] == len(segs)  # torn batch re-replayed
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_resume_skips_committed_segments(ray_session, tmp_path):
    spec = SCENARIOS["clean"]
    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    segs = write_wal(spec, wal, overwrite=True)
    replay(wal, lake, num_shards=8, max_segments=1)
    stats = replay(wal, lake, num_shards=8)
    assert stats["committed_segments"] == len(segs) - 1
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_salting_engages_and_preserves_state(ray_session, tmp_path):
    spec = SCENARIOS["hot_key"]
    wal, lake, stats = _run(tmp_path, spec, salt_threshold=20_000)
    assert stats["salted_shards"] > 0, "hot-key scenario should trigger salting"
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_lake_refuses_foreign_wal_stream(ray_session, tmp_path):
    """A lake tails one WAL stream; segment names are its offsets.
    Replaying a different stream with colliding names must refuse
    loudly, not silently no-op."""
    spec = SCENARIOS["clean"]
    wal, lake, _ = _run(tmp_path, spec)
    wal2 = tmp_path / "wal2"
    write_wal(WalSpec(n_convs=100, seed=99), wal2, overwrite=True)
    with pytest.raises(ValueError, match="tails WAL stream"):
        replay(wal2, lake, num_shards=8)


def test_schema_evolution_nullfills_tool(ray_session, tmp_path):
    spec = SCENARIOS["schema_change"]
    wal, lake, _ = _run(tmp_path, spec)
    # physical check: at least one segment lacks tool, one has it
    schemas = [pq.read_schema(p).names for p in sorted(wal.glob("seg-*.parquet"))]
    assert any("tool" not in s for s in schemas)
    assert any("tool" in s for s in schemas)
    eng = lake_final_table(lake)
    assert "tool" in eng.column_names
    assert eng.equals(oracle_final_state(wal))


def test_read_lake_dataset(ray_session, tmp_path):
    spec = SCENARIOS["clean"]
    wal, lake, _ = _run(tmp_path, spec)
    ds = read_lake(lake)
    assert ds.count() == oracle_final_state(wal).num_rows
    assert set(ds.schema().names) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_tombstones_prevent_resurrection(ray_session, tmp_path):
    """A stale update re-delivered in a later commit, after the delete
    that supersedes it was already committed, must not resurrect the
    row — the tombstone's (ts, op_seq) wins under LWW."""
    import pyarrow as pa

    from etl_geodata_pipeline_ray.cdc.schema import EVENT_SCHEMA

    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    wal.mkdir()

    def seg(path, rows):
        cols = {k: [r[k] for r in rows] for k in EVENT_SCHEMA.names}
        pq.write_table(pa.table(cols, schema=EVENT_SCHEMA), path)

    e = lambda op, seq, text=None: {
        "op": op, "op_seq": seq, "ts": 1_700_000_000_000_000 + seq,
        "conv_id": "conv_x", "turn_idx": 0,
        "role": None if op == "D" else "user", "text": text, "tool": None,
    }
    seg(wal / "seg-000000000000.parquet", [e("I", 0, "v0"), e("D", 2)])
    replay(wal, lake, num_shards=4)
    assert lake_final_table(lake).num_rows == 0
    # late duplicate of an *older* update arrives in the next segment
    seg(wal / "seg-000000000002.parquet", [e("U", 1, "stale")])
    replay(wal, lake, num_shards=4)
    assert lake_final_table(lake).num_rows == 0, "stale update resurrected a deleted row"


def test_schema_widening_across_segments(ray_session, tmp_path):
    """Type WIDENING (not just column addition): a segment written with
    int16 turn_idx / plain-string text unifies with the full schema and
    replays byte-exact after casts."""
    import pyarrow as pa

    from etl_geodata_pipeline_ray.cdc.schema import EVENT_SCHEMA

    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    wal.mkdir()

    narrow = pa.schema(
        [
            pa.field("op", pa.string()),
            pa.field("op_seq", pa.int32()),          # narrower than int64
            pa.field("ts", pa.timestamp("us")),
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int16()),        # narrower than int32
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),           # string vs large_string
        ]
    )
    t0 = pa.table(
        {
            "op": ["I", "I"], "op_seq": pa.array([0, 1], pa.int32()),
            "ts": pa.array([1_700_000_000_000_000, 1_700_000_000_000_001], pa.timestamp("us")),
            "conv_id": ["c1", "c1"], "turn_idx": pa.array([0, 1], pa.int16()),
            "role": ["system", "user"], "text": ["hello", "world"],
        },
        schema=narrow,
    )
    pq.write_table(t0, wal / "seg-000000000000.parquet")
    t1 = pa.table(
        {
            "op": ["U"], "op_seq": pa.array([2], pa.int64()),
            "ts": pa.array([1_700_000_000_000_002], pa.timestamp("us")),
            "conv_id": ["c1"], "turn_idx": pa.array([1], pa.int32()),
            "role": ["user"], "text": pa.array(["world v2"], pa.large_string()),
            "tool": pa.array([None], pa.string()),
        },
        schema=EVENT_SCHEMA,
    )
    pq.write_table(t1, wal / "seg-000000000002.parquet")

    replay(wal, lake, num_shards=4)
    final = lake_final_table(lake)
    assert final.num_rows == 2
    assert final["text"].to_pylist() == ["hello", "world v2"]
    assert final.schema.field("turn_idx").type == pa.int32()
    assert final.schema.field("text").type == pa.large_string()


def test_timestamp_unit_widening_lww(ray_session, tmp_path):
    """A segment whose writer stamped ts at MILLISECOND resolution
    unifies with microsecond segments, and LWW ordering is correct
    ACROSS the unit change (4000 ms must beat 2000 µs — a naive
    raw-int64 compare would get this backwards by 1000×)."""
    import pyarrow as pa

    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    wal.mkdir()
    t0 = pa.table(
        {
            "op": ["U", "U"], "op_seq": pa.array([1, 2], pa.int64()),
            "ts": pa.array([1_000, 2_000], pa.timestamp("us")),
            "conv_id": ["a", "a"], "turn_idx": pa.array([0, 1], pa.int32()),
            "role": ["user", "assistant"],
            "text": pa.array(["x", "y"], pa.large_string()),
        }
    )
    pq.write_table(t0, wal / "seg-000000000000.parquet")
    t1 = pa.table(
        {
            "op": ["U", "D"], "op_seq": pa.array([3, 4], pa.int32()),
            "ts": pa.array([4_000, 5_000], pa.timestamp("ms")),  # ms!
            "conv_id": ["a", "a"], "turn_idx": pa.array([1, 0], pa.int16()),
            "role": ["assistant", "user"],
            "text": pa.array(["y2", "gone"], pa.string()),
        }
    )
    pq.write_table(t1, wal / "seg-000000000002.parquet")

    replay(wal, lake, num_shards=4)
    final = lake_final_table(lake)
    assert final["text"].to_pylist() == ["y2"], final.to_pydict()
    assert final.schema.field("ts").type == pa.timestamp("us")
    # 4000 ms re-expressed in the unified µs unit
    assert final["ts"].cast(pa.int64()).to_pylist() == [4_000_000]


def test_concurrent_replay_refused(ray_session, tmp_path):
    """A live flock on the lake makes a second replay fail loudly —
    in-process (second fd) AND from another OS process; a holder that
    DIES releases the lock automatically (kernel-owned, no break
    protocol); a non-holder's __exit__ is a no-op on the live lock."""
    import subprocess
    import sys

    from etl_geodata_pipeline_ray.cdc import manifest as mf
    from etl_geodata_pipeline_ray.cdc.manifest import LakeLockedError

    spec = SCENARIOS["clean"]
    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    write_wal(spec, wal, overwrite=True)
    replay(wal, lake, num_shards=4, max_segments=1)

    with mf.LakeLock(lake):  # simulate another live writer
        with pytest.raises(LakeLockedError, match="locked by live pid"):
            replay(wal, lake, num_shards=4)

        # cross-process contention: a second OS process must be refused
        rc = subprocess.run(
            [
                sys.executable,
                "-c",
                "import sys;"
                "from etl_geodata_pipeline_ray.cdc.manifest import LakeLock, LakeLockedError\n"
                "try:\n"
                f"    LakeLock({str(lake)!r}).__enter__(); sys.exit(1)\n"
                "except LakeLockedError:\n"
                "    sys.exit(0)\n",
            ],
            cwd="/root/repo",
        )
        assert rc.returncode == 0, "second process acquired a held lock"

        # a non-holder instance exiting must not release the live lock
        bystander = mf.LakeLock(lake)
        bystander.__exit__(None, None, None)
        with pytest.raises(LakeLockedError, match="locked by live pid"):
            mf.LakeLock(lake).__enter__()

    # dead holder (process that flocked and exited) → auto-released
    rc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from etl_geodata_pipeline_ray.cdc.manifest import LakeLock;"
            f"LakeLock({str(lake)!r}).__enter__()",  # exits without __exit__
        ],
        cwd="/root/repo",
    )
    assert rc.returncode == 0
    with mf.LakeLock(lake):
        pass

    stats = replay(wal, lake, num_shards=4)
    assert stats["committed_segments"] >= 1
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_chunked_wal_replay_matches_oracle(ray_session, tmp_path):
    """write_wal_chunked (streaming generator for inputs too big to
    materialize) must replay to the oracle state, including its
    multiple per-chunk schema transitions."""
    import pyarrow.parquet as _pq

    from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal_chunked

    spec = WalSpec(
        n_convs=1500, seed=23, dup_rate=0.08, shuffle_window=150,
        schema_change_frac=0.5, zipf_s=1.1, seg_size=2000,
    )
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    paths = write_wal_chunked(spec, wal, chunk_convs=600, overwrite=True)
    assert len({tuple(_pq.read_schema(p).names) for p in paths}) == 2
    replay(wal, lake, num_shards=8)
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_parallel_wal_replay_matches_oracle(ray_session, tmp_path):
    """write_wal_parallel (Ray-task generator for 10^10-scale test
    WALs) must be deterministic across runs and replay to the oracle
    state, with the per-chunk schema transitions intact despite its
    sparse fixed-stride segment offsets."""
    import pyarrow.parquet as _pq

    from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal_parallel

    spec = WalSpec(
        n_convs=1500, seed=23, dup_rate=0.08, shuffle_window=150,
        schema_change_frac=0.5, zipf_s=1.1, seg_size=2000,
    )
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    paths = write_wal_parallel(spec, wal, chunk_convs=600, overwrite=True, task_cpus=1)
    assert len({tuple(_pq.read_schema(p).names) for p in paths}) == 2
    paths2 = write_wal_parallel(
        spec, tmp_path / "wal2", chunk_convs=600, overwrite=True, task_cpus=1
    )
    assert [p.name for p in paths] == [p.name for p in paths2]
    assert all(
        a.read_bytes() == b.read_bytes() for a, b in zip(paths, paths2)
    ), "parallel generation must be deterministic"
    replay(wal, lake, num_shards=8)
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_micro_batched_commits_match_oracle(ray_session, tmp_path):
    """A backlog above max_bytes_per_commit splits into sequential
    append-mode commits + trailing compaction; final state must equal
    the oracle and a re-run must be a no-op."""
    spec = SCENARIOS["everything"]
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(spec, wal, overwrite=True)
    st = replay(wal, lake, num_shards=8, max_bytes_per_commit=100_000)
    assert st.get("micro_batches", 0) >= 2
    assert "shards_compacted" in st  # trailing compaction ran (rewrite mode)
    assert lake_final_table(lake).equals(oracle_final_state(wal))
    st2 = replay(wal, lake, num_shards=8, max_bytes_per_commit=100_000)
    assert st2["committed_segments"] == 0


def test_salting_with_micro_batched_commits(ray_session, tmp_path):
    """Hot-key salting and micro-batched commits compose: both engage
    and the final state still equals the oracle."""
    spec = SCENARIOS["hot_key"]
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(spec, wal, overwrite=True)
    st = replay(
        wal, lake, num_shards=8,
        salt_threshold=20_000, max_bytes_per_commit=100_000,
    )
    assert st.get("micro_batches", 0) >= 2
    assert st["salted_shards"] > 0
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_validate_lake_invariants(ray_session, tmp_path):
    """validate_lake passes a committed lake (rewrite AND append mode)
    and flags a corrupted file."""
    import pyarrow.parquet as _pq

    from etl_geodata_pipeline_ray.cdc.validate import validate_lake

    spec = SCENARIOS["everything"]
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(spec, wal, overwrite=True)
    replay(wal, lake, num_shards=8)
    res = validate_lake(lake)
    assert res["ok"] and res["files_checked"] >= 8, res

    lake2 = tmp_path / "lake2"
    replay(wal, lake2, num_shards=8, mode="append", max_segments=2)
    replay(wal, lake2, num_shards=8, mode="append")
    assert validate_lake(lake2)["ok"]

    # corrupt one manifest zone → I7 must fire (an under-covering
    # zone would let read_lake's pruning skip matching shards)
    import json as _json

    from etl_geodata_pipeline_ray.cdc import manifest as _mf

    mpath = sorted((lake2 / _mf.MANIFEST_DIR).glob("shard-*.json"))[0]
    m = _json.loads(mpath.read_text())
    zoned = next(f for f in m["files"] if (f.get("zones") or {}).get("role"))
    zoned["zones"]["role"]["values"] = ["ghost_only"]
    _mf.atomic_write_json(m, mpath)
    bad2 = validate_lake(lake2)
    assert not bad2["ok"] and any("I7 zone[role]" in v for v in bad2["violations"])

    # corrupt one committed file → I5 must fire
    f = sorted(lake.glob("shard=*/**/*.parquet"))[0]
    t = _pq.read_table(f)
    _pq.write_table(t.slice(0, t.num_rows - 1), f)
    bad = validate_lake(lake)
    assert not bad["ok"] and any("I5" in v for v in bad["violations"])


def test_partial_micro_batch_then_resume(ray_session, tmp_path):
    """Interrupting a micro-batched backlog between batches (simulated
    by max_segments) and re-running with the same cap converges to the
    oracle state."""
    spec = SCENARIOS["everything"]
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    segs = write_wal(spec, wal, overwrite=True)
    replay(wal, lake, num_shards=8, max_bytes_per_commit=100_000,
           max_segments=len(segs) // 2)
    st = replay(wal, lake, num_shards=8, max_bytes_per_commit=100_000)
    assert st["committed_segments"] == len(segs) - len(segs) // 2
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_salt_split_streams_per_file(ray_session, tmp_path):
    """The hot-shard salt pre-split must be file-streamed (one output
    slice per input file per salt — task memory bounded by one delta
    file) and its per-salt union must equal the salt partition of the
    full delta."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray as _ray

    from etl_geodata_pipeline_ray.cdc.replay import (
        _salt_split_task,
        hash_u64,
        salt_of,
    )

    rng = np.random.default_rng(7)
    k, num_shards = 3, 8
    files = []
    all_parts = []
    for i in range(4):  # multi-file hot shard
        t = pa.table(
            {
                "conv_id": pa.array([f"c{v}" for v in rng.integers(0, 200, 500)]),
                "v": pa.array(rng.integers(0, 10**6, 500)),
                "merge_group": pa.array(np.full(500, 5, dtype=np.int64)),
            }
        )
        p = tmp_path / f"delta-{i}.parquet"
        pq.write_table(t, p)
        files.append(str(p))
        all_parts.append(t.drop_columns(["merge_group"]))
    full = pa.concat_tables(all_parts)
    slt_full = salt_of(hash_u64(full["conv_id"]), num_shards, k)

    paths = _ray.get(
        _salt_split_task.remote(files, k, num_shards, str(tmp_path / "salted"))
    )
    assert len(paths) == k
    # per-file streaming: a salt present in every input file has one
    # slice per input file, not one concatenated file
    assert max(len(p) for p in paths) == len(files)
    for j in range(k):
        if not paths[j]:
            assert (slt_full == j).sum() == 0
            continue
        got = pa.concat_tables([pq.read_table(p) for p in paths[j]])
        want = full.filter(pa.array(slt_full == j))
        got_sorted = got.sort_by([("conv_id", "ascending"), ("v", "ascending")])
        want_sorted = want.sort_by([("conv_id", "ascending"), ("v", "ascending")])
        assert got_sorted.equals(want_sorted), f"salt {j} mismatch"


def test_merge_mem_estimate_bounds(ray_session):
    """Memory-admission estimates: floor for tiny merges, scales with
    inputs, and is capped below the cluster memory resource so an
    oversized task degrades to running alone instead of never
    scheduling."""
    import ray as _ray

    from etl_geodata_pipeline_ray.cdc.replay import _merge_mem_bytes

    assert _merge_mem_bytes(0, 0, 1, 0) == 256 << 20  # floor
    small = _merge_mem_bytes(10 << 20, 100 << 20, 1, 50 << 20)
    big = _merge_mem_bytes(10 << 20, 10 << 30, 1, 1 << 30)
    assert small < big
    cap = int(_ray.cluster_resources().get("memory", 0) * 0.7)
    if cap:
        assert _merge_mem_bytes(1 << 40, 1 << 40, 1, 1 << 39) <= cap
    # salting divides the base share
    assert _merge_mem_bytes(0, 8 << 30, 8, 0) < _merge_mem_bytes(0, 8 << 30, 1, 0)


def test_lease_lock_zombie_cannot_commit(ray_session, tmp_path):
    """Round-3 verdict #7: the multi-node lease design, simulated
    single-node. A writer whose lease expired (stalled, no heartbeat)
    must be fenced at the commit point — after a new holder claims the
    next epoch, the zombie's commit raises and nothing lands."""
    import time

    import pytest

    import etl_geodata_pipeline_ray.cdc.manifest as mf
    from etl_geodata_pipeline_ray.cdc.manifest import (
        LakeLockedError,
        LeaseFencedError,
        LeaseLock,
    )

    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    write_wal(SCENARIOS["clean"], wal, overwrite=True)

    # happy path: full replay under a lease lock, oracle-equal
    replay(wal, lake, num_shards=8, lock_cls=mf.LeaseLock)
    assert lake_final_table(lake).equals(oracle_final_state(wal))

    # live holder refuses a contender
    with LeaseLock(lake, ttl_s=30):
        with pytest.raises(LakeLockedError, match="lease epoch"):
            LeaseLock(lake, ttl_s=30).__enter__()

    # zombie: acquires, stalls past its ttl without heartbeating
    zombie = LeaseLock(lake, ttl_s=0.3, auto_heartbeat=False)
    zombie.__enter__()
    e0 = zombie.epoch
    time.sleep(0.4)
    # expired-but-not-stolen is already fenced (a steal can happen any
    # moment): the zombie must not commit on a dead lease either
    with pytest.raises(LeaseFencedError, match="expired"):
        zombie.check()
    # a new holder claims the next epoch (monotonic fencing token)
    taker = LeaseLock(lake, ttl_s=30, auto_heartbeat=False)
    taker.__enter__()
    assert taker.epoch == e0 + 1
    with pytest.raises(LeaseFencedError, match="fenced by epoch"):
        zombie.check()

    # end-to-end: the zombie's replay must abort at the fencing point
    # with NO new commit visible
    class ZombieLease:
        def __init__(self, lake_dir):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            pass

        check = staticmethod(zombie.check)

    from etl_geodata_pipeline_ray.cdc.replay import commit_log

    wal2 = tmp_path / "wal2"
    # small seg_size so max_segments=1 leaves a real backlog for the
    # zombie replay to attempt (and be fenced on)
    write_wal(WalSpec(n_convs=60, seed=77, seg_size=200), wal2, overwrite=True)
    lake2 = tmp_path / "lake2"
    replay(wal2, lake2, num_shards=4, max_segments=1)
    log_before = commit_log(lake2)
    mans_before = {
        p.name: p.read_bytes()
        for p in (lake2 / "_manifests").glob("shard-*.json")
    }
    with pytest.raises(LeaseFencedError):
        replay(wal2, lake2, num_shards=4, lock_cls=ZombieLease)
    assert commit_log(lake2) == log_before
    assert {
        p.name: p.read_bytes()
        for p in (lake2 / "_manifests").glob("shard-*.json")
    } == mans_before
    taker_epoch = taker.epoch
    taker.__exit__()

    # epoch monotonicity survives clean release: next acquire continues
    nxt = LeaseLock(lake, ttl_s=30, auto_heartbeat=False)
    nxt.__enter__()
    assert nxt.epoch == taker_epoch + 1
    nxt.__exit__()


def test_wal_waves_disjoint_and_oracle_equal(ray_session, tmp_path):
    """Wave-style ingestion (r3 verdict #4): bounded WAL slices
    generated with ``chunk_base`` offsets form ONE logical stream —
    disjoint conv-id / op_seq / segment-name spaces — and replaying
    wave-by-wave (GC-ing each wave's segments after its commit, so the
    full WAL never co-resides) yields the same lake as the combined
    stream's oracle."""
    import shutil

    from etl_geodata_pipeline_ray.cdc.generator import write_wal_parallel

    spec = WalSpec(
        n_convs=300, seed=11, dup_rate=0.08, shuffle_window=100,
        schema_change_frac=0.5, zipf_s=1.1, seg_size=700,
    )
    chunk_convs = 120  # 3 chunks per wave
    chunks_per_wave = -(-spec.n_convs // chunk_convs)
    combined = tmp_path / "combined"
    combined.mkdir()
    lake = tmp_path / "lake"
    wal = tmp_path / "wal"  # ONE stream dir: lake pins wal_id to it
    names = set()
    for w in range(3):
        paths = write_wal_parallel(
            spec, wal, chunk_convs=chunk_convs,
            chunk_base=w * chunks_per_wave, task_cpus=1,
        )
        new = {p.name for p in paths}
        assert not (new & names), "segment names must be globally unique"
        names |= new
        for p in paths:  # keep a copy for the combined-stream oracle
            shutil.copy(p, combined / p.name)
        st = replay(wal, lake, num_shards=8, mode="append")
        assert st["committed_segments"] == len(paths)
        for p in paths:  # GC the committed wave in place
            p.unlink()

    got = lake_final_table(lake)
    want = oracle_final_state(combined)
    assert got.equals(want)
    # disjoint conv spaces: every wave contributed rows
    convs = got["conv_id"].to_pylist()
    assert any(c == "conv_0000000" for c in convs)
    assert len({c for c in convs}) > 600  # ~3 x 300 minus deletes


def test_concurrent_lease_writers_interleave(ray_session, tmp_path):
    """Multi-writer posture: N real OS processes race ``replay(...,
    lock_cls=LeaseLock)`` over ONE shared WAL into ONE lake, each
    grabbing a few segments per lease acquisition. Exactly one holds
    the lease at a time (the others see ``LakeLockedError`` and
    retry); the interleaved commits must converge to the combined
    oracle, and at least two distinct processes must have committed —
    the single-node simulation of multi-node writers sharing a store."""
    import subprocess
    import sys

    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    spec = WalSpec(
        n_convs=400, seed=23, dup_rate=0.08, shuffle_window=200,
        schema_change_frac=0.5, zipf_s=1.1, seg_size=300,
    )
    segs = write_wal(spec, wal, overwrite=True)
    assert len(segs) >= 12

    writer = tmp_path / "writer.py"
    writer.write_text(
        "import sys, time, logging, json\n"
        f"sys.path.insert(0, {str(Path(__file__).resolve().parents[1])!r})\n"
        "import ray\n"
        "ray.init(address='local', num_cpus=2, include_dashboard=False,\n"
        "         logging_level=logging.ERROR)\n"
        "from ray.data import DataContext\n"
        "DataContext.get_current().enable_progress_bars = False\n"
        "from etl_geodata_pipeline_ray.cdc import manifest as mf\n"
        "from etl_geodata_pipeline_ray.cdc.replay import replay\n"
        "wal, lake, total = sys.argv[1], sys.argv[2], int(sys.argv[3])\n"
        "mine, k = 0, 3\n"
        "while True:\n"
        "    try:\n"
        "        # max_segments is a PREFIX cap: walking k up the ladder\n"
        "        # commits at most 3 new segments per lease acquisition\n"
        "        st = replay(wal, lake, num_shards=8, mode='append',\n"
        "                    max_segments=(k if k < total else None),\n"
        "                    lock_cls=mf.LeaseLock)\n"
        "    except mf.LakeLockedError:\n"
        "        time.sleep(0.05)\n"
        "        continue\n"
        "    mine += st['committed_segments']\n"
        "    if k >= total and st['committed_segments'] == 0:\n"
        "        break  # a FULL replay found nothing pending: stream done\n"
        "    k += 3\n"
        "    if st['committed_segments']:\n"
        "        time.sleep(0.3)  # window for the others to win the lease\n"
        "print(json.dumps({'committed': mine}))\n"
        "ray.shutdown()\n"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(writer), str(wal), str(lake), str(len(segs))],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for _ in range(3)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs)
    import json as _json

    committed = [_json.loads(o.strip().splitlines()[-1])["committed"] for o in outs]
    assert sum(committed) == len(segs)
    assert sum(1 for c in committed if c > 0) >= 2, committed
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_validate_lake_variable_length_conv_ids(ray_session, tmp_path):
    """Regression for a 10^9-rung validator false positive: pandas'
    Series-str concat kernel silently drops "\\x00", so a
    separator-joined composite key collapsed ("conv_1010653", 10) and
    ("conv_10106531", 0) into the same string and I3 false-flagged any
    compacted lake whose conv ids cross a digit-length boundary. The
    check must be tuple-wise."""
    import pyarrow as pa

    from etl_geodata_pipeline_ray.cdc.schema import EVENT_SCHEMA
    from etl_geodata_pipeline_ray.cdc.replay import compact
    from etl_geodata_pipeline_ray.cdc.validate import validate_lake

    base = 1_700_000_000_000_000
    rows = {
        "op": ["I"] * 4,
        "op_seq": [1, 2, 3, 4],
        "ts": pa.array([base + i for i in range(4)], pa.timestamp("us")),
        "conv_id": ["conv_1010653", "conv_10106531", "conv_1010653", "conv_10106531"],
        "turn_idx": pa.array([10, 0, 11, 1], pa.int32()),
        "role": ["user"] * 4,
        "text": pa.array(["a", "b", "c", "d"], pa.large_string()),
        "tool": [None] * 4,
    }
    wal = tmp_path / "wal"
    wal.mkdir()
    pq.write_table(pa.table(rows, schema=EVENT_SCHEMA), wal / "seg-000000000000.parquet")
    lake = tmp_path / "lake"
    st = replay(wal, lake, num_shards=2, mode="append")
    assert st["committed_segments"] == 1
    compact(lake)
    v = validate_lake(lake)
    assert v["ok"], v["violations"]
    assert lake_final_table(lake).num_rows == 4


def test_tiered_fold_keeps_dominant_base():
    """Unit: the size-tiered plan folds young runs and keeps the
    dominant base tier; the run-count budget forces kept tiers back
    into the fold when they alone would bust ``compact_runs``."""
    from etl_geodata_pipeline_ray.cdc.replay import _tiered_fold

    def rec(version, salt, nbytes):
        return {"salt": salt, "path": f"shard=00000/v{version:06d}-s{salt:03d}.parquet",
                "rows": 1, "bytes": nbytes}

    base = [rec(1, s, 100_000_000) for s in range(2)]  # 200 MB tier
    runs = [rec(v, 0, 1_000_000) for v in range(2, 9)]  # 7 young 1 MB runs
    fold, keep = _tiered_fold(base + runs, delta_bytes=1_000_000,
                              k_new=1, compact_runs=8)
    assert keep == base  # 200 MB >= 4 x 8 MB: base survives
    assert fold == runs  # every young run folds

    # young data within ratio of the base -> full fold
    big_runs = [rec(v, 0, 40_000_000) for v in range(2, 9)]
    fold2, keep2 = _tiered_fold(base + big_runs, delta_bytes=1_000_000,
                                k_new=1, compact_runs=8)
    assert keep2 == [] and len(fold2) == 9

    # run-count budget: an 8-file base + k_new=1 cannot be kept at
    # compact_runs=8 even though it dominates by size
    wide_base = [rec(1, s, 100_000_000) for s in range(8)]
    fold3, keep3 = _tiered_fold(wide_base + runs, delta_bytes=1_000_000,
                                k_new=1, compact_runs=8)
    assert keep3 == [] and len(fold3) == 15


def test_append_auto_compaction_is_tiered(ray_session, tmp_path):
    """Integration: drive a shard past ``compact_runs`` with small
    append commits on top of a big base. The fold commit must (a) keep
    the base file untouched on disk (same manifest path — the O(shard)
    rewrite is gone), (b) bring the run count back under the budget,
    (c) stay oracle-equal."""
    import json as _json

    from etl_geodata_pipeline_ray.cdc import manifest as mf
    from etl_geodata_pipeline_ray.cdc.generator import write_wal_parallel

    import shutil

    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    combined = tmp_path / "combined"
    combined.mkdir()
    # chunk 0-2 are the big base tier; later waves are small deltas
    spec = WalSpec(n_convs=2400, seed=31, dup_rate=0.05, seg_size=100_000)
    paths = write_wal_parallel(spec, wal, chunk_convs=800, task_cpus=1)
    for p in paths:
        shutil.copy(p, combined / p.name)
    base_paths = paths  # 3 chunks of 300 convs
    small = WalSpec(n_convs=30, seed=77, dup_rate=0.05, seg_size=100_000)
    # replay the base first (single big tier)
    st = replay(wal, lake, num_shards=1, mode="append", compact_runs=6)
    assert st["committed_segments"] == len(base_paths)
    base_files = {
        f["path"] for f in mf.read_all_manifests(lake)[0]["files"]
    }

    n_folds = 0
    for w in range(8):  # 8 small commits: budget of 6 must fold twice
        for p in paths:
            if p.exists():
                p.unlink()
        paths = write_wal_parallel(
            small, wal, chunk_convs=30, chunk_base=100 + w, task_cpus=1
        )
        for p in paths:
            shutil.copy(p, combined / p.name)
        st = replay(wal, lake, num_shards=1, mode="append", compact_runs=6)
        assert st["committed_segments"] == len(paths)
        m = mf.read_all_manifests(lake)[0]
        assert len(m["files"]) <= 6
        if st.get("shards_auto_compacted"):
            n_folds += 1
            # the dominant base tier survived the fold untouched
            assert base_files <= {f["path"] for f in m["files"]}, (
                "tiered fold rewrote the base"
            )
    assert n_folds >= 1
    assert lake_final_table(lake).equals(oracle_final_state(combined))


def test_legacy_manifest_bookkeeping_still_counts(ray_session, tmp_path):
    """Mixed-lake back-compat: a lake whose committed segments were
    recorded the pre-round-4 way (full list in EVERY shard manifest,
    range-only log records) must keep those segments committed when a
    current-protocol replay continues the stream — new segments land
    via the log, old ones are never re-replayed."""
    import json as _json

    spec = SCENARIOS["everything"]
    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    segs = write_wal(spec, wal, overwrite=True)
    half = len(segs) // 2
    replay(wal, lake, num_shards=2, max_segments=half)

    # legacy-ify the metadata: move the committed list into every
    # shard manifest, strip the segments key from the log records
    names = sorted(p.name for p in segs[:half])
    for sh in range(2):
        mp = lake / "_manifests" / f"shard-{sh:05d}.json"
        m = _json.loads(mp.read_text())
        m["committed_segments"] = names
        mp.write_text(_json.dumps(m))
    log = lake / "_manifests" / "_commits.jsonl"
    recs = [_json.loads(x) for x in log.read_text().splitlines() if x.strip()]
    for r in recs:
        r.pop("segments", None)
    log.write_text("".join(_json.dumps(r) + "\n" for r in recs))

    st = replay(wal, lake, num_shards=2)
    assert st["committed_segments"] == len(segs) - half  # legacy half skipped
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_manifest_metadata_stays_bounded(ray_session, tmp_path):
    """Commit metadata must be O(current state), not O(history): after
    many commits a shard manifest carries no committed-segment list
    and only the LAST commit's lineage entries — the full history
    lives in the append-only commit log (one record per commit)."""
    import json as _json

    spec = SCENARIOS["everything"]
    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    segs = write_wal(spec, wal, overwrite=True)
    assert len(segs) >= 4
    for i in range(1, len(segs) + 1):  # one commit per segment
        replay(wal, lake, num_shards=2, mode="append", max_segments=i)

    m = _json.loads((lake / "_manifests" / "shard-00000.json").read_text())
    assert "committed_segments" not in m
    assert {e["commit"] for e in m["lineage"]} == {m["commit"]}
    from etl_geodata_pipeline_ray.cdc.replay import commit_log

    log = commit_log(lake)
    assert sum(r["n_segments"] for r in log) == len(segs)
    assert sorted(n for r in log for n in r["segments"]) == sorted(
        p.name for p in segs
    )


def test_lease_acquire_never_unburns_higher_epochs(tmp_path):
    """A contender that stalled between its scan and its O_EXCL create
    may claim an epoch BELOW one that meanwhile went live. It must (a)
    never unlink the higher (live) epoch file — un-burning epochs
    would let two holders coexist — and (b) detect the supersession at
    acquire time and fail."""
    import json as _json

    from etl_geodata_pipeline_ray.cdc import manifest as mf

    lake = tmp_path / "lake"
    (lake / mf.MANIFEST_DIR).mkdir(parents=True)
    live = lake / mf.MANIFEST_DIR / "_lease-0000000006.json"
    live.write_text(_json.dumps({
        "epoch": 6, "holder": "successor", "pid": 1,
        "heartbeat_ts": __import__("time").time(), "ttl_s": 300,
    }))

    lk = mf.LeaseLock(lake, ttl_s=30, auto_heartbeat=False)
    real_scan, calls = lk._scan, []

    def stale_then_real():
        if not calls:  # the stale pre-create scan: an expired epoch 4
            calls.append(1)
            return 4, {"heartbeat_ts": 0, "ttl_s": 30}
        return real_scan()

    lk._scan = stale_then_real
    import pytest as _pytest

    with _pytest.raises(mf.LakeLockedError, match="superseded"):
        lk.__enter__()
    assert live.exists(), "acquire GC unlinked a HIGHER live epoch"
    assert lk.epoch is None


def test_lease_mid_acquire_empty_file_reads_live(tmp_path):
    """The O_EXCL create and the record write are two steps; a
    contender scanning in between sees an empty newest lease and must
    treat it as a live holder (mtime-fresh), not an expired one."""
    import pytest as _pytest

    from etl_geodata_pipeline_ray.cdc import manifest as mf

    lake = tmp_path / "lake"
    (lake / mf.MANIFEST_DIR).mkdir(parents=True)
    (lake / mf.MANIFEST_DIR / "_lease-0000000003.json").write_text("")
    with _pytest.raises(mf.LakeLockedError, match="held by"):
        mf.LeaseLock(lake, ttl_s=60, auto_heartbeat=False).__enter__()


def test_wave_cache_refuses_stale_wave(ray_session, tmp_path):
    """write_wal_parallel's resume cache must belong to the REQUESTED
    wave: leftovers from a previous wave raise instead of being
    silently returned (which would skip generating the new slice)."""
    import pytest as _pytest

    from etl_geodata_pipeline_ray.cdc.generator import write_wal_parallel

    spec = WalSpec(n_convs=200, seed=5, seg_size=2_000)
    wal = tmp_path / "wal"
    p0 = write_wal_parallel(spec, wal, chunk_convs=100, chunk_base=0, task_cpus=1)
    # same wave again -> legit resume, same paths
    again = write_wal_parallel(spec, wal, chunk_convs=100, chunk_base=0, task_cpus=1)
    assert again == sorted(p0)
    # next wave with the old segments still on disk -> refuse loudly
    with _pytest.raises(ValueError, match="outside this call's range"):
        write_wal_parallel(spec, wal, chunk_convs=100, chunk_base=2, task_cpus=1)
    for p in p0:
        p.unlink()
    p1 = write_wal_parallel(spec, wal, chunk_convs=100, chunk_base=2, task_cpus=1)
    assert p1 and not (set(p1) & set(p0))


def test_empty_salt_bucket_writes_typed_file(ray_session, tmp_path):
    """A salted hot shard whose OTHER salt buckets hold no rows (one
    giant conversation: every row hashes to one bucket) must still
    write typed parquet for the empty buckets — an empty pyarrow Table
    is FALSY, and an `or`-fallback once replaced it with a zero-column
    table whose schema-less file poisoned every later reader."""
    import pyarrow as pa

    from etl_geodata_pipeline_ray.cdc.schema import EVENT_SCHEMA
    from etl_geodata_pipeline_ray.cdc.validate import validate_lake

    wal = tmp_path / "wal"
    wal.mkdir()
    n = 4000
    rows = {
        "op": ["I"] * n,
        "op_seq": list(range(n)),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       pa.timestamp("us")),
        "conv_id": ["conv_hot"] * n,  # ONE conversation: one salt bucket
        "turn_idx": pa.array(list(range(n)), pa.int32()),
        "role": ["user"] * n,
        "text": pa.array([f"t{i}" * 20 for i in range(n)], pa.large_string()),
        "tool": [None] * n,
    }
    pq.write_table(pa.table(rows, schema=EVENT_SCHEMA),
                   wal / "seg-000000000000.parquet")
    lake = tmp_path / "lake"
    st = replay(wal, lake, num_shards=2, salt_threshold=50_000)
    assert st["salted_shards"] >= 1, "salting must engage for this test"
    v = validate_lake(lake)
    assert v["ok"], v["violations"]
    assert lake_final_table(lake).num_rows == n
    # every committed file (including empty salt buckets) carries the
    # full event schema
    import json as _json

    from etl_geodata_pipeline_ray.cdc import manifest as mf

    for m in mf.read_all_manifests(lake).values():
        for f in m["files"]:
            sch = pq.read_schema(lake / f["path"])
            assert set(EVENT_SCHEMA.names) <= set(sch.names), f["path"]


def test_concurrent_upserts_interleave_safely(ray_session, tmp_path):
    """Two upserts racing the same lake must interleave distinct
    segment names (exclusive-link publication) and both commit — no
    clobbered rows, even when their base offsets collide."""
    import threading

    import pyarrow as pa
    import ray.data

    from etl_geodata_pipeline_ray.cdc import manifest as mf
    from etl_geodata_pipeline_ray.cdc.ingest import upsert_dataset

    lake = tmp_path / "lake"

    def rows(tag, n=500):
        return ray.data.from_arrow(pa.table({
            "conv_id": [f"{tag}{i:04d}" for i in range(n)],
            "turn_idx": pa.array([0] * n, pa.int32()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                           pa.timestamp("us")),
            "text": pa.array([tag] * n, pa.large_string()),
        }))

    # the package-level fsspec shim makes Ray's per-write import probe
    # thread-deterministic (two threads racing a FAILING lazy import
    # used to kill one with an uncaught ImportError); this test also
    # exercises that shim
    errs = []

    def work(tag):
        for _ in range(200):
            try:
                upsert_dataset(rows(tag), lake, num_shards=2)
                return
            except mf.LakeLockedError:
                import time

                time.sleep(0.05)
            except Exception as e:  # loud, not a silent dead thread
                errs.append(f"{tag}: {type(e).__name__}: {e}")
                return
        errs.append(f"{tag}: never acquired the lock")

    ts = [threading.Thread(target=work, args=(t,)) for t in ("aa", "bb")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    # one upsert's replay may commit the other's published segments
    # first — a follow-up commit of anything left, then both tags
    # must be fully present
    upsert_dataset(rows("cc", n=1), lake, num_shards=2)
    t = lake_final_table(lake).to_pandas()
    counts = t["text"].value_counts()
    assert counts.get("aa", 0) == 500 and counts.get("bb", 0) == 500, counts
