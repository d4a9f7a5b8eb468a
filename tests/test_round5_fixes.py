"""Round-5 ADVICE regression tests: pre-log-era time travel, fenced
GC, deterministic same-ts upsert ties, spec substitution, negative
turn_idx key packing."""

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from etl_geodata_pipeline_ray.cdc import manifest as mf
from etl_geodata_pipeline_ray.cdc.replay import (
    _append_commit_log,
    _diff_states,
    _fenced_gc,
    _snapshot_manifests,
)
from etl_geodata_pipeline_ray.cdc.schema import EVENT_SCHEMA


def _log(lake, commit_id, segments):
    (lake / mf.MANIFEST_DIR).mkdir(parents=True, exist_ok=True)
    _append_commit_log(lake, commit_id, segments)


def _shard_manifest(lake, shard, commit, files, first_commit, history=()):
    m = {
        "shard": shard,
        "version": 1,
        "salt_k": 1,
        "commit": commit,
        "first_commit": first_commit,
        "history": list(history),
        "files": files,
        "rows": sum(f["rows"] for f in files),
        "bytes": 0,
    }
    mf.atomic_write_json(m, mf.manifest_path(lake, shard))
    return m


def test_snapshot_manifests_pre_log_era_served(tmp_path):
    """A manifest entry with NO commit id (written by pre-commit-log
    code) ranks OLDEST: legacy shards must keep serving their data at
    every time-travel point, never silently read as empty (round-4
    ADVICE, medium)."""
    lake = tmp_path / "lake"
    _log(lake, "c_logged", ["seg-000000000000.parquet"])
    f = [{"salt": 0, "path": "shard=00000/x.parquet", "rows": 5, "bytes": 1}]
    _shard_manifest(lake, 0, None, f, None)  # pure pre-log manifest
    manifests = mf.read_all_manifests(lake)
    snap = _snapshot_manifests(lake, manifests, "c_logged")
    assert 0 in snap and snap[0]["files"] == f


def test_snapshot_manifests_torn_head_falls_back_to_history(tmp_path):
    """An unlogged STRING id is still a torn write: excluded, resolve
    to the logged history entry instead."""
    lake = tmp_path / "lake"
    _log(lake, "c1", ["seg-000000000000.parquet"])
    old = [{"salt": 0, "path": "shard=00000/old.parquet", "rows": 3, "bytes": 1}]
    new = [{"salt": 0, "path": "shard=00000/new.parquet", "rows": 9, "bytes": 1}]
    hist = [{"version": 1, "salt_k": 1, "commit": "c1", "files": old}]
    _shard_manifest(lake, 0, "torn_unlogged", new, "c1", history=hist)
    snap = _snapshot_manifests(lake, mf.read_all_manifests(lake), "c1")
    assert snap[0]["files"] == old


def test_snapshot_manifests_corrupt_mixed_era_raises(tmp_path):
    """All entries unlogged AND no first_commit: a shard with data
    files that resolves nowhere must raise, not read as empty."""
    lake = tmp_path / "lake"
    _log(lake, "c1", [])
    f = [{"salt": 0, "path": "shard=00000/x.parquet", "rows": 5, "bytes": 1}]
    _shard_manifest(lake, 0, "unlogged_id", f, None)
    with pytest.raises(ValueError, match="mixed-era|refusing"):
        _snapshot_manifests(lake, mf.read_all_manifests(lake), "c1")


def test_fenced_gc_skips_on_lost_lease(tmp_path):
    """A zombie whose lease lapsed between its commit and GC must NOT
    unlink anything — its manifest view may be stale and the files a
    successor just committed would read as orphans (round-4 ADVICE)."""
    lake = tmp_path / "lake"
    sh = lake / "shard=00000"
    sh.mkdir(parents=True)
    orphan = sh / "orphan.parquet"
    orphan.write_bytes(b"x")

    def dead_fence():
        raise mf.LeaseFencedError("lease lost")

    with pytest.warns(UserWarning, match="skipping GC"):
        assert _fenced_gc(lake, {}, dead_fence) == 0
    assert orphan.exists()
    # live fence (or none): GC proceeds as before
    assert _fenced_gc(lake, {}, None) == 1
    assert not orphan.exists()


def test_upsert_same_ts_tie_later_call_wins(ray_session, tmp_path):
    """Two upserts to the same key at the SAME ts: the later-published
    call must deterministically win the LWW tie (auto op_seq = claimed
    base offset; claim→stage→publish serialized per stream)."""
    from etl_geodata_pipeline_ray.cdc.ingest import upsert_dataset
    from etl_geodata_pipeline_ray.cdc.replay import lake_final_table

    lake = tmp_path / "lake"
    ts = pa.array([1_700_000_000_000_000], pa.timestamp("us"))

    def one(text):
        return ray.data.from_arrow(pa.table({
            "conv_id": ["k"], "turn_idx": pa.array([0], pa.int32()),
            "ts": ts, "text": pa.array([text], pa.large_string()),
        }))

    upsert_dataset(one("first"), lake, num_shards=4)
    upsert_dataset(one("second"), lake, num_shards=4)
    t = lake_final_table(lake)
    assert t.num_rows == 1 and t["text"][0].as_py() == "second"
    # the second slice's auto op_seq must exceed the first's (distinct
    # claimed bases), which is what makes the tie deterministic
    import pyarrow.parquet as pq

    segs = sorted((lake / "_ingest").glob("seg-*.parquet"))
    seqs = [pq.read_table(s, columns=["op_seq"])["op_seq"][0].as_py()
            for s in segs]
    assert len(segs) == 2 and seqs[1] > seqs[0]


def test_zone_map_shard_skipping(ray_session, tmp_path):
    """Round-5 #1: manifest zone maps prune shards/files for single-
    column payload predicates. (a) pruned result == unpruned semantics
    on BOTH lake layouts; (b) the plan counter proves shards/files were
    actually skipped; (c) a multi-value / negated predicate stays
    correct; (d) surviving shards never lose files (LWW-merge safety)."""
    import pyarrow.dataset as pads

    from etl_geodata_pipeline_ray.cdc.ingest import upsert_dataset
    from etl_geodata_pipeline_ray.cdc.replay import read_lake

    def slab(convs, role, tag):
        rows = [(c, t, role, f"{tag}-{c}-{t}") for c in convs for t in range(4)]
        return ray.data.from_arrow(pa.table({
            "conv_id": [r[0] for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(len(rows))],
                           pa.timestamp("us")),
            "role": [r[2] for r in rows],
            "text": pa.array([r[3] for r in rows], pa.large_string()),
        }))

    herd = [f"conv{i}" for i in range(40)]
    lsm = tmp_path / "lsm"
    upsert_dataset(slab(herd, "user", "a"), lsm, num_shards=16, mode="append")
    upsert_dataset(slab(["needle"], "tool", "b"), lsm, num_shards=16,
                   mode="append")
    upsert_dataset(slab(herd[:5], "assistant", "c"), lsm, num_shards=16,
                   mode="append")

    pred = pads.field("role") == "tool"
    full = read_lake(lsm).to_pandas()
    want = full[full["role"] == "tool"].sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(want) == 4

    info = {}
    got = read_lake(lsm, predicate=pred, plan_info=info).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    assert info["shards_total"] >= 14  # shards holding files
    assert 0 < info["shards_skipped"] < info["shards_total"]

    # (c) is_in + inverted predicates run through the same exact-set
    # probe; a predicate matching nothing skips everything
    info2 = {}
    none = read_lake(
        lsm, predicate=pads.field("role") == "ghost", plan_info=info2
    )
    assert none.count() == 0
    assert info2["shards_skipped"] == info2["shards_total"] > 0
    info3 = {}
    inv = read_lake(
        lsm, predicate=~pads.field("role").isin(["user", "assistant"]),
        plan_info=info3,
    ).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(inv[want.columns.tolist()], want)
    assert info3["shards_skipped"] > 0

    # compacted layout: per-file pruning, same result
    from etl_geodata_pipeline_ray.cdc.replay import compact

    compact(lsm)
    info4 = {}
    got_c = read_lake(lsm, predicate=pred, plan_info=info4).to_pandas()
    got_c = got_c.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_c[want.columns.tolist()], want)
    assert info4["files_skipped"] > 0

    # (d) zones never skip when the predicate references >1 column or
    # a non-zoned column — plan shows zero skips, result unchanged
    info5 = {}
    both = read_lake(
        lsm,
        predicate=(pads.field("role") == "tool") & (pads.field("turn_idx") >= 0),
        plan_info=info5,
    ).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(both[want.columns.tolist()], want)
    assert info5.get("files_skipped", 0) == 0


def test_zone_map_lww_supersede_not_skipped(ray_session, tmp_path):
    """A shard whose only 'tool' revision was SUPERSEDED by a newer
    non-matching revision must still be scanned (zones are per stored
    file) and must return nothing — pruning is sound, not lossy."""
    import pyarrow.dataset as pads

    from etl_geodata_pipeline_ray.cdc.ingest import upsert_dataset
    from etl_geodata_pipeline_ray.cdc.replay import read_lake

    def one(role, ts_off, text):
        return ray.data.from_arrow(pa.table({
            "conv_id": ["k"], "turn_idx": pa.array([0], pa.int32()),
            "ts": pa.array([1_700_000_000_000_000 + ts_off], pa.timestamp("us")),
            "role": [role], "text": pa.array([text], pa.large_string()),
        }))

    lake = tmp_path / "lake"
    upsert_dataset(one("tool", 0, "old"), lake, num_shards=4, mode="append")
    upsert_dataset(one("user", 1, "new"), lake, num_shards=4, mode="append")
    info = {}
    got = read_lake(
        lake, predicate=pads.field("role") == "tool", plan_info=info
    ).to_pandas()
    # the old 'tool' revision is in a stored file → shard NOT skipped;
    # post-merge the key is role='user' → empty result
    assert len(got) == 0
    assert info["shards_skipped"] == info["shards_total"] - 1


def test_read_lake_ts_range_time_slice(ray_session, tmp_path):
    """ts_range: (a) selects rows whose MERGED revision is stamped in
    the window — an in-window stale revision superseded by an
    out-of-window newer one is absent; (b) per-file ts [min,max] zones
    skip out-of-window shards on multi-run lakes; (c) equality with a
    post-hoc pandas filter on both layouts."""
    from etl_geodata_pipeline_ray.cdc.ingest import upsert_dataset
    from etl_geodata_pipeline_ray.cdc.replay import compact, read_lake

    BASE = 1_700_000_000_000_000
    LATER = BASE + 10**9

    def slab(convs, ts0, tag):
        rows = [(c, t) for c in convs for t in range(4)]
        return ray.data.from_arrow(pa.table({
            "conv_id": [r[0] for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([ts0 + i for i in range(len(rows))],
                           pa.timestamp("us")),
            "text": pa.array([f"{tag}-{r[0]}-{r[1]}" for r in rows],
                             pa.large_string()),
        }))

    herd = [f"conv{i}" for i in range(40)]
    lake = tmp_path / "lake"
    upsert_dataset(slab(herd, BASE, "old"), lake, num_shards=16, mode="append")
    upsert_dataset(slab(["needle"], LATER, "new"), lake, num_shards=16,
                   mode="append")
    # conv0 additionally gets a revision far beyond the window's
    # upper bound (its older revisions are below the lower bound)
    upsert_dataset(slab(["conv0"], LATER + 10**9, "latest"), lake,
                   num_shards=16, mode="append")

    info = {}
    got = read_lake(
        lake, ts_range=(LATER - 1, LATER + 10**8), plan_info=info
    ).to_pandas()
    # only the needle slab's merged revisions are stamped in-window
    assert set(got["conv_id"]) == {"needle"} and len(got) == 4
    assert info["shards_skipped"] > 0

    # (a) supersede: give conv1 an IN-window stale revision and an
    # out-of-window newer one; the merged row must be excluded
    upsert_dataset(slab(["conv1"], LATER, "stale_in_window"), lake,
                   num_shards=16, mode="append")
    upsert_dataset(slab(["conv1"], LATER + 10**9, "newer_outside"), lake,
                   num_shards=16, mode="append")
    got2 = read_lake(lake, ts_range=(LATER - 1, LATER + 10**8)).to_pandas()
    assert set(got2["conv_id"]) == {"needle"}

    # (c) parity with a pandas filter on full reads, both layouts
    import pandas as pd

    def slice_df(df):
        ts_lo = pd.Timestamp(LATER - 1, unit="us")
        ts_hi = pd.Timestamp(LATER + 10**8, unit="us")
        return (
            df[(df["ts"] >= ts_lo) & (df["ts"] <= ts_hi)]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )

    want = slice_df(read_lake(lake).to_pandas())
    for layout in ("multi", "compacted"):
        if layout == "compacted":
            compact(lake)
        got3 = (
            read_lake(lake, ts_range=(LATER - 1, LATER + 10**8))
            .to_pandas().sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got3[want.columns.tolist()], want)

    # columns= projection without ts still works (ts auto-added to the
    # scan, dropped from the output)
    t = read_lake(
        lake, columns=["text"], ts_range=(LATER - 1, LATER + 10**8)
    ).to_pandas()
    assert list(t.columns) == ["text"] and len(t) == 4

    # an EMPTY slice (quiet window — the routine outcome) must present
    # the same Dataset schema as a non-empty one, projection included.
    # (Checked at ds.schema() level: Ray 2.49's to_pandas() drops
    # columns on ANY zero-row dataset, computed-empty ones included.)
    future = (LATER + 10**12, None)
    e = read_lake(lake, columns=["text"], ts_range=future)
    assert e.schema().names == ["text"] and e.count() == 0
    e2 = read_lake(lake, ts_range=future)
    assert "conv_id" in e2.schema().names and e2.count() == 0
    e3 = read_lake(lake, include_tombstones=True, ts_range=future)
    assert "op" in e3.schema().names


def test_read_lake_tool_projection_predicate_parity(ray_session, tmp_path):
    """Round-5 #8: projecting the late-added `tool` column while
    filtering on a NON-projected column must behave identically on
    compacted and multi-run lakes (the last documented layout
    asymmetry — the compacted subset schema used to reject it)."""
    import pyarrow.dataset as pads

    from etl_geodata_pipeline_ray.cdc.ingest import upsert_dataset
    from etl_geodata_pipeline_ray.cdc.replay import compact, read_lake

    def slab(tag):
        rows = [(f"c{i}", t) for i in range(12) for t in range(6)]
        return ray.data.from_arrow(pa.table({
            "conv_id": [r[0] for r in rows],
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(len(rows))],
                           pa.timestamp("us")),
            "tool": [f"{tag}{r[1]}" for r in rows],
            "text": pa.array([f"{tag}-{r[0]}-{r[1]}" for r in rows],
                             pa.large_string()),
        }))

    multi = tmp_path / "multi"
    upsert_dataset(slab("x"), multi, num_shards=4, mode="append")
    upsert_dataset(slab("y"), multi, num_shards=4, mode="append")
    compacted = tmp_path / "compacted"
    upsert_dataset(slab("x"), compacted, num_shards=4, mode="append")
    upsert_dataset(slab("y"), compacted, num_shards=4, mode="append")
    compact(compacted)

    pred = pads.field("turn_idx") >= 4  # NOT projected below
    outs = []
    for lk in (multi, compacted):
        t = read_lake(lk, columns=["tool"], predicate=pred).to_pandas()
        assert list(t.columns) == ["tool"]
        outs.append(t["tool"].sort_values().reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_series_equal(outs[0], outs[1])
    assert len(outs[0]) == 12 * 2 and set(outs[0]) == {"y4", "y5"}


def test_train_centroids_distributed_million_vectors(ray_session):
    """Round-5 #2: IVF centroid training is distributed — 10^6 vectors
    train without the vectors ever materializing on the driver (only
    k×dim partial folds + a k-bounded seed sample), and the recovered
    centroids align with the planted cluster directions."""
    import tracemalloc

    from etl_geodata_pipeline_ray.stages.similarity import train_centroids

    DIM, K, N = 16, 4, 1_000_000

    def gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy()
        cl = ids % K
        rng = np.random.default_rng(int(ids[0]) + 1)
        base = np.eye(K, DIM)[cl] * 5.0
        emb = base + rng.normal(0, 0.3, (len(ids), DIM))
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), type=pa.float64()), DIM
            ),
        })

    ds = ray.data.range(N).map_batches(gen, batch_format="pyarrow")
    tracemalloc.start()
    tracemalloc.reset_peak()
    C = train_centroids(
        ds, n_centroids=K, sample_fraction=1.0, dim=DIM, iters=6,
        max_train_rows=N,
    )
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # 10^6 × 16 float64 = 128 MB of vectors; the driver's Python heap
    # must stay an order of magnitude below that (partials + seed only)
    assert peak < 60 * 1024 * 1024, f"driver materialized: peak={peak/1e6:.0f}MB"
    assert C.shape == (K, DIM)
    truth = np.eye(K, DIM)
    cos = truth @ C.T  # unit rows both sides
    assert (cos.max(axis=1) > 0.9).all(), cos.max(axis=1)


def test_table_stats_high_cardinality_bounded_path(ray_session):
    """Round-5 #5: q19's distinct fold escapes to a distributed dedup
    shuffle when a block's distinct-key set exceeds the cap — exact
    answer either way, driver fold provably bounded."""
    from etl_geodata_pipeline_ray.pipelines.queries import _table_stats

    n = 10_000
    ts = np.datetime64("2026-01-01", "us") + np.arange(n).astype("timedelta64[s]")
    adversarial = ray.data.from_arrow(pa.table({
        "l_suppkey": pa.array(np.arange(n), type=pa.int64()),  # all distinct
        "l_shipdate": pa.array(ts),
        "l_extendedprice": pa.array(np.ones(n)),
    }))
    info = {}
    out = _table_stats(adversarial, supp_cap=100, plan_info=info)
    assert info["distinct_path"] == "distributed"
    assert out["n_suppliers"].iloc[0] == n and out["n_rows"].iloc[0] == n

    tame = ray.data.from_arrow(pa.table({
        "l_suppkey": pa.array(np.arange(n) % 50, type=pa.int64()),
        "l_shipdate": pa.array(ts),
        "l_extendedprice": pa.array(np.ones(n)),
    }))
    info2 = {}
    out2 = _table_stats(tame, supp_cap=100, plan_info=info2)
    assert info2["distinct_path"] == "driver_fold"
    assert out2["n_suppliers"].iloc[0] == 50


def test_train_centroids_sorted_input_seed_diversity(ray_session):
    """Seeds are strided across ALL batches: on input sorted by
    cluster (contiguous blocks, the read_lake-ordered shape) the seed
    pool must still span every cluster — a head-limit draw would
    initialize every centroid inside cluster 0 and merge true
    clusters."""
    from etl_geodata_pipeline_ray.stages.similarity import train_centroids

    DIM, K, N = 16, 4, 40_000

    def gen(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy()
        cl = ids // (N // K)  # CONTIGUOUS cluster blocks, sorted input
        rng = np.random.default_rng(int(ids[0]) + 1)
        emb = np.eye(K, DIM)[np.minimum(cl, K - 1)] * 5.0
        emb = emb + rng.normal(0, 0.2, (len(ids), DIM))
        return pa.table({
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), type=pa.float64()), DIM
            ),
        })

    ds = ray.data.range(N).map_batches(gen, batch_format="pyarrow")
    C = train_centroids(
        ds, n_centroids=K, sample_fraction=1.0, dim=DIM, iters=8,
        max_train_rows=N,
    )
    cos = np.eye(K, DIM) @ C.T
    assert (cos.max(axis=1) > 0.9).all(), cos.max(axis=1)


def test_concurrent_upserts_two_processes_tie_is_publication_ordered(
    ray_session, tmp_path
):
    """Two REAL OS processes race upsert_dataset on one lake with the
    same key at the same ts: the stream flock must hand them distinct
    base offsets, and the LWW tie must resolve to whichever PUBLISHED
    later (higher segment offset) — never arbitrarily. A loser of the
    lake-lock race at the replay step is fine (its segments are
    published; a later replay commits them)."""
    import subprocess
    import sys
    import textwrap

    lake = tmp_path / "lake"

    def script(text):
        return textwrap.dedent(f"""
            import sys, logging; sys.path.insert(0, "/root/repo")
            import ray, pyarrow as pa
            ray.init(address="local", num_cpus=2, include_dashboard=False,
                     logging_level=logging.ERROR)
            from ray.data import DataContext
            DataContext.get_current().enable_progress_bars = False
            from etl_geodata_pipeline_ray.cdc.ingest import upsert_dataset
            from etl_geodata_pipeline_ray.cdc.manifest import LakeLockedError
            ds = ray.data.from_arrow(pa.table({{
                "conv_id": ["k"], "turn_idx": pa.array([0], pa.int32()),
                "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
                "text": pa.array(["{text}"], pa.large_string()),
            }}))
            try:
                upsert_dataset(ds, r"{lake}", num_shards=4, mode="append")
            except LakeLockedError:
                print("LOCK_RACE_LOST")  # segments published; commit later
            ray.shutdown()
        """)

    procs = [
        subprocess.Popen([sys.executable, "-c", script(t)],
                         cwd="/root/repo", stdout=subprocess.PIPE, text=True)
        for t in ("alpha", "beta")
    ]
    outs = [p.communicate()[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    # finish any lock-race loser's published-but-uncommitted segments,
    # then check: distinct offsets, winner = higher-offset publisher
    import pyarrow.parquet as pq

    from etl_geodata_pipeline_ray.cdc.replay import lake_final_table, replay

    replay(lake / "_ingest", lake, num_shards=4, mode="append")
    segs = sorted((lake / "_ingest").glob("seg-*.parquet"))
    assert len(segs) == 2, segs
    by_offset = {
        int(s.name.split("-")[1].split(".")[0]):
            pq.read_table(s, columns=["text", "op_seq"])
        for s in segs
    }
    offs = sorted(by_offset)
    assert offs[0] != offs[1]
    seqs = [by_offset[o]["op_seq"][0].as_py() for o in offs]
    assert seqs[0] < seqs[1], "bases must be distinct and offset-ordered"
    winner_text = by_offset[offs[1]]["text"][0].as_py()
    t = lake_final_table(lake)
    assert t.num_rows == 1 and t["text"][0].as_py() == winner_text


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_zone_ts_range_fuzz_vs_pandas_oracle(ray_session, tmp_path, seed):
    """Property fuzz for the round-5 read surface: random upsert
    batches (updates + deletes, overlapping ts, explicit op_seq), then
    random role predicates and ts windows — read_lake's pruned plans
    must match an independent pandas LWW oracle on both layouts."""
    import pandas as pd
    import pyarrow.dataset as pads

    from etl_geodata_pipeline_ray.cdc.ingest import upsert_dataset
    from etl_geodata_pipeline_ray.cdc.replay import compact, read_lake

    rng = np.random.default_rng(seed)
    lake = tmp_path / "lake"
    BASE = 1_700_000_000_000_000
    frames, op_base = [], 0
    for b in range(4):
        n = int(rng.integers(30, 120))
        df = pd.DataFrame({
            "conv_id": [f"c{int(x)}" for x in rng.integers(0, 25, n)],
            "turn_idx": rng.integers(0, 6, n).astype("int32"),
            "ts": BASE + rng.integers(0, 10**7, n),
            "op": rng.choice(["U", "U", "U", "D"], n),
            "op_seq": np.arange(op_base, op_base + n, dtype=np.int64),
            "role": rng.choice(["user", "assistant", "tool", "system"], n),
            "text": [f"t{b}-{i}" for i in range(n)],
        })
        op_base += n
        tbl = pa.table({
            "conv_id": df["conv_id"],
            "turn_idx": pa.array(df["turn_idx"], pa.int32()),
            "ts": pa.array(df["ts"], pa.timestamp("us")),
            "op": df["op"],
            "op_seq": pa.array(df["op_seq"], pa.int64()),
            "role": df["role"],
            "text": pa.array(df["text"], pa.large_string()),
        })
        upsert_dataset(ray.data.from_arrow(tbl), lake, num_shards=8,
                       mode="append")
        frames.append(df)

    full = pd.concat(frames, ignore_index=True)
    merged = (
        full.sort_values(["ts", "op_seq"], kind="stable")
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .tail(1)
    )
    live = merged[merged["op"] != "D"].copy()
    live["ts"] = pd.to_datetime(live["ts"], unit="us")

    def check(layout):
        for _ in range(5):
            kind = rng.choice(["role_eq", "role_isin", "ts_win", "both"])
            role = str(rng.choice(["user", "assistant", "tool", "ghost"]))
            lo = BASE + int(rng.integers(0, 10**7))
            hi = lo + int(rng.integers(10**5, 5 * 10**6))
            pred, tsr = None, None
            want = live
            if kind in ("role_eq", "both"):
                pred = pads.field("role") == role
                want = want[want["role"] == role]
            elif kind == "role_isin":
                pred = pads.field("role").isin([role, "system"])
                want = want[want["role"].isin([role, "system"])]
            if kind in ("ts_win", "both"):
                tsr = (lo, hi)
                want = want[
                    (want["ts"] >= pd.Timestamp(lo, unit="us"))
                    & (want["ts"] <= pd.Timestamp(hi, unit="us"))
                ]
            got = read_lake(lake, predicate=pred, ts_range=tsr)
            got_df = got.to_pandas()
            key = ["conv_id", "turn_idx"]
            want_s = want.sort_values(key).reset_index(drop=True)
            assert len(got_df) == len(want_s), (layout, kind, role)
            if len(got_df):
                got_s = got_df.sort_values(key).reset_index(drop=True)
                for col in ("conv_id", "turn_idx", "role", "text", "ts"):
                    assert (
                        got_s[col].tolist() == want_s[col].tolist()
                    ), (layout, kind, col)

    check("multi-run")
    compact(lake)
    check("compacted")


def test_text_kernels_null_and_unicode_hardening(ray_session):
    """Fresh-eyes review batch: null text must not crash or misscore;
    non-ASCII letters are not punctuation; empty docs score 0 not NaN;
    NaN never enters the quantile sketch; null ts joins no window."""
    import math

    from etl_geodata_pipeline_ray.stages.text import (
        Fingerprinter,
        LangId,
        QualityScorer,
    )

    t = pa.table({
        "text": pa.array(
            ["привет мир", "héllo wörld", "", None, "the cat and the hat"],
            pa.large_string(),
        )
    })
    q = QualityScorer()(t).to_pandas()
    # Cyrillic letters are NOT punctuation (old ASCII \w scored 0.9)
    assert q["punct_ratio"][0] == 0.0 and q["punct_ratio"][1] == 0.0
    assert q["punct_ratio"][2] == 0.0 and not math.isnan(q["punct_ratio"][2])

    lid = LangId()(t.to_pandas())
    assert lid["lang_pred"][3] == "und" and lid["lang_score"][3] == 0.0
    assert lid["lang_pred"][4] == "en"

    fp = Fingerprinter()(t.to_pandas())  # must not raise on the None row
    assert fp["fingerprint"].notna().all()
    # null fingerprints as the EMPTY document, deterministically
    assert fp["fingerprint"][3] == fp["fingerprint"][2] if t["text"][2].as_py() == "" else True

    # quantile sketch ignores NaN/null
    from ray.data.block import BlockAccessor  # noqa: F401  (sketch dep)

    from etl_geodata_pipeline_ray.stages.sketches import (
        binned_quantile_aggregate,
    )

    ds = ray.data.from_arrow(pa.table({
        "g": ["a"] * 4,
        "v": pa.array([None, float("nan"), 5.0, 5.0], pa.float64()),
    }))
    agg = binned_quantile_aggregate("v", 0.5, 0.0, 10.0, alias_name="p50")
    out = ds.groupby("g").aggregate(agg).to_pandas()
    assert abs(out["p50"][0] - 5.0) < 10.0 / 4096 + 1e-9

    # hopping window: null ts produces zero rows, not garbage windows
    from etl_geodata_pipeline_ray.stages.windows import hopping_window

    ev = ray.data.from_arrow(pa.table({
        "ts": pa.array([1_700_000_000_000_000, None], pa.timestamp("us")),
        "v": [1, 2],
    }))
    w = hopping_window(ev, "ts", size_s=60, hop_s=30).to_pandas()
    assert set(w["v"]) == {1} and len(w) == 2  # 60/30 = 2 windows, row 1 only


def test_spec_substitution_single_pass_and_specs_raise():
    from etl_geodata_pipeline_ray.pipelines.spec import _resolve

    # a param VALUE containing another param's placeholder text stays
    # literal — no double substitution on later iterations
    assert _resolve("{a}|{b}", {"a": "{b}", "b": "X"}) == "{b}|X"
    # regex-style literal braces and unknown placeholders untouched
    assert _resolve("[0-9]{4} {nope}", {"a": 1}) == "[0-9]{4} {nope}"
    # '{k:03d}' used to pass through silently under str.replace; loud now
    with pytest.raises(ValueError, match="format spec"):
        _resolve("{a:03d}", {"a": 5})


def test_diff_states_negative_turn_idx_no_cross_conv_collision():
    """(code << 32) | turn packing: a negative int32 turn_idx must not
    sign-extend into the conv-code bits and collide keys across
    conversations (round-4 ADVICE)."""
    ts = np.datetime64("2026-01-01T00:00:00", "us")
    slim = ["conv_id", "turn_idx", "ts", "op_seq", "op"]

    def tbl(rows, with_text=False):
        cols = slim + (["text"] if with_text else [])
        t = pa.Table.from_pylist(
            [dict(zip(cols, r)) for r in rows],
            schema=pa.schema([EVENT_SCHEMA.field(c) for c in cols]),
        )
        return t

    out_schema = pa.schema(list(EVENT_SCHEMA) + [pa.field("change", pa.string())])
    # pre-fix: key("c0", -1) == key("c1", -1) == -1 → "c1" misread as found
    from etl_geodata_pipeline_ray.cdc.schema import conform

    a = tbl([("c0", -1, ts, 1, "I")])
    b = conform(tbl([("c1", -1, ts, 2, "I", "x")], with_text=True), EVENT_SCHEMA)
    got = _diff_states(a, b, out_schema).to_pylist()
    by_key = {(r["conv_id"], r["turn_idx"]): r["change"] for r in got}
    # pre-fix the collision made ("c1", -1) look "found" in `a` and it
    # came out as "update"; distinct keys classify it as a fresh insert
    assert by_key == {("c1", -1): "insert"}


def test_validate_lake_reports_missing_file_and_empty_dir(ray_session, tmp_path):
    """validate_lake keeps its 'raises nothing' contract: an empty /
    uninitialized dir validates ok, and a committed file that vanished
    (disk fault / GC bug) is REPORTED as an I5 violation instead of
    crashing the audit task."""
    from etl_geodata_pipeline_ray.cdc.validate import validate_lake

    empty = tmp_path / "nothing"
    empty.mkdir()
    v = validate_lake(empty)
    assert v["ok"] and v["files_checked"] == 0

    from etl_geodata_pipeline_ray.cdc.ingest import upsert_dataset

    lake = tmp_path / "lake"
    t = pa.table(
        {
            "conv_id": ["a", "b"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "ts": pa.array([1, 2], pa.timestamp("us")),
            "text": pa.array(["x", "y"], pa.large_string()),
        }
    )
    upsert_dataset(ray.data.from_arrow(t), lake, num_shards=4)
    assert validate_lake(lake)["ok"]
    victim = next(Path(lake).glob("shard=*/*.parquet"))
    victim.unlink()
    v = validate_lake(lake)
    assert not v["ok"]
    assert any("I5 committed file missing" in x for x in v["violations"])


def test_session_windows_null_ts_and_key_dropped(ray_session):
    """Null-ts events must not become garbage (key, NaT, NaT, 1)
    singleton sessions, and null-key rows drop explicitly."""
    import pandas as pd

    from etl_geodata_pipeline_ray.stages.windows import session_windows

    df = pd.DataFrame(
        {
            "user_id": [1, 1, None, 2],
            "ts": pd.to_datetime([1_000, 2_000, 3_000, None], unit="s"),
        }
    )
    out = session_windows(
        ray.data.from_pandas(df), "user_id", "ts", gap_seconds=10_000
    ).to_pandas()
    assert len(out) == 1  # user 1's two events, one session
    assert out["n_events"].tolist() == [2]
    assert not out["session_start"].isna().any()


def test_hopping_window_rejects_non_multiple_hop(ray_session):
    from etl_geodata_pipeline_ray.stages.windows import hopping_window

    ds = ray.data.from_items([{"ts": 1}])
    with pytest.raises(ValueError, match="multiple"):
        hopping_window(ds, "ts", size_s=90, hop_s=60)
