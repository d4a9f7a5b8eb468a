"""Snapshot retention + time travel: with ``retain_versions=R`` (pinned
in ``_lake.json``), GC keeps the files of the last R manifest versions
per shard, so (a) a concurrent reader resolved against the previous
commit can't have files unlinked mid-read, and (b)
``read_lake(at_commit=...)`` reconstructs any retained commit's state.
``expire_snapshots`` is the storage lever; expired reads RAISE rather
than silently answering from the wrong state."""

import shutil
from pathlib import Path

import pytest

from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state
from etl_geodata_pipeline_ray.cdc.replay import (
    commit_log,
    expire_snapshots,
    lake_final_table,
    read_lake,
    replay,
)

SPEC = WalSpec(
    n_convs=250, seed=31, dup_rate=0.05, shuffle_window=200,
    seg_size=700, schema_change_frac=0.5,
)


def _incremental(tmp_path: Path, mode: str, retain: int = 2):
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(SPEC, wal, overwrite=True)
    segs = sorted(wal.glob("seg-*.parquet"))
    for k in (2, 4, len(segs)):
        replay(wal, lake, num_shards=8, mode=mode,
               max_segments=k, retain_versions=retain)
    return wal, lake, segs


def _prefix_oracle(tmp_path: Path, segs, k: int):
    d = tmp_path / f"wal_prefix_{k}"
    d.mkdir(exist_ok=True)
    for p in segs[:k]:
        shutil.copy(p, d / p.name)
    return oracle_final_state(d)


@pytest.mark.parametrize("mode", ["append", "rewrite"])
def test_time_travel_matches_prefix_oracle(ray_session, tmp_path, mode):
    wal, lake, segs = _incremental(tmp_path, mode)
    log = commit_log(lake)
    # rewrite-mode incremental replays also log their trailing
    # compaction commits; data commits are the ones with segments
    data = [e for e in log if e["n_segments"]]
    assert len(data) == 3
    c2, c3 = data[1]["commit"], data[2]["commit"]
    assert lake_final_table(lake, at_commit=c3).equals(oracle_final_state(wal))
    assert lake_final_table(lake, at_commit=c2).equals(
        _prefix_oracle(tmp_path, segs, 4)
    )
    # streaming read resolves the same snapshot
    n = read_lake(lake, at_commit=c2).count()
    assert n == _prefix_oracle(tmp_path, segs, 4).num_rows


def test_previous_version_files_survive_one_commit(ray_session, tmp_path):
    """Rewrite mode replaces every touched shard's file each commit;
    with retain_versions=2 the replaced files must still exist (this is
    the concurrent-reader guarantee), and expire_snapshots removes
    them."""
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(SPEC, wal, overwrite=True)
    segs = sorted(wal.glob("seg-*.parquet"))
    replay(wal, lake, num_shards=8, max_segments=3, retain_versions=2)
    v1_files = set(p.name for p in lake.glob("shard=*/*.parquet"))
    replay(wal, lake, num_shards=8)
    on_disk = set(p.name for p in lake.glob("shard=*/*.parquet"))
    assert v1_files <= on_disk, "previous-version files were GC'd while retained"
    st = expire_snapshots(lake, keep=1)
    assert st["gc_files"] >= len(v1_files) - 1
    left = set(p.name for p in lake.glob("shard=*/*.parquet"))
    assert not (v1_files & left)
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_expired_snapshot_raises_not_lies(ray_session, tmp_path):
    wal, lake, segs = _incremental(tmp_path, "rewrite")
    data = [e for e in commit_log(lake) if e["n_segments"]]
    c1 = data[0]["commit"]
    with pytest.raises(ValueError, match="retained history|older"):
        lake_final_table(lake, at_commit=c1)
    with pytest.raises(ValueError, match="unknown commit"):
        read_lake(lake, at_commit="does-not-exist")


def test_retain_one_preserves_old_behavior(ray_session, tmp_path):
    """retain_versions=1 (and pre-retention lakes) GC immediately —
    storage identical to the previous design."""
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(SPEC, wal, overwrite=True)
    replay(wal, lake, num_shards=8, max_segments=3, retain_versions=1)
    v1_files = set(p.name for p in lake.glob("shard=*/*.parquet"))
    replay(wal, lake, num_shards=8)
    on_disk = set(p.name for p in lake.glob("shard=*/*.parquet"))
    assert not (v1_files & on_disk), "retain=1 must not keep old versions"
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_lake_stats_summary(ray_session, tmp_path):
    from etl_geodata_pipeline_ray.cdc.replay import lake_stats

    wal, lake, segs = _incremental(tmp_path, "append")
    s = lake_stats(lake)
    assert s["num_shards"] == 8 and s["retain_versions"] == 2
    assert s["commits"] == 3 and s["committed_segments"] == len(segs)
    # manifest rows count tombstone rows too, so >= the final table
    assert s["rows"] >= lake_final_table(lake).num_rows > 0
    assert s["max_runs_per_shard"] >= 2  # append runs accumulated
    assert s["quarantined_rows"] == 0


def test_read_lake_predicate_pushdown(ray_session, tmp_path):
    """Predicate semantics must be identical on both branches: scan
    pushdown (compacted) and post-LWW-merge filter (multi-run)."""
    import pyarrow.dataset as pads

    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(SPEC, wal, overwrite=True)
    replay(wal, lake, num_shards=8)
    segs = sorted(wal.glob("seg-*.parquet"))
    for k in (2, len(segs)):
        replay(wal, lake2 := tmp_path / "lake2", num_shards=8,
               mode="append", max_segments=k)

    pred = pads.field("turn_idx") >= 5
    ora = oracle_final_state(wal).to_pandas()
    want = (
        ora[ora["turn_idx"] >= 5]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    for lk in (lake, lake2):
        got = (
            read_lake(lk, predicate=pred)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_read_lake_shape_consistent_across_compaction_state(ray_session, tmp_path):
    """columns+include_tombstones and columns+predicate must behave
    identically on compacted and multi-run lakes (review findings:
    multi-run leaked merge keys; compacted rejected predicates on
    non-projected columns)."""
    import pyarrow.dataset as pads

    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(SPEC, wal, overwrite=True)
    replay(wal, lake, num_shards=8)
    segs = sorted(wal.glob("seg-*.parquet"))
    lake2 = tmp_path / "lake2"
    for k in (2, len(segs)):
        replay(wal, lake2, num_shards=8, mode="append", max_segments=k)

    for lk in (lake, lake2):
        t = read_lake(lk, columns=["text"], include_tombstones=True).to_pandas()
        assert list(t.columns) == ["text"], lk
        # predicate on a column that is NOT projected
        p = read_lake(
            lk, columns=["text"], predicate=pads.field("turn_idx") >= 5
        ).to_pandas()
        assert list(p.columns) == ["text"] and len(p) > 0, lk

    ora = oracle_final_state(wal)
    n_match = int(
        (ora["turn_idx"].to_pandas() >= 5).sum()
    )
    for lk in (lake, lake2):
        p = read_lake(lk, columns=["text"], predicate=pads.field("turn_idx") >= 5)
        assert p.count() == n_match, lk


def test_time_travel_property_random_splits(ray_session, tmp_path_factory):
    """Hypothesis-style sweep without hypothesis overhead: several
    random segment splits; for each, every commit still within the
    retention window must reconstruct exactly its prefix oracle."""
    import numpy as np

    rng = np.random.default_rng(7)
    wal_root = tmp_path_factory.mktemp("ttprop")
    spec = WalSpec(n_convs=150, seed=41, dup_rate=0.08, shuffle_window=150,
                   seg_size=400, schema_change_frac=0.5)
    write_wal(spec, wal_root / "wal", overwrite=True)
    segs = sorted((wal_root / "wal").glob("seg-*.parquet"))
    n = len(segs)
    assert n >= 4
    for trial in range(3):
        lake = wal_root / f"lake{trial}"
        cuts = sorted(set(rng.choice(np.arange(1, n), size=3, replace=False).tolist() + [n]))
        retain = len(cuts)  # keep everything readable this trial
        for k in cuts:
            replay(wal_root / "wal", lake, num_shards=4, mode="append",
                   max_segments=int(k), retain_versions=retain)
        data = [e for e in commit_log(lake) if e["n_segments"]]
        assert len(data) == len(cuts)
        for c, k in zip(data, cuts):
            got = lake_final_table(lake, at_commit=c["commit"])
            want = _prefix_oracle(wal_root, segs, int(k))
            assert got.equals(want), (trial, k)


def test_lake_diff_changelog(ray_session, tmp_path):
    """Applying lake_diff(c1, c2) to the c1 snapshot must reproduce the
    c2 snapshot exactly — the CDC-output contract."""
    import pandas as pd

    from etl_geodata_pipeline_ray.cdc.replay import lake_diff

    wal, lake, segs = _incremental(tmp_path, "append", retain=3)
    data = [e for e in commit_log(lake) if e["n_segments"]]
    c1, c2 = data[0]["commit"], data[2]["commit"]

    diff = lake_diff(lake, c1, c2).to_pandas()
    assert set(diff["change"]) <= {"insert", "update", "delete"}
    assert len(diff) > 0

    key = ["conv_id", "turn_idx"]
    base = lake_final_table(lake, at_commit=c1).to_pandas()
    # apply: remove every changed key, then add back the live to-rows
    changed_keys = diff[key].drop_duplicates()
    applied = base.merge(changed_keys, on=key, how="left", indicator=True)
    applied = applied[applied["_merge"] == "left_only"].drop(columns=["_merge"])
    live = diff[diff["change"] != "delete"][applied.columns.tolist()]
    applied = (
        pd.concat([applied, live])
        .sort_values(key)
        .reset_index(drop=True)
    )
    want = lake_final_table(lake, at_commit=c2).to_pandas()
    pd.testing.assert_frame_equal(applied, want)

    # self-diff is empty
    assert lake_diff(lake, c2, c2).count() == 0


def test_lake_diff_before_image_stamps(ray_session, tmp_path):
    """include_before=True: every update/delete row carries the
    superseded LIVE revision's (ts, op_seq) from the from-snapshot;
    inserts carry nulls (a dead prior revision is not a before-image).
    Checked against an independent pandas recompute of the c1 state."""
    import pandas as pd

    from etl_geodata_pipeline_ray.cdc.replay import lake_diff, read_lake

    wal, lake, segs = _incremental(tmp_path, "append", retain=3)
    data = [e for e in commit_log(lake) if e["n_segments"]]
    c1, c2 = data[0]["commit"], data[2]["commit"]

    diff = lake_diff(lake, c1, c2, include_before=True).to_pandas()
    assert len(diff) > 0
    plain = lake_diff(lake, c1, c2).to_pandas()
    key = ["conv_id", "turn_idx"]
    # same rows/changes as the default feed, just two extra columns
    pd.testing.assert_frame_equal(
        diff.drop(columns=["before_ts", "before_op_seq"])
        .sort_values(key).reset_index(drop=True),
        plain.sort_values(key).reset_index(drop=True),
    )

    # the LIVE c1 state (tombstones filtered) is the before-image source
    old = (
        read_lake(lake, include_tombstones=True, at_commit=c1)
        .to_pandas()
    )
    old = old[old["op"] != "D"][key + ["ts", "op_seq"]].rename(
        columns={"ts": "want_ts", "op_seq": "want_seq"}
    )
    m = diff.merge(old, on=key, how="left")
    upd = m[m["change"] != "insert"]
    assert len(upd) > 0
    assert (upd["before_ts"] == upd["want_ts"]).all()
    assert (upd["before_op_seq"] == upd["want_seq"]).all()
    ins = m[m["change"] == "insert"]
    assert ins["before_ts"].isna().all() and ins["before_op_seq"].isna().all()
    # inserts had no LIVE prior revision
    assert ins["want_ts"].isna().all()


def test_lake_diff_sparse_change_selective_payload(ray_session, tmp_path):
    """A sparse second commit (3 changed convs among 500) takes the
    adaptive diff's SELECTIVE payload path (slim stamp probe → conv_id
    in-set filtered re-read); the emitted feed must be exactly the
    changed keys with the right payload and change labels."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_geodata_pipeline_ray.cdc.replay import lake_diff, replay
    from etl_geodata_pipeline_ray.cdc.schema import EVENT_SCHEMA

    def row(conv, turn, op, seq, ts_s, text):
        return {
            "op": op, "op_seq": seq,
            "ts": pd.Timestamp("2026-02-01") + pd.Timedelta(seconds=ts_s),
            "conv_id": conv, "turn_idx": turn, "role": "user",
            "text": text, "tool": None,
        }

    wal, lake = tmp_path / "wal", tmp_path / "lake"
    wal.mkdir()
    base = [
        row(f"c{i:04d}", t, "U", i * 2 + t, 0, f"base text {i} {t}")
        for i in range(500)
        for t in (0, 1)
    ]
    pq.write_table(pa.Table.from_pylist(base).cast(EVENT_SCHEMA),
                   wal / "seg-000.parquet")
    replay(wal, lake, num_shards=8, mode="append", retain_versions=2)
    delta = [
        row("c0007", 0, "U", 5000, 60, "updated text"),
        row("c0123", 1, "D", 5001, 60, None),
        row("c9999", 0, "U", 5002, 60, "brand new conv"),
    ]
    pq.write_table(pa.Table.from_pylist(delta).cast(EVENT_SCHEMA),
                   wal / "seg-001.parquet")
    replay(wal, lake, num_shards=8, mode="append")
    c1, c2 = [e["commit"] for e in commit_log(lake) if e["n_segments"]]

    diff = (
        lake_diff(lake, c1, c2, include_before=True)
        .to_pandas()
        .sort_values("op_seq")
        .reset_index(drop=True)
    )
    assert list(diff["conv_id"]) == ["c0007", "c0123", "c9999"]
    assert list(diff["change"]) == ["update", "delete", "insert"]
    assert list(diff["text"][:1]) == ["updated text"]
    # before-image stamps: the superseded base revisions for the first
    # two, null for the insert
    assert list(diff["before_op_seq"][:2]) == [14, 247]
    assert pd.isna(diff["before_op_seq"][2])


def test_read_conversation_point_lookup(ray_session, tmp_path):
    """Hash-routed single-shard point read equals the oracle's slice,
    on both compacted and multi-run lakes, and respects at_commit."""
    from etl_geodata_pipeline_ray.cdc.replay import read_conversation

    wal, lake, segs = _incremental(tmp_path, "append", retain=3)
    ora = oracle_final_state(wal).to_pandas()
    some = ora["conv_id"].unique()[:5]
    for cid in some:
        got = read_conversation(lake, cid).to_pandas().reset_index(drop=True)
        want = ora[ora["conv_id"] == cid].reset_index(drop=True)
        import pandas as pd

        pd.testing.assert_frame_equal(got, want)
    assert read_conversation(lake, "no_such_conv").num_rows == 0
    # at_commit slice
    data = [e for e in commit_log(lake) if e["n_segments"]]
    c1 = data[0]["commit"]
    pre = _prefix_oracle(tmp_path, segs, 2).to_pandas()
    cid = pre["conv_id"].iloc[0]
    got = read_conversation(lake, cid, at_commit=c1).to_pandas().reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, pre[pre["conv_id"] == cid].reset_index(drop=True))


def test_diff_states_arrow_native():
    """Unit guard for the Arrow-side diff kernel (round-3 verdict #2 +
    ADVICE): (a) op_seq must compare as int64 — revisions 2^53 and
    2^53+1 are equal in float64, so the old pandas-merge path would
    call them unchanged; (b) a text-heavy diff must not copy the
    payload of both snapshots (the pandas path tripled the footprint)."""
    import numpy as np
    import pyarrow as pa

    from etl_geodata_pipeline_ray.cdc.replay import _diff_states
    from etl_geodata_pipeline_ray.cdc.schema import EVENT_SCHEMA, conform

    slim = ["conv_id", "turn_idx", "ts", "op_seq", "op"]
    ts = np.datetime64("2026-01-01T00:00:00", "us")

    def slim_tbl(rows):
        t = pa.Table.from_pylist(
            [dict(zip(slim, r)) for r in rows],
            schema=pa.schema([EVENT_SCHEMA.field(c) for c in slim]),
        )
        return t

    def full_tbl(rows):
        t = pa.Table.from_pylist(
            [
                dict(op=r[4], op_seq=r[3], ts=r[2], conv_id=r[0], turn_idx=r[1],
                     role="user", text=r[5], tool=None)
                for r in rows
            ]
        )
        return conform(t, EVENT_SCHEMA)

    out_schema = pa.schema(list(EVENT_SCHEMA) + [pa.field("change", pa.string())])
    big = 2**53
    a = slim_tbl(
        [
            ("c1", 0, ts, big, "I"),        # updated with op_seq big+1 (float64-equal!)
            ("c1", 1, ts, 7, "I"),          # unchanged
            ("c2", 0, ts, 9, "D"),          # dead before; new tombstone -> no-op
            ("c3", 0, ts, 11, "I"),         # deleted in `to`
        ]
    )
    b = full_tbl(
        [
            ("c1", 0, ts, big + 1, "U", "x"),
            ("c1", 1, ts, 7, "I", "y"),
            ("c2", 0, ts, 12, "D", None),
            ("c3", 0, ts, 13, "D", None),
            ("c4", 5, ts, 20, "I", "fresh"),  # insert
        ]
    )
    got = _diff_states(a, b, out_schema).to_pylist()
    by_key = {(r["conv_id"], r["turn_idx"]): r["change"] for r in got}
    assert by_key == {
        ("c1", 0): "update",
        ("c3", 0): "delete",
        ("c4", 5): "insert",
    }

    # memory shape: 100 MB of text in `b`, one changed row -> the diff
    # must not push the Arrow high-water mark by anywhere near a full
    # payload copy (the old pandas merge copied ~2x both snapshots)
    n = 40_000
    text = "t" * 2_500
    rows = [(f"c{i}", 0, ts, i, "I") for i in range(n)]
    a_big = slim_tbl(rows)
    b_big = full_tbl([r + (text,) for r in rows[:-1]] + [("changed", 1, ts, 1, "I", text)])
    import tracemalloc

    tracemalloc.start()
    tracemalloc.reset_peak()
    got = _diff_states(a_big, b_big, out_schema)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert got.num_rows == 1 and got["conv_id"][0].as_py() == "changed"
    # the old path's .to_pandas() materialized ~100 MB of Python text
    # strings (tracemalloc-visible); the Arrow path stays in the pool
    # and only numpy key/stamp arrays hit the Python heap
    assert peak < 40 * 1024 * 1024, f"diff kernel copied the payload: peak={peak/1e6:.0f}MB"


def test_merge_key_predicate_pushes_to_lsm_scan(ray_session, tmp_path):
    """Round-3 verdict #3: merge-key predicates are LWW-safe pre-merge
    and must push to the per-run-file scan on an uncompacted lake.
    Checks (a) the plan routes key-only predicates to the scan and
    payload predicates post-merge, (b) pushdown result == post-merge
    result == compacted result, (c) row-group stats on the key-sorted
    run files actually prune for the pushed predicate."""
    import pandas as pd
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from etl_geodata_pipeline_ray.cdc.replay import _plan_predicate, lake_files

    # (a) plan routing
    kp = (pads.field("conv_id") == "c1") & (pads.field("turn_idx") >= 2)
    scan, post, extra = _plan_predicate(kp)
    assert scan is not None and post is None and extra == set()
    pp = pads.field("role") == "user"
    scan, post, extra = _plan_predicate(pp)
    assert scan is None and post is not None and extra == {"role"}
    assert _plan_predicate(None) == (None, None, set())

    # multi-run lake: two append replays, never compacted
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(SPEC, wal, overwrite=True)
    segs = sorted(wal.glob("seg-*.parquet"))
    for k in (2, len(segs)):
        replay(wal, lake, num_shards=8, mode="append", max_segments=k)

    ora = oracle_final_state(wal).to_pandas()
    cid = ora["conv_id"].iloc[0]
    kp = pads.field("conv_id") == cid
    want = ora[ora["conv_id"] == cid].sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)

    # (b) pushed result equals the oracle slice (and hence the
    # post-merge semantics the compacted branch implements)
    got = (
        read_lake(lake, predicate=kp)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # non-projected payload predicate on the SAME multi-run lake used
    # to raise at execution time (ADVICE): now projected-in and dropped
    got2 = read_lake(lake, columns=["conv_id", "text"], predicate=pp).to_pandas()
    want2 = ora[ora["role"] == "user"][["conv_id", "text"]]
    assert sorted(got2.columns) == ["conv_id", "text"]
    assert len(got2) == len(want2)

    # (c) pruning evidence: with the single-conv predicate, whole run
    # files (hash-routed shards) and row groups are prunable by stats
    files = lake_files(lake)
    assert len(files) > 8  # genuinely multi-run
    total_rg = matched_rg = 0
    for f in files:
        frag = next(iter(pads.dataset(f).get_fragments()))
        total_rg += pq.ParquetFile(f).metadata.num_row_groups
        matched_rg += len(list(frag.split_by_row_group(filter=kp)))
    assert matched_rg < total_rg, (matched_rg, total_rg)


def test_commit_log_phantom_demoted(ray_session, tmp_path):
    """LEGACY phantom demotion (ADVICE r3): before round 4 the log was
    appended BEFORE the manifests, so a pre-manifest crash left a
    record claiming segments the resumed replay re-committed later.
    Such legacy-shaped records (no ``segments`` list) must demote to
    empty commits. Records written by the current protocol carry the
    list, are appended after the manifests, and are never demoted —
    asserted on the genuine commits below."""
    import json as _json

    from etl_geodata_pipeline_ray.cdc.replay import commit_log, lake_final_table

    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(SPEC, wal, overwrite=True)
    segs = [p.name for p in sorted(wal.glob("seg-*.parquet"))]
    assert len(segs) >= 3
    replay(wal, lake, num_shards=8, mode="append", max_segments=2)
    # a legacy writer's pre-manifest crash: range-only record, no
    # segments list (the current protocol cannot produce this state —
    # the log append IS the commit point now)
    with open(lake / "_manifests" / "_commits.jsonl", "a") as f:
        f.write(_json.dumps({
            "commit": "deadbeefphantom", "n_segments": len(segs[2:]),
            "first_segment": segs[2], "last_segment": segs[-1],
        }) + "\n")
    # resume re-commits those segments under a fresh id
    replay(wal, lake, num_shards=8, mode="append")
    log = commit_log(lake)
    ph = [e for e in log if e["commit"] == "deadbeefphantom"]
    assert ph and ph[0]["n_segments"] == 0 and ph[0].get("phantom") is True
    assert ph[0]["first_segment"] is None and ph[0]["last_segment"] is None
    real = [e for e in log if e["n_segments"]]
    assert len(real) == 2  # the two genuine data commits survive intact
    assert not any(e.get("phantom") for e in real)
    assert lake_final_table(lake).equals(oracle_final_state(wal))


def test_torn_commit_invisible_to_time_travel(ray_session, tmp_path):
    """A manifest entry whose commit id never reached the log (the
    torn window: manifests durable, crash before the commit-point
    append) is UNCOMMITTED — time travel must never serve its files.
    With retention=1 and only the torn entry retained, resolving the
    earlier commit must raise (never a silent future-data answer)."""
    import pytest as _pytest

    from etl_geodata_pipeline_ray.cdc.replay import commit_log, lake_final_table

    wal, lake = tmp_path / "wal", tmp_path / "lake"
    segs = write_wal(SPEC, wal, overwrite=True)
    assert len(segs) >= 2
    replay(wal, lake, num_shards=2, mode="append", max_segments=1,
           retain_versions=1)
    c_a = commit_log(lake)[-1]["commit"]
    replay(wal, lake, num_shards=2, mode="append", retain_versions=1)

    log = lake / "_manifests" / "_commits.jsonl"
    lines = log.read_bytes().splitlines(keepends=True)
    log.write_bytes(b"".join(lines[:-1]))  # commit B tore pre-log-append

    with _pytest.raises(ValueError, match="retained history"):
        lake_final_table(lake, at_commit=c_a)
    # recovery re-lands the batch under a logged id; A is gone from
    # retention (retain_versions=1) so the raise persists, but the
    # RECOVERED head must resolve fine and equal the full oracle
    replay(wal, lake, num_shards=2, mode="append", retain_versions=1)
    head = commit_log(lake)[-1]["commit"]
    assert lake_final_table(lake, at_commit=head).equals(oracle_final_state(wal))


def test_phantom_demotion_requires_range_intersection(tmp_path):
    """A later out-of-order commit (lower-named segments — wave 7
    delivered before wave 6) must NOT demote an earlier genuine legacy
    record; only a later record that re-commits INTO the legacy range
    marks it phantom."""
    import json as _json

    from etl_geodata_pipeline_ray.cdc.replay import commit_log

    mdir = tmp_path / "_manifests"
    mdir.mkdir(parents=True)
    recs = [
        # genuine legacy commit (pre-round-4 shape: no segments list)
        {"commit": "legacyaaaa", "n_segments": 2,
         "first_segment": "seg-000000000010.parquet",
         "last_segment": "seg-000000000019.parquet"},
        # later, legitimately out-of-order slice BELOW the legacy range
        {"commit": "oooslice", "n_segments": 1,
         "first_segment": "seg-000000000005.parquet",
         "last_segment": "seg-000000000005.parquet",
         "segments": ["seg-000000000005.parquet"]},
        # true phantom: legacy claim whose range a later record re-commits
        {"commit": "legacybbbb", "n_segments": 1,
         "first_segment": "seg-000000000030.parquet",
         "last_segment": "seg-000000000039.parquet"},
        {"commit": "recommit", "n_segments": 1,
         "first_segment": "seg-000000000030.parquet",
         "last_segment": "seg-000000000039.parquet",
         "segments": ["seg-000000000030.parquet"]},
    ]
    (mdir / "_commits.jsonl").write_text(
        "".join(_json.dumps(r) + "\n" for r in recs)
    )
    log = {r["commit"]: r for r in commit_log(tmp_path)}
    assert not log["legacyaaaa"].get("phantom")  # out-of-order slice is innocent
    assert log["legacyaaaa"]["n_segments"] == 2
    assert log["legacybbbb"].get("phantom") is True
    assert not log["oooslice"].get("phantom")
    assert not log["recommit"].get("phantom")


def test_conv_zone_prunes_point_lookup_files(ray_session, tmp_path):
    """Per-file conv_id [min,max] zones: a multi-run shard whose runs
    hold DISJOINT conv ranges must serve a point lookup without
    opening the runs that exclude the key (manifest-side skip, zero
    footer opens), and the result must equal the full read."""
    import pandas as pd
    import ray.data

    from etl_geodata_pipeline_ray.cdc.ingest import upsert_dataset
    from etl_geodata_pipeline_ray.cdc.replay import read_conversation

    lake = tmp_path / "lake"

    def turns(prefix, n_convs, ts0):
        rows = []
        for c in range(n_convs):
            for t in range(3):
                rows.append({
                    "conv_id": f"{prefix}{c:04d}", "turn_idx": t,
                    "role": "user", "text": f"{prefix} {c} {t}",
                    "tool": None,
                    "ts": pd.Timestamp(ts0) + pd.Timedelta(seconds=t),
                })
        return pd.DataFrame(rows)

    # two appends with disjoint conv prefixes -> each shard holds two
    # run files with non-overlapping conv_id ranges
    upsert_dataset(ray.data.from_pandas(turns("aaa_", 40, "2026-01-01")),
                   lake, num_shards=4, mode="append")
    upsert_dataset(ray.data.from_pandas(turns("zzz_", 40, "2026-01-02")),
                   lake, num_shards=4, mode="append")

    info = {}
    got = read_conversation(lake, "aaa_0000", plan_info=info)
    assert got.num_rows == 3
    assert info["files_total"] >= 2
    assert info["files_skipped"] >= 1, (
        "zzz run should be zone-skipped for an aaa lookup"
    )
    # equality with the unpruned semantic: every turn text present
    assert sorted(got["text"].to_pylist()) == [f"aaa_ 0 {t}" for t in range(3)]
    # unknown key still answers empty (may route to a zone-skipped shard)
    assert read_conversation(lake, "mmm_nope").num_rows == 0


def test_read_conversations_batch_matches_point_lookups(ray_session, tmp_path):
    """Batch point lookup plans only owning shards, prunes files by
    conv zone, and returns exactly the union of the per-conversation
    point reads (projection respected)."""
    import pandas as pd

    from etl_geodata_pipeline_ray.cdc.replay import (
        read_conversation,
        read_conversations,
    )

    wal, lake, segs = _incremental(tmp_path, "append", retain=3)
    ora = oracle_final_state(wal).to_pandas()
    some = sorted(ora["conv_id"].unique()[:5]) + ["no_such_conv"]

    info = {}
    got = (
        read_conversations(lake, some, plan_info=info)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = pd.concat(
        [read_conversation(lake, c).to_pandas() for c in some]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert info["shards_total"] - info["shards_skipped"] <= len(some)

    # projection
    slim = read_conversations(lake, some[:2], columns=["conv_id", "text"])
    assert slim.schema().names == ["conv_id", "text"]
    assert slim.count() == int((ora["conv_id"].isin(some[:2])).sum())

    # empty id list and fresh lake both present the projected schema
    empty = read_conversations(lake, [], columns=["conv_id"])
    assert empty.count() == 0 and empty.schema().names == ["conv_id"]


def test_vacuum_reclaims_crash_debris_only(ray_session, tmp_path):
    """vacuum() removes exactly the debris a crashed writer leaves
    (orphan shard files, torn .tmp-* scratch, abandoned upsert
    staging) and never touches committed state."""
    import pandas as pd
    import ray.data

    from etl_geodata_pipeline_ray.cdc.ingest import upsert_dataset
    from etl_geodata_pipeline_ray.cdc.replay import lake_final_table, vacuum

    lake = tmp_path / "lake"
    df = pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(20) for _ in range(2)],
        "turn_idx": [t for _ in range(20) for t in range(2)],
        "role": "user", "text": "x", "tool": None,
        "ts": pd.Timestamp("2026-01-01"),
    })
    upsert_dataset(ray.data.from_pandas(df), lake, num_shards=4)
    before = lake_final_table(lake)
    committed = set(p.name for p in lake.glob("shard=*/*.parquet"))

    # plant crash debris
    sh = next(lake.glob("shard=*"))
    orphan = sh / "v999999-s000.parquet"
    src = next(p for p in lake.glob("shard=*/*.parquet"))
    orphan.write_bytes(src.read_bytes())
    (lake / "_manifests" / ".tmp-deadbeef").write_text("{}")
    staging = lake / "_ingest" / ".staging-dead"
    staging.mkdir(parents=True)
    (staging / "junk.parquet").write_bytes(b"x")

    rep = vacuum(lake)
    assert rep["gc_files"] >= 1 and rep["tmp_files"] == 1
    assert rep["ingest_swept"] >= 1
    assert not orphan.exists() and not staging.exists()
    assert not (lake / "_manifests" / ".tmp-deadbeef").exists()
    # committed files + state untouched
    assert committed <= set(p.name for p in lake.glob("shard=*/*.parquet"))
    assert lake_final_table(lake).equals(before)
