"""Incremental view maintenance (cdc/incremental.py): leaf metric
tables and per-conversation rollups advanced from the lake_diff
changelog must equal a fresh full recompute at the target commit —
including chained advances, conversations dropping out when their last
live turn is deleted, and conversations appearing mid-stream."""

from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
from etl_geodata_pipeline_ray.cdc.incremental import (
    advance_conv_counts,
    advance_turn_metrics,
    conv_counts,
    turn_metrics,
)
from etl_geodata_pipeline_ray.cdc.replay import commit_log, replay
from etl_geodata_pipeline_ray.cdc.schema import EVENT_SCHEMA

SPEC = WalSpec(
    n_convs=200, seed=23, dup_rate=0.06, shuffle_window=150,
    seg_size=600, schema_change_frac=0.5, update_frac=2.0, delete_frac=0.12,
)


def _lake3(tmp_path: Path):
    """Generator WAL replayed as three append commits, retention 3."""
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(SPEC, wal, overwrite=True)
    n = len(sorted(wal.glob("seg-*.parquet")))
    for k in sorted({max(1, n // 3), max(2, (2 * n) // 3), n}):
        replay(wal, lake, num_shards=8, mode="append",
               max_segments=k, retain_versions=3)
    commits = [e["commit"] for e in commit_log(lake) if e["n_segments"]]
    assert len(commits) == 3
    return lake, commits


def _leaf_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _counts_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values("conv_id").reset_index(drop=True)


def test_advance_leaf_and_counts_match_recompute(ray_session, tmp_path):
    lake, (c1, c2, c3) = _lake3(tmp_path)

    m1 = turn_metrics(lake, at_commit=c1)
    # the documented both-consumers pattern: one materialized diff per
    # commit window, shared by the leaf advance and the rollup advance
    from etl_geodata_pipeline_ray.cdc.replay import lake_diff

    d12 = lake_diff(lake, c1, c2).materialize()
    m2_inc = advance_turn_metrics(m1, lake, c1, c2, diff=d12)
    m2_full = turn_metrics(lake, at_commit=c2)
    pd.testing.assert_frame_equal(_leaf_df(m2_inc), _leaf_df(m2_full))

    # chained advance c1 -> c2 -> c3 equals the full recompute at head
    m3_inc = advance_turn_metrics(m2_inc, lake, c2, c3)
    pd.testing.assert_frame_equal(_leaf_df(m3_inc), _leaf_df(turn_metrics(lake)))

    # rollup delta algebra, chained the same way (c1->c2 reuses the
    # shared changelog)
    k1 = conv_counts(m1)
    k2_inc = advance_conv_counts(k1, m1, lake, c1, c2, diff=d12)
    pd.testing.assert_frame_equal(
        _counts_df(k2_inc), _counts_df(conv_counts(m2_full))
    )
    k3_inc = advance_conv_counts(k2_inc, m2_inc, lake, c2, c3)
    pd.testing.assert_frame_equal(
        _counts_df(k3_inc), _counts_df(conv_counts(turn_metrics(lake)))
    )


def _seg(wal: Path, name: str, rows: list[dict]) -> None:
    t = pa.Table.from_pylist(rows).cast(EVENT_SCHEMA)
    pq.write_table(t, wal / name)


def _row(conv, turn, op, seq, ts_s, text):
    return {
        "op": op, "op_seq": seq,
        "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=ts_s),
        "conv_id": conv, "turn_idx": turn, "role": "user",
        "text": text, "tool": None,
    }


def test_dropout_insert_and_update_deltas(ray_session, tmp_path):
    """Hand-built two-commit stream covering every delta case: conv 'a'
    fully deleted (must drop out of the rollup), conv 'b' updated (token
    delta only), conv 'c' extended (+1 turn), conv 'd' inserted new."""
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    wal.mkdir()
    _seg(wal, "seg-000.parquet", [
        _row("a", 0, "U", 1, 0, "one two three"),
        _row("b", 0, "U", 2, 0, "alpha beta"),
        _row("c", 0, "U", 3, 0, "x"),
    ])
    replay(wal, lake, num_shards=4, mode="append", retain_versions=2)
    _seg(wal, "seg-001.parquet", [
        _row("a", 0, "D", 4, 10, None),
        _row("b", 0, "U", 5, 10, "alpha beta gamma delta"),
        _row("c", 1, "U", 6, 10, "y z"),
        _row("d", 0, "U", 7, 10, "new conv"),
    ])
    replay(wal, lake, num_shards=4, mode="append")
    c1, c2 = [e["commit"] for e in commit_log(lake) if e["n_segments"]]

    m1 = turn_metrics(lake, at_commit=c1)
    got = _counts_df(advance_conv_counts(conv_counts(m1), m1, lake, c1, c2))
    want = pd.DataFrame(
        {
            "conv_id": ["b", "c", "d"],
            "n_turns": [1, 2, 1],
            "total_tokens": [4, 3, 2],
        }
    )
    pd.testing.assert_frame_equal(got, want)
    # and the leaf table advanced the same way
    leaf = _leaf_df(advance_turn_metrics(m1, lake, c1, c2))
    want_leaf = pd.DataFrame(
        {
            "conv_id": ["b", "c", "c", "d"],
            "turn_idx": pd.array([0, 0, 1, 0], dtype="int32"),
            "n_tokens": [4, 1, 2, 2],
        }
    )
    pd.testing.assert_frame_equal(leaf, want_leaf)


import pytest


@pytest.mark.parametrize(
    "seed,update_frac,delete_frac,zipf",
    [(101, 1.0, 0.05, 1.05), (202, 3.0, 0.2, 1.3), (303, 0.5, 0.3, 1.1)],
)
def test_incremental_fuzz_vs_recompute(
    ray_session, tmp_path, seed, update_frac, delete_frac, zipf
):
    """Chained advances over generator WALs with varying update/delete
    mixes and key skew must equal the full recompute at head — both the
    leaf table and the rollup."""
    spec = WalSpec(
        n_convs=150, seed=seed, dup_rate=0.1, shuffle_window=100,
        seg_size=500, schema_change_frac=0.5,
        update_frac=update_frac, delete_frac=delete_frac, zipf_s=zipf,
    )
    wal, lake = tmp_path / "wal", tmp_path / "lake"
    write_wal(spec, wal, overwrite=True)
    n = len(sorted(wal.glob("seg-*.parquet")))
    for k in sorted({max(1, n // 3), max(2, (2 * n) // 3), n}):
        replay(wal, lake, num_shards=8, mode="append",
               max_segments=k, retain_versions=3)
    commits = [e["commit"] for e in commit_log(lake) if e["n_segments"]]
    m = turn_metrics(lake, at_commit=commits[0])
    k_roll = conv_counts(m)
    for c_from, c_to in zip(commits, commits[1:]):
        k_roll = advance_conv_counts(k_roll, m, lake, c_from, c_to)
        m = advance_turn_metrics(m, lake, c_from, c_to)
    pd.testing.assert_frame_equal(_leaf_df(m), _leaf_df(turn_metrics(lake)))
    pd.testing.assert_frame_equal(
        _counts_df(k_roll), _counts_df(conv_counts(turn_metrics(lake)))
    )


def test_noop_diff_is_identity(ray_session, tmp_path):
    lake, (c1, c2, c3) = _lake3(tmp_path)
    m3 = turn_metrics(lake, at_commit=c3)
    same = advance_turn_metrics(m3, lake, c3, c3)
    pd.testing.assert_frame_equal(_leaf_df(same), _leaf_df(m3))
    k3 = conv_counts(m3)
    pd.testing.assert_frame_equal(
        _counts_df(advance_conv_counts(k3, m3, lake, c3, c3)), _counts_df(k3)
    )
