"""Property fuzz for partition evolution: random interleavings of
append replays, reshards (grow/shrink/coprime), compactions and
vacuums must keep the lake oracle-equal and invariant-clean at every
step — the single-reshard tests prove each operation alone; this
proves they COMPOSE (the 10^10 lake's real life is years of appends
punctuated by occasional relayouts)."""

import random
from pathlib import Path

import pytest

from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state
from etl_geodata_pipeline_ray.cdc.replay import (
    compact,
    lake_final_table,
    lake_stats,
    replay,
    reshard,
    vacuum,
)
from etl_geodata_pipeline_ray.cdc.validate import validate_lake


@pytest.mark.parametrize("seed", [11, 23])
def test_reshard_compose_fuzz(ray_session, tmp_path, seed):
    rng = random.Random(seed)
    spec = WalSpec(
        n_convs=150, seed=seed, dup_rate=0.05, shuffle_window=120,
        seg_size=400, schema_change_frac=0.5,
    )
    wal = tmp_path / "wal"
    lake = tmp_path / "lake"
    write_wal(spec, wal, overwrite=True)
    n_segs = len(list(Path(wal).glob("seg-*.parquet")))

    committed = 2
    replay(wal, lake, num_shards=8, mode="append", max_segments=committed,
           retain_versions=2)
    shard_choices = [2, 4, 6, 8, 12, 16]  # 6 is coprime-ish vs 16 (gcd 2)

    import warnings as _w

    steps = []
    for _ in range(7):
        op = rng.choice(["append", "reshard", "compact", "vacuum"])
        steps.append(op)
        if op == "append" and committed < n_segs:
            committed = min(n_segs, committed + rng.randint(1, 3))
            replay(wal, lake, mode="append", max_segments=committed)
        elif op == "reshard":
            new_n = rng.choice(shard_choices)
            with _w.catch_warnings():
                _w.simplefilter("ignore")  # coprime fan-out warns; fine
                st = reshard(lake, new_n)
            assert st["num_shards"] == new_n or not st["resharded"]
        elif op == "compact":
            compact(lake)
        else:
            vacuum(lake)
        v = validate_lake(lake)
        assert v["ok"], (steps, v["violations"])

    # drain the WAL, then the final state must equal the oracle no
    # matter what layout churn happened in between
    replay(wal, lake, mode="append")
    assert lake_final_table(lake).equals(oracle_final_state(wal)), steps
    assert validate_lake(lake)["ok"]
    # replays were exactly-once throughout: one more commits nothing
    st = replay(wal, lake, mode="append")
    assert st["committed_segments"] == 0, steps
    assert lake_stats(lake)["num_shards"] in shard_choices + [8]
