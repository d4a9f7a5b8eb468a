"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC pipeline on sf0.001; ``queries()``
exposes one callable per implemented operator/pipeline from SURVEY §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible entry (identical column names + rounding).

Ray is initialised by the driver BEFORE this module is imported —
nothing here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import hashlib
import shutil
from collections.abc import Callable
from pathlib import Path
from typing import Any


def entry() -> Any:
    """Flagship: CDC replay of a deterministic transcript WAL into the
    lake (generate → replay with LWW/salting/manifests → read back),
    exercised at smoke scale, plus a smoke aggregate on sf0.001."""
    from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
    from etl_geodata_pipeline_ray.cdc.replay import read_lake, replay

    spec = WalSpec(
        n_convs=300, seed=42, dup_rate=0.08, shuffle_window=200,
        schema_change_frac=0.6, zipf_s=1.1,
    )
    root = Path("/tmp/graft_entry") / spec.key()
    wal, lake = root / "wal", root / "lake"
    write_wal(spec, wal)
    shutil.rmtree(lake, ignore_errors=True)
    replay(wal, lake, num_shards=8)
    return read_lake(lake)


def _cdc_spec_and_root(sf_dir: str):
    """ONE definition of the q50/q51 WAL spec and its cache root —
    q51 re-derives the lake path from it, and a one-sided edit would
    silently read a stale lake from a previous code version."""
    from etl_geodata_pipeline_ray.cdc.generator import WalSpec

    n = {"sf0.001": 300, "sf0.01": 1500, "sf0.1": 8000}.get(Path(sf_dir).name, 1000)
    spec = WalSpec(
        n_convs=n, seed=42, dup_rate=0.08, shuffle_window=200,
        schema_change_frac=0.6, zipf_s=1.1, seg_size=max(2000, n * 4),
    )
    return spec, Path("/tmp/graft_cdc") / spec.key()


def _cdc_query(sf_dir: str):
    """CDC replay sized by sf tier; returns the final lake table
    (rows-only check: WAL is synthesized, not SQL-visible)."""
    from etl_geodata_pipeline_ray.cdc.generator import write_wal
    from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state
    from etl_geodata_pipeline_ray.cdc.replay import lake_final_table, replay

    spec, root = _cdc_spec_and_root(sf_dir)
    wal, lake = root / "wal", root / "lake"
    write_wal(spec, wal)
    shutil.rmtree(lake, ignore_errors=True)
    replay(wal, lake, num_shards=16)
    final = lake_final_table(lake)
    assert final.equals(oracle_final_state(wal)), "CDC replay diverged from oracle"
    return final


def _catalog() -> dict[str, tuple]:
    from etl_geodata_pipeline_ray.pipelines.content_queries import CONTENT_QUERIES
    from etl_geodata_pipeline_ray.pipelines.extra_queries import EXTRA_QUERIES
    from etl_geodata_pipeline_ray.pipelines.extra_queries2 import EXTRA_QUERIES2
    from etl_geodata_pipeline_ray.pipelines.queries import RELATIONAL_QUERIES

    return {**RELATIONAL_QUERIES, **CONTENT_QUERIES, **EXTRA_QUERIES, **EXTRA_QUERIES2}


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in _catalog().items()
    }
    out["q50_cdc_replay_transcripts"] = _cdc_query
    out["q51_lake_kpis"] = _lake_kpi_query
    return out


def _lake_kpi_query(sf_dir: str):
    """KPI layer over the transcript lake (SURVEY §7 step 8): replay a
    deterministic WAL, then per-conv turn counts + entropy + role-
    weighted engagement over the committed lake (rows-only check)."""
    from etl_geodata_pipeline_ray.pipelines import lake_queries as LQ

    _cdc_query(sf_dir)  # ensures the lake exists (and re-asserts oracle equality)
    _spec, root = _cdc_spec_and_root(sf_dir)
    lake = root / "lake"
    counts = LQ.conv_turn_counts(lake)
    ent = LQ.conv_role_entropy(lake)
    eng = LQ.conv_engagement_score(lake)
    out = counts.merge(ent, on="conv_id").merge(eng, on="conv_id")
    return out.sort_values("conv_id").reset_index(drop=True)


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _catalog().items() if sql}
