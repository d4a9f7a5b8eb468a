"""Driver-side oracle replay of a WAL (pandas/duckdb, single process).

The oracle defines the correctness contract (BASELINE.md): sort the
full log by ``(ts, op_seq)``, keep the last event per
``(conv_id, turn_idx)``, drop keys whose last op is ``D``, and order the
final table by ``(conv_id, turn_idx)``. The Ray engine's committed lake
state must match this byte-for-byte on the F1 columns.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .schema import EVENT_SCHEMA, TRANSCRIPT_SCHEMA, conform


def read_wal_unified(wal_dir: str | Path) -> pa.Table:
    """Read every segment and conform to the unified event schema
    (null-filling the late-added ``tool`` column)."""
    paths = sorted(Path(wal_dir).glob("seg-*.parquet"))
    tables = [conform(pq.read_table(p), EVENT_SCHEMA) for p in paths]
    return pa.concat_tables(tables)


def oracle_final_state(wal_dir: str | Path) -> pa.Table:
    """Replay the log in one process; returns the final transcript table
    (TRANSCRIPT_SCHEMA, sorted by (conv_id, turn_idx))."""
    log = read_wal_unified(wal_dir)
    order = pc.sort_indices(
        log,
        sort_keys=[("ts", "descending"), ("op_seq", "descending")],
    )
    log = log.take(order)
    keys = log.select(["conv_id", "turn_idx"]).to_pandas()
    first = ~keys.duplicated().values  # newest revision per key
    log = log.filter(pa.array(first))
    log = log.filter(pc.not_equal(log["op"], pa.scalar("D")))
    log = log.select([f.name for f in TRANSCRIPT_SCHEMA]).cast(TRANSCRIPT_SCHEMA)
    order = pc.sort_indices(
        log, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return log.take(order)
