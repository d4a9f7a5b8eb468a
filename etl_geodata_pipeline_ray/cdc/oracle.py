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
    if not tables:  # empty/nonexistent WAL: empty state, not a crash
        return EVENT_SCHEMA.empty_table()
    return pa.concat_tables(tables)


def _validity(log: pa.Table) -> tuple[pa.Array, pa.Array]:
    """(op_ok, key_ok) masks matching the engine's route() rules: op
    must be a known code; (conv_id, turn_idx, ts) must be non-null to
    be routable/mergeable."""
    op_ok = pc.fill_null(
        pc.is_in(log["op"], value_set=pa.array(["I", "U", "D"])), False
    )
    key_ok = pc.and_(
        pc.and_(pc.is_valid(log["conv_id"]), pc.is_valid(log["turn_idx"])),
        pc.is_valid(log["ts"]),
    )
    return op_ok, key_ok


def oracle_quarantine(wal_dir: str | Path) -> pa.Table:
    """Expected dead-letter rows with their ``dlq_reason``, sorted by
    op_seq — the oracle for ``replay``'s quarantine output. Reason
    precedence mirrors route(): an unroutable key wins over a bad op."""
    log = read_wal_unified(wal_dir)
    op_ok, key_ok = _validity(log)
    bad = pc.invert(pc.and_(op_ok, key_ok))
    log = log.filter(bad)
    reason = pc.if_else(
        pc.invert(pc.filter(key_ok, bad)),
        pa.scalar("unroutable_key"),
        pa.scalar("invalid_op"),
    )
    log = log.append_column("dlq_reason", reason)
    # duplicates in the delivered stream quarantine once per delivery;
    # dedup to the logical event for comparison
    df = log.to_pandas().drop_duplicates(subset=["op_seq"]).sort_values("op_seq")
    return pa.Table.from_pandas(df, preserve_index=False).cast(
        pa.schema(list(EVENT_SCHEMA) + [pa.field("dlq_reason", pa.string())])
    )


def oracle_final_state(wal_dir: str | Path) -> pa.Table:
    """Replay the log in one process; returns the final transcript table
    (TRANSCRIPT_SCHEMA, sorted by (conv_id, turn_idx)). Invalid events
    (unknown op / null merge key) are excluded — they quarantine, they
    do not merge."""
    log = read_wal_unified(wal_dir)
    op_ok, key_ok = _validity(log)
    valid = pc.and_(op_ok, key_ok)
    if not pc.all(valid).as_py():
        log = log.filter(valid)
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
