"""LWW merge state: the per-shard delta index applied during replay.

``ShardMerger`` is the stateful core of the merge stage (SURVEY §2.3
ST1 analog — the reference builds a networkx graph once per run at
``generate_h3_advanced_maps.py:350-385`` and probes it per row; here the
once-per-task state is the shard's base table + an accumulating
memtable of delta runs, LSM-style). All operations are vectorized
Arrow — no Python row loops; ``text`` stays ``large_string`` and is
never copied into Python objects.

LWW rule (SURVEY §2.7 D1/O3 translation): per ``(conv_id, turn_idx)``
keep the event with max ``(ts, op_seq)``. Deletes are retained as
tombstones (op == 'D') so a stale update re-delivered after a delete —
e.g. a duplicate replayed in a later commit — cannot resurrect the row.

Performance shape: ONE composite sort (key asc, ts/op_seq desc) and ONE
``take`` per merge; the newest-revision mask falls out of comparing
consecutive key rows (pure Arrow kernels — benchmarked ~2× faster than
sort-for-LWW + pandas ``duplicated`` + re-sort-for-order, because wide
``large_string`` columns are materialized once, not twice, and no
Python string objects are created for the key comparison).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..cdc.schema import LWW_ORDER, MERGE_KEY

# Fixed 16-byte key → deterministic across processes and runs (siphash).
_HASH_KEY = "graftcdc-hashkey"


def _first_per_key_mask(table: pa.Table) -> pa.Array:
    """Boolean mask keeping the FIRST row of each consecutive merge-key
    run (table must already be sorted by MERGE_KEY). Compares each row
    to its predecessor with Arrow kernels — no Python objects."""
    n = table.num_rows
    if n <= 1:
        return pa.array([True] * n)
    keep = None
    for col_name in MERGE_KEY:
        col = table.column(col_name).combine_chunks()
        neq = pc.invert(pc.equal(col.slice(1), col.slice(0, n - 1)))
        neq = pc.fill_null(neq, True)  # null key != anything
        keep = neq if keep is None else pc.or_(keep, neq)
    if isinstance(keep, pa.ChunkedArray):
        keep = keep.combine_chunks()
    return pa.concat_arrays([pa.array([True]), keep])


def lww_merge_sorted(table: pa.Table) -> pa.Table:
    """One-shot LWW: composite sort (merge key asc, LWW order desc),
    single take, then keep the first row per key run — the newest
    revision — already in final (conv_id, turn_idx) order. Tombstones
    retained."""
    if table.num_rows == 0:
        return table
    order = pc.sort_indices(
        table,
        sort_keys=[(c, "ascending") for c in MERGE_KEY]
        + [(c, "descending") for c in LWW_ORDER],
    )
    table = table.take(order)
    return table.filter(_first_per_key_mask(table))


def lww_dedup(table: pa.Table) -> pa.Table:
    """Newest revision per key (compat wrapper; output sorted by key)."""
    return lww_merge_sorted(table)


def sort_by_key(table: pa.Table) -> pa.Table:
    order = pc.sort_indices(
        table, sort_keys=[(c, "ascending") for c in MERGE_KEY]
    )
    return table.take(order)


class ShardMerger:
    """Merge state for one shard (or one salted sub-keyspace of it).

    ``base`` is the committed LWW state (with tombstones); ``apply``
    appends delta runs to the memtable; ``finish`` merges memtable +
    base with ONE composite sort and returns the new committed state
    sorted by (conv_id, turn_idx)."""

    def __init__(self, base: pa.Table | None):
        self.base = base
        self.memtable: list[pa.Table] = []

    def apply(self, delta: pa.Table) -> None:
        self.memtable.append(delta)

    def finish(self) -> pa.Table | None:
        parts = list(self.memtable)
        if self.base is not None and self.base.num_rows:
            parts.append(self.base)
        if not parts:
            return None
        return lww_merge_sorted(pa.concat_tables(parts, promote_options="permissive"))
