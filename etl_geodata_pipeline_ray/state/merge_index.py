"""LWW merge state: the per-shard delta index applied during replay.

``ShardMerger`` is the stateful core of the merge stage (SURVEY §2.3
ST1 analog — the reference builds a networkx graph once per run at
``generate_h3_advanced_maps.py:350-385`` and probes it per row; here the
once-per-task state is the shard's base table + an accumulating
memtable of deltas, LSM-style). All operations are vectorized Arrow —
no Python row loops; ``text`` stays ``large_string`` and is never
copied into Python objects.

LWW rule (SURVEY §2.7 D1/O3 translation): per ``(conv_id, turn_idx)``
keep the event with max ``(ts, op_seq)``. Deletes are retained as
tombstones (op == 'D') so a stale update re-delivered after a delete —
e.g. a duplicate replayed in a later commit — cannot resurrect the row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..cdc.schema import LWW_ORDER, MERGE_KEY

# Fixed 16-byte key → deterministic across processes and runs (siphash).
_HASH_KEY = "graftcdc-hashkey"


def hash_shard(conv_ids: pa.Array | np.ndarray, num_shards: int) -> np.ndarray:
    """Deterministic vectorized hash of conv_id → shard in [0, S)."""
    if isinstance(conv_ids, (pa.Array, pa.ChunkedArray)):
        conv_ids = conv_ids.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(conv_ids, dtype=object), hash_key=_HASH_KEY)
    return (h % np.uint64(num_shards)).astype(np.int64)


def lww_dedup(table: pa.Table) -> pa.Table:
    """Keep the newest revision per merge key; retains tombstones.

    Sort by (ts, op_seq) descending, then keep the first occurrence of
    each (conv_id, turn_idx). Only the small key columns are converted
    to pandas for the duplicate mask; payload columns stay Arrow.
    """
    if table.num_rows == 0:
        return table
    order = pc.sort_indices(
        table, sort_keys=[(c, "descending") for c in LWW_ORDER]
    )
    table = table.take(order)
    keys = table.select(MERGE_KEY).to_pandas()
    first = ~keys.duplicated().values
    return table.filter(pa.array(first))


def sort_by_key(table: pa.Table) -> pa.Table:
    order = pc.sort_indices(
        table, sort_keys=[(c, "ascending") for c in MERGE_KEY]
    )
    return table.take(order)


class ShardMerger:
    """Merge state for one shard (or one salted sub-keyspace of it).

    ``base`` is the committed LWW state (with tombstones); ``apply``
    folds delta batches into the memtable; ``finish`` returns the new
    committed state sorted by (conv_id, turn_idx).
    """

    def __init__(self, base: pa.Table | None):
        self.base = base
        self.memtable: list[pa.Table] = []

    def apply(self, delta: pa.Table) -> None:
        # Dedup within the batch first — shrinks the memtable footprint
        # before the final merge (partial-aggregation shape, SURVEY A-ops).
        self.memtable.append(lww_dedup(delta))

    def finish(self) -> pa.Table:
        parts = list(self.memtable)
        if self.base is not None and self.base.num_rows:
            parts.append(self.base)
        if not parts:
            return None
        merged = lww_dedup(pa.concat_tables(parts, promote_options="permissive"))
        return sort_by_key(merged)
