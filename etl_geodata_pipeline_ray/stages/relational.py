"""Relational operators: joins, dedup-by-key, top-k, normalization.

Each operator mirrors a reference capability (SURVEY §2.4-§2.7) but is
expressed Ray-Data-first: broadcast the small side of a join
(reference does driver-side pandas merges of small dims,
``population_pipeline_stuttgart.py:100``), hash-partition the big
joins (reference's spatial point-in-polygon joins,
``make_maps.py:116-118``), and two-phase global statistics
(reference's quantile normalization, ``make_maps.py:208-215``).

All per-batch bodies are vectorized (pyarrow.compute / pyarrow Table
joins / numpy); no Python row loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def broadcast_join(
    ds: ray.data.Dataset,
    small: pa.Table,
    keys: list[str],
    join_type: str = "inner",
    right_keys: list[str] | None = None,
) -> ray.data.Dataset:
    """Join a Dataset against a SMALL dimension table without a shuffle.

    The dimension table is put in the object store once (``ray.put``)
    and each map task joins its Arrow batch against it zero-copy
    (pyarrow Acero hash join per batch). Reference analog: district
    KPIs ⋈ boundaries (J3, ``visualization_helpers.py:178``).
    """
    ref = ray.put(small)

    class JoinBatch:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(
                self.small,
                keys=keys,
                right_keys=right_keys or keys,
                join_type=join_type,
            )

    return ds.map_batches(JoinBatch, batch_format="pyarrow", concurrency=(1, 8))


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    right_on: list[str] | None = None,
    join_type: str = "inner",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Large-large equi-join: Ray Data's hash-partitioned join (both
    sides shuffled on the key). Use ``broadcast_join`` whenever one
    side is small — this one is the expensive path (SURVEY §7.3)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
    )


def semi_anti_join(
    ds: ray.data.Dataset,
    key_values: pa.Array | list,
    column: str,
    anti: bool = False,
) -> ray.data.Dataset:
    """Semi/anti join by broadcasting the key set and filtering inside
    map_batches (J7; reference residual selection
    ``stuttgart_comprehensive_script.py:258``)."""
    ref = ray.put(pa.array(key_values))

    def flt(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[column], value_set=ray.get(ref))
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(flt, batch_format="pyarrow")


def latest_per_key(
    ds: ray.data.Dataset,
    keys: list[str],
    order_by: list[str],
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Keep the row with max ``order_by`` per key group — the LWW /
    latest-selection shape (O3; reference latest-year filter
    ``population_pipeline_stuttgart.py:52-53``).

    Two-phase for scale: (1) vectorized within-batch dedup BEFORE the
    shuffle (the combiner — shrinks shuffled rows to ≤ keys-per-batch),
    (2) one shuffle on ``hash(keys) % n_buckets`` and a single
    vectorized keep-last kernel per bucket — NOT one pandas call per
    key group."""
    from .bucketed import bucketed_apply

    def keep_newest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + order_by, kind="stable")
        return g[~g.duplicated(keys, keep="last")]

    partial = ds.map_batches(keep_newest, batch_format="pandas")
    return bucketed_apply(partial, keys, keep_newest, n_buckets=n_buckets)


def topk(ds: ray.data.Dataset, col: str, k: int, descending: bool = True) -> ray.data.Dataset:
    """Top-k = per-block prune to k, then global sort+limit over the
    tiny survivor set (O2; reference ``nlargest(5, ...)``
    ``visualization_helpers.py:593``)."""

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        order = pc.sort_indices(
            batch, sort_keys=[(col, "descending" if descending else "ascending")]
        )
        return batch.take(order[:k])

    return ds.map_batches(prune, batch_format="pyarrow").sort(col, descending=descending).limit(k)


def global_stats(ds: ray.data.Dataset, col: str) -> dict:
    """Single-pass global min/max/sum/count for normalization stages."""
    from ray.data.aggregate import Count, Max, Min, Sum

    row = ds.aggregate(
        Min(col, alias_name="min"),
        Max(col, alias_name="max"),
        Sum(col, alias_name="sum"),
        Count(col, alias_name="n"),
    )
    return dict(row)


def minmax_normalize(
    ds: ray.data.Dataset, col: str, output: str, ndigits: int | None = None
) -> ray.data.Dataset:
    """Two-phase global normalization: aggregate stats, broadcast, then
    a vectorized map (A10; reference ``scale01``
    ``make_maps.py:208-215``). The stats pass streams; only two
    scalars cross back to the driver."""
    st = global_stats(ds, col)
    lo, hi = float(st["min"]), float(st["max"])
    span = (hi - lo) or 1.0

    def norm(batch: pa.Table) -> pa.Table:
        x = pc.divide(pc.subtract(batch[col], pa.scalar(lo)), pa.scalar(span))
        if ndigits is not None:
            x = pc.round(x, ndigits=ndigits)
        return batch.append_column(output, x)

    return ds.map_batches(norm, batch_format="pyarrow")


def add_column_expr(ds: ray.data.Dataset, output: str, fn) -> ray.data.Dataset:
    """Vectorized derived column: ``fn(batch) -> pa.Array`` (M12)."""

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(output, fn(batch))

    return ds.map_batches(add, batch_format="pyarrow")
