"""Grouped aggregates beyond the built-ins: entropy, distinct-count,
weighted mean, histograms, composite scores (SURVEY §2.5 A1-A13).

Strategy at scale: pre-aggregate inside ``map_batches`` (emit one
partial row per key per batch), then run the shuffle-side
``groupby`` over the much smaller partials — the combiner pattern the
reference never needed single-node but 100 TB requires.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def grouped_value_counts(
    ds: ray.data.Dataset, group: str, value: str, count_name: str = "cnt"
) -> ray.data.Dataset:
    """(group, value) → count, with per-batch partial counting before
    the shuffle (A4; reference ``value_counts()``
    ``process_layers.py:207``)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group, value]).to_pandas()
        out = df.groupby([group, value], dropna=False).size().reset_index(name=count_name)
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow").groupby([group, value]).sum(
        count_name
    )


def shannon_entropy(
    ds: ray.data.Dataset,
    group: str,
    value: str,
    output: str = "entropy",
    ndigits: int = 4,
    base: str = "e",
) -> ray.data.Dataset:
    """Per-group Shannon entropy of the ``value`` distribution (A5;
    reference ``stuttgart_maps_all.py:618-625``). Two-phase: partial
    (group,value) counts, then a tiny per-group entropy pass."""
    from .bucketed import bucketed_apply

    log = np.log if base == "e" else np.log2

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group, value]).to_pandas()
        out = df.groupby([group, value], dropna=False).size().reset_index(name="cnt")
        return pa.Table.from_pandas(out, preserve_index=False)

    def ent(g: pd.DataFrame) -> pd.DataFrame:
        # merge partial counts AND compute entropy in one bucket kernel
        # (single shuffle; vectorized across all groups in the bucket)
        g = g.groupby([group, value], dropna=False, as_index=False)["cnt"].sum()
        tot = g.groupby(group)["cnt"].transform("sum").to_numpy(dtype=np.float64)
        p = g["cnt"].to_numpy(dtype=np.float64) / tot
        g = g.assign(_plogp=-p * log(p))
        out = g.groupby(group, as_index=False)["_plogp"].sum()
        out[output] = (out["_plogp"] + 0.0).round(ndigits)
        return out[[group, output]]

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_apply(partials, [group], ent, n_buckets=16)


def distinct_count(
    ds: ray.data.Dataset, group: str, value: str, output: str = "n_distinct"
) -> ray.data.Dataset:
    """Exact distinct-count per group (A3; reference ``nunique()``
    ``comprehensive_maps_stuttgart.py:357-360``): dedup (group,value)
    pairs via partial counts, then count per group."""
    from .bucketed import bucketed_apply

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group, value]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def cnt(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates().groupby(group, as_index=False).size()
        return out.rename(columns={"size": output})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_apply(partials, [group], cnt, n_buckets=16)


def weighted_mean(
    ds: ray.data.Dataset,
    group: str,
    value: str,
    weight: str,
    output: str = "wmean",
    ndigits: int = 4,
) -> ray.data.Dataset:
    """Σwx/Σw per group via partial sums (A6; reference
    ``np.average(..., weights=pop)`` ``make_maps.py:192-201``)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group, value, weight]).to_pandas()
        df["_wx"] = df[value] * df[weight]
        out = df.groupby(group).agg(_wx=("_wx", "sum"), _w=(weight, "sum")).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    summed = partials.groupby(group).sum(["_wx", "_w"])

    def finish(batch: pa.Table) -> pa.Table:
        wx = batch["sum(_wx)"].to_numpy(zero_copy_only=False)
        w = batch["sum(_w)"].to_numpy(zero_copy_only=False)
        out = np.round(wx / w, ndigits)
        return pa.table({group: batch[group], output: pa.array(out)})

    return summed.map_batches(finish, batch_format="pyarrow")
