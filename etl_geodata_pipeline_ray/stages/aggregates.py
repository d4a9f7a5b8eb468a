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
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    summed = ds.map_batches(partial, batch_format="pyarrow").groupby(
        [group, value]
    ).sum(count_name)

    def rename(t: pa.Table) -> pa.Table:
        # honor the documented count_name contract (Ray's sum() emits
        # 'sum(<col>)')
        return t.rename_columns(
            [count_name if c == f"sum({count_name})" else c for c in t.column_names]
        )

    return summed.map_batches(rename, batch_format="pyarrow")


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
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

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
        # nulls are NOT a distinct value (pandas nunique semantics)
        df = (
            batch.select([group, value])
            .to_pandas()
            .dropna(subset=[value])
            .drop_duplicates()
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

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
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    summed = partials.groupby(group).sum(["_wx", "_w"])

    def finish(batch: pa.Table) -> pa.Table:
        wx = batch["sum(_wx)"].to_numpy(zero_copy_only=False)
        w = batch["sum(_w)"].to_numpy(zero_copy_only=False)
        out = np.round(wx / w, ndigits)
        return pa.table({group: batch[group], output: pa.array(out)})

    return summed.map_batches(finish, batch_format="pyarrow")


def exact_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    n_bins: int = 4096,
    max_driver_values: int = 100_000,
    max_refinements: int = 10,
) -> np.ndarray:
    """EXACT ``quantile_cont`` values without materializing the column
    on the driver (the reference's quantile normalization family,
    ``make_maps.py:208-215``, ``:383-385``, at 100-TB posture).

    Recursive histogram refinement: per-block fixed-range histograms
    (a mergeable sketch — nonzero (bin, count) rows merge with one
    tiny groupby-sum, so ≤ ``n_bins`` rows ever reach the driver)
    locate the bin holding each target rank; rank groups whose
    candidate bins are non-adjacent refine independently, so a dense
    value cluster between two quantiles cannot stall convergence. Only
    rows inside candidate bins are pulled, and only once their total
    is ≤ ``max_driver_values``. Interpolation is linear
    (lo + frac·(hi−lo)), matching DuckDB ``quantile_cont`` and
    ``np.quantile``."""
    from .relational import global_stats

    st = global_stats(ds, col)
    n = int(st["n"])
    if n == 0:
        return np.full(len(qs), np.nan)
    lo, hi = float(st["min"]), float(st["max"])
    if lo == hi:
        return np.full(len(qs), lo)

    pos = np.asarray(qs, dtype=np.float64) * (n - 1)
    need_ranks = np.unique(
        np.concatenate([np.floor(pos), np.ceil(pos)]).astype(np.int64)
    )  # global 0-based order statistics required

    order: dict[int, float] = {}

    def _hist(cur_lo: float, cur_hi: float, width: float) -> tuple[int, np.ndarray]:
        def hist(batch: pa.Table) -> pa.Table:
            # bin -1 carries the below-range count so the rank offset
            # is value-based and exactly consistent with this pass's
            # in-range mask
            x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            below = int((x < cur_lo).sum())
            x = x[(x >= cur_lo) & (x <= cur_hi)]
            idx = np.minimum(
                ((x - cur_lo) / width * n_bins).astype(np.int64), n_bins - 1
            )
            b, c = np.unique(idx, return_counts=True)
            if below:
                b = np.concatenate([[-1], b])
                c = np.concatenate([[below], c])
            return pa.table({"bin": pa.array(b), "cnt": pa.array(c.astype(np.int64))})

        counts = (
            ds.map_batches(hist, batch_format="pyarrow")
            .groupby("bin").sum("cnt").to_pandas()
        )
        bm = counts["bin"].to_numpy() == -1
        rank_off = int(counts["sum(cnt)"].to_numpy()[bm].sum())
        full = np.zeros(n_bins, dtype=np.int64)
        full[counts["bin"].to_numpy()[~bm]] = counts["sum(cnt)"].to_numpy()[~bm]
        return rank_off, full

    def _pull(cur_lo, cur_hi, width, b_lo, b_hi, below, ranks):
        def pull(t: pa.Table) -> pa.Table:
            x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            xs = x[(x >= cur_lo) & (x <= cur_hi)]
            idx = np.minimum(
                ((xs - cur_lo) / width * n_bins).astype(np.int64), n_bins - 1
            )
            return pa.table({col: pa.array(xs[(idx >= b_lo) & (idx <= b_hi)])})

        vals = np.sort(
            ds.map_batches(pull, batch_format="pyarrow").to_pandas()[col].to_numpy()
        )
        for r in ranks:
            order[int(r)] = float(vals[int(r) - below])

    def _refine(cur_lo: float, cur_hi: float, ranks: np.ndarray, depth: int) -> None:
        width = (cur_hi - cur_lo) or 1.0
        rank_off, full = _hist(cur_lo, cur_hi, width)
        cum = np.concatenate([[0], np.cumsum(full)])
        local = ranks - rank_off
        bins = np.clip(np.searchsorted(cum, local, side="right") - 1, 0, n_bins - 1)
        # split ranks into groups of adjacent candidate bins (gap > 1
        # bin → independent descent; a dense cluster between quantile
        # targets then never inflates another group's candidate set)
        uniq = np.unique(bins)
        groups, cur = [], [uniq[0]]
        for bv in uniq[1:]:
            if bv - cur[-1] <= 1:
                cur.append(bv)
            else:
                groups.append(cur)
                cur = [bv]
        groups.append(cur)
        for grp in groups:
            b_lo, b_hi = int(grp[0]), int(grp[-1])
            grp_ranks = ranks[np.isin(bins, grp)]
            cand_rows = int(full[b_lo : b_hi + 1].sum())
            if cand_rows <= max_driver_values or b_hi == b_lo or depth + 1 >= max_refinements:
                if cand_rows > max_driver_values and b_hi == b_lo and depth + 1 < max_refinements:
                    # single overfull bin: descend into it WIDENED one
                    # bin each side — the same float-boundary-flip
                    # guard as the multi-bin branch below (a value
                    # binned here can land just outside the exact
                    # edges under a different rounding, and the child
                    # pass would then drop the target rank's value)
                    nl = cur_lo + max(0, b_lo - 1) * width / n_bins
                    nh = cur_lo + min(n_bins, b_hi + 2) * width / n_bins
                    if nh > nl and not (nl <= cur_lo and nh >= cur_hi):
                        _refine(nl, nh, grp_ranks, depth + 1)
                        continue
                _pull(cur_lo, cur_hi, width, b_lo, b_hi, rank_off + int(cum[b_lo]), grp_ranks)
            else:
                # widen one bin each side to absorb float boundary flips
                nl = cur_lo + max(0, b_lo - 1) * width / n_bins
                nh = cur_lo + min(n_bins, b_hi + 2) * width / n_bins
                if nh <= nl or (nl <= cur_lo and nh >= cur_hi):
                    _pull(cur_lo, cur_hi, width, b_lo, b_hi, rank_off + int(cum[b_lo]), grp_ranks)
                else:
                    _refine(nl, nh, grp_ranks, depth + 1)

    _refine(lo, hi, need_ranks, 0)
    out = []
    for p in pos:
        f, c = int(np.floor(p)), int(np.ceil(p))
        vf, vc = order[f], order[c]
        out.append(vf + (p - f) * (vc - vf))
    return np.asarray(out)
