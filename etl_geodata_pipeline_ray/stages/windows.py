"""Windowed aggregates over the ``events`` stream table.

Ray Data has no event-time windowing; the reference has none either
(SURVEY §2.9). These implement the batch-replay equivalents: tumbling
windows are a truncate-then-groupby (pure relational), session windows
need per-key ordered state → ``groupby(key).map_groups`` over the
ts-sorted group (ordering assumption: one group = one key, sorted
in-task; documented per the guide's streaming-shaped pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def tumbling_window(
    ds: ray.data.Dataset,
    ts_col: str,
    every: str,
) -> ray.data.Dataset:
    """Add a ``window_start`` column = ts truncated to the window size
    (``every`` ∈ {'hour','day','minute'}); caller aggregates on
    its keys + ``['window_start']``."""

    def trunc(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], unit=every)
        return batch.append_column("window_start", w)

    return ds.map_batches(trunc, batch_format="pyarrow")


def session_windows(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    gap_seconds: float,
) -> ray.data.Dataset:
    """Per-key session windows: sort the key's events by ts in-task,
    split where the gap exceeds ``gap_seconds``; emits one row per
    session (key, session_start, session_end, n_events)."""

    from .bucketed import bucketed_apply

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every key in the bucket: one sort, one
        # diff, session break where the key changes OR the gap exceeds
        # the threshold, then a C-level two-key groupby.
        # A null ts belongs to NO session (NaT diffs would otherwise
        # emit a garbage (key, NaT, NaT, 1) row per null event); null
        # keys are dropped too — explicitly, not via groupby's silent
        # dropna default.
        g = g[g[ts_col].notna() & g[key].notna()]
        g = g.sort_values([key, ts_col], kind="stable")
        ts = g[ts_col]
        gap = ts.diff().dt.total_seconds().fillna(np.inf)
        new_key = g[key].ne(g[key].shift())
        sid = (new_key | (gap > gap_seconds)).cumsum()
        out = g.assign(_sid=sid).groupby([key, "_sid"], as_index=False).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        )
        return out[[key, "session_start", "session_end", "n_events"]]

    return bucketed_apply(ds, [key], sessions, n_buckets=32)


def hopping_window(
    ds: ray.data.Dataset,
    ts_col: str,
    size_s: int,
    hop_s: int,
    epoch_us: int = 0,
) -> ray.data.Dataset:
    """Hopping (sliding) windows: each event is replicated into every
    window of length ``size_s`` that covers it, windows starting every
    ``hop_s`` seconds from ``epoch_us``. Adds ``window_start``
    (timestamp us); caller aggregates on keys + window_start. Pure
    vectorized repeat/arange expansion per batch — the flat_map shape
    (streaming-window custom operator per the task brief; the
    reference has no windowing, SURVEY §2.9). Fan-out per event =
    ceil(size/hop)."""
    if size_s % hop_s != 0:
        # a ValueError, not an assert: under python -O an assert is
        # stripped and floor(size/hop) windows silently undercount
        # events near window boundaries
        raise ValueError(f"size_s={size_s} must be a multiple of hop_s={hop_s}")
    n_win = size_s // hop_s
    size_us = np.int64(size_s) * 1_000_000
    hop_us = np.int64(hop_s) * 1_000_000

    def expand(batch: pa.Table) -> pa.Table:
        # a null ts belongs to NO window: NaT → int64 wraps to
        # INT64_MIN and would pass the cover test, replicating the row
        # into n_win garbage windows near the int64 boundary
        batch = batch.filter(pc.is_valid(batch[ts_col]))
        ts = batch[ts_col].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        t = ts.astype("datetime64[us]").astype(np.int64) - epoch_us
        # last window covering t starts at floor(t / hop) * hop; the
        # preceding n_win-1 hops may also cover it (window_start > t - size)
        last = (t // hop_us) * hop_us
        starts = last[:, None] - hop_us * np.arange(n_win, dtype=np.int64)[None, :]
        cover = starts > (t[:, None] - size_us)
        idx = np.repeat(np.arange(len(t)), cover.sum(axis=1))
        win = starts[cover] + epoch_us
        out = batch.take(pa.array(idx))
        return out.append_column(
            "window_start",
            pa.array(win.astype("datetime64[us]"), type=pa.timestamp("us")),
        )

    return ds.map_batches(expand, batch_format="pyarrow")
