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
    keys: list[str],
) -> ray.data.Dataset:
    """Add a ``window_start`` column = ts truncated to the window size
    (``every`` ∈ {'hour','day','minute'}); caller aggregates on
    ``keys + ['window_start']``."""

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
