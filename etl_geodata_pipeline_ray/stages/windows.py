"""Windowed aggregates over the ``events`` stream table.

Ray Data has no event-time windowing; the reference has none either
(SURVEY §2.9). These implement the batch-replay equivalents: tumbling
windows are a truncate-then-groupby (pure relational), session windows
need per-key ordered state → ``groupby(key).map_groups`` over the
ts-sorted group (ordering assumption: one group = one key, sorted
in-task; documented per the guide's streaming-shaped pattern).
"""

from __future__ import annotations

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

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        ts = g[ts_col]
        gap = ts.diff().dt.total_seconds().fillna(0.0)
        sid = (gap > gap_seconds).cumsum()
        out = g.groupby(sid).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        )
        out[key] = g[key].iloc[0]
        return out.reset_index(drop=True)[[key, "session_start", "session_end", "n_events"]]

    return ds.groupby(key).map_groups(sessions, batch_format="pandas")
