"""Continuous WAL tailing: poll for new segments, commit each batch.

The batch-replay engine IS the streaming engine here — Ray Data has no
event-time streaming, so "tailing a binlog" is a poll loop where every
iteration is one exactly-once `replay()` commit of whatever segments
appeared since the last one (`mode="append"` keeps per-commit cost
proportional to the new delta). Crash anywhere → rerun `tail()` or
`replay()`; the manifests carry the checkpoint.

Stop conditions (for tests and bounded runs): ``max_commits`` or
``idle_polls`` consecutive empty polls.
"""

from __future__ import annotations

import time
from pathlib import Path

from .manifest import LakeLockedError
from .replay import replay


def tail(
    wal_dir: str | Path,
    lake_dir: str | Path,
    poll_interval_s: float = 1.0,
    idle_polls: int | None = 3,
    max_commits: int | None = None,
    on_commit=None,
    **replay_kw,
) -> list[dict]:
    """Tail ``wal_dir`` until ``idle_polls`` consecutive polls find no
    new committed segments (or ``max_commits`` commits happened).
    Returns the list of non-empty commit stats.

    Producer contract: segments must appear ATOMICALLY (write to a
    temp name, then rename into ``seg-*.parquet``). A poll that races
    a direct in-place write would read a footerless parquet file and
    abort the replay.

    Defaults to ``mode="append"`` (per-commit cost ∝ the new delta —
    the only sane posture for a continuous tail; pass ``mode=`` to
    override). Transient writer-lock contention (a concurrent
    vacuum/compact/upsert holding the lake lock) is treated as an
    empty poll — sleep and retry, never kill the loop — so bounded
    runs (``idle_polls``) still terminate under a stuck writer.
    """
    replay_kw.setdefault("mode", "append")
    commits: list[dict] = []
    idle = 0
    while True:
        _t0 = time.perf_counter()
        try:
            stats = replay(wal_dir, lake_dir, **replay_kw)
        except LakeLockedError:
            idle += 1
            if idle_polls is not None and idle >= idle_polls:
                return commits
            time.sleep(poll_interval_s)
            continue
        # end-to-end commit latency of this poll's batch (bench.py
        # --tail reports its p50/p95 under a live trickling WAL)
        stats["wall_sec"] = round(time.perf_counter() - _t0, 3)
        if stats["committed_segments"] > 0:
            commits.append(stats)
            idle = 0
            if on_commit is not None:
                on_commit(stats)
            if max_commits is not None and len(commits) >= max_commits:
                return commits
        else:
            idle += 1
            if idle_polls is not None and idle >= idle_polls:
                return commits
        time.sleep(poll_interval_s)
