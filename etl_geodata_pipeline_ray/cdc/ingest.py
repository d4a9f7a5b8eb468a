"""Dataset → lake upsert: commit any Ray Dataset through the engine.

``upsert_dataset`` is the bulk-load / programmatic-upsert surface: a
``ray.data.Dataset`` of transcript rows (or full change events) is
conformed to the event envelope, staged as offset-named segments in
the lake's OWN ``_ingest`` stream directory, and committed by the
standard ``replay`` — same lock, same manifests-then-log commit
protocol, same LWW semantics, same crash story: a crash after
publication leaves published-but-uncommitted segments that the next
upsert (or an explicit ``replay(lake/_ingest, lake)``) commits; a
crash BEFORE publication leaves only ``.staging-*`` scratch, which is
never published (unique per run) and is reclaimed by ``gc_ingested``.
Concurrent upserts are safe: a blocking per-stream flock serializes
base-offset claim → stage → publish, so each upsert carries a distinct
auto ``op_seq`` (its base offset) and the later-published upsert
deterministically wins same-``ts`` LWW ties; exclusive hard links are
a second line of defense against any non-locking writer.

A lake tails exactly ONE stream (segment names are stream offsets —
``replay``'s ``wal_id`` guard). Upsert lakes therefore tail their own
``_ingest`` dir; calling ``upsert_dataset`` on a lake that tails an
external WAL raises rather than risking offset collisions.

Reference parity: this is the engine-ingest analog of the reference's
load-a-GeoDataFrame-into-the-warehouse step
(``scripts/process_layers.py:238-252`` write side), expressed through
the commit protocol instead of an in-place overwrite.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa

import ray.data

from . import manifest as mf
from .replay import _committed_segment_names, commit_log, replay
from .schema import EVENT_SCHEMA, conform

_INGEST = "_ingest"


def _next_offset(lake_dir: Path, stream: Path) -> int:
    """First free stream offset: above every segment ever committed to
    this lake AND everything currently staged (an earlier crashed
    upsert may have staged-but-uncommitted segments)."""
    base = 0
    manifests = mf.read_all_manifests(lake_dir)
    num_shards = mf.lake_meta(lake_dir).get("num_shards", len(manifests))
    for name in _committed_segment_names(lake_dir, manifests, num_shards):
        base = max(base, mf.segment_offset(name) + 1)
    for p in stream.glob("seg-*.parquet"):
        base = max(base, mf.segment_offset(p) + 1)
    return base


def upsert_dataset(
    ds: ray.data.Dataset,
    lake_dir: str | Path,
    num_shards: int = 32,
    mode: str = "append",
    op: str = "U",
    lock_wait_s: float | None = 60.0,
    **replay_kw,
) -> dict:
    """Commit ``ds`` into the lake as one logical WAL slice.

    ``ds`` must carry the merge key + LWW stamp (``conv_id``,
    ``turn_idx``, ``ts``); ``role``/``text``/``tool`` are null-filled
    when absent, ``op`` defaults to the given code (``"U"`` upsert —
    pass rows with their own ``op`` column to mix in deletes), and
    ``op_seq`` defaults to the slice's base offset. Within one upsert,
    two revisions of the SAME key with the SAME ``ts`` (and no caller
    ``op_seq``) resolve arbitrarily — give revisions distinct ``ts``
    or explicit ``op_seq`` when that matters. Returns the replay
    stats dict.
    """
    lake_dir = Path(lake_dir)
    stream = lake_dir / _INGEST
    meta_path = lake_dir / mf.MANIFEST_DIR / "_lake.json"
    if meta_path.exists():
        import json

        with open(meta_path) as f:
            wal_id = json.load(f).get("wal_id")
        if wal_id not in (None, str(stream.resolve())):
            raise ValueError(
                f"lake {lake_dir} tails WAL stream {wal_id!r}; "
                "upsert_dataset is for lakes fed through their own "
                "_ingest stream — replay new segments into that WAL "
                "instead (segment names are stream offsets and would "
                "collide)."
            )

    stream.mkdir(parents=True, exist_ok=True)

    need = {"conv_id", "turn_idx", "ts"}
    have = set(ds.schema().names)
    if not need <= have:
        raise ValueError(
            f"upsert dataset must carry {sorted(need)}; missing "
            f"{sorted(need - have)}"
        )

    import fcntl
    import os
    import uuid

    # Serialize base-offset claim → stage → publish under a BLOCKING
    # stream lock: each upsert's auto-filled op_seq is its claimed base
    # offset, and lock order = base order = publication order, so when
    # two upserts touch the same key at the same ts, the LATER-
    # PUBLISHED one deterministically wins the LWW tie. Without this,
    # two concurrent upserts could both read the same base before
    # either published and their cross-upsert tie would resolve
    # arbitrarily. flock auto-releases at process death (no stale-lock
    # protocol); only upserts contend here — the lake's wal_id guard
    # above keeps external WAL writers out of this stream.
    lock_fd = os.open(stream / ".upsert.lock", os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(lock_fd, fcntl.LOCK_EX)
        base = _next_offset(lake_dir, stream)

        def to_events(t: pa.Table) -> pa.Table:
            if "op" not in t.column_names:
                t = t.append_column(
                    "op", pa.array([op] * t.num_rows, pa.string())
                )
            if "op_seq" not in t.column_names:
                t = t.append_column(
                    "op_seq", pa.nulls(t.num_rows, pa.int64()).fill_null(base)
                )
            return conform(t, EVENT_SCHEMA)

        # UNIQUE staging dir: a crashed upsert's leftovers (possibly
        # torn files) can never be published by a later run
        staging = stream / f".staging-{uuid.uuid4().hex}"
        ds.map_batches(to_events, batch_format="pyarrow").write_parquet(
            str(staging)
        )
        # offset-name the staged files (replay treats names as the
        # stream's ordered offsets; any monotone unique ints work).
        # Publication is an EXCLUSIVE hard link: os.link fails if the
        # target exists, so even a non-locking writer that raced to
        # the same offset can never be clobbered — the loser just
        # probes the next offset. The link+unlink pair publishes only
        # complete files (write_parquet finished above), so replay
        # never sees a half-written segment.
        nxt = base
        for p in sorted(staging.glob("*.parquet")):
            while True:
                target = stream / f"seg-{nxt:012d}.parquet"
                try:
                    os.link(p, target)
                except FileExistsError:
                    nxt += 1
                    continue
                os.unlink(p)
                nxt += 1
                break
        staging.rmdir()
    finally:
        os.close(lock_fd)  # releases the flock

    import time

    deadline = None if lock_wait_s is None else time.monotonic() + lock_wait_s
    while True:
        try:
            return replay(
                stream, lake_dir, num_shards=num_shards, mode=mode, **replay_kw
            )
        except mf.LakeLockedError:
            if deadline is not None and time.monotonic() >= deadline:
                raise mf.LakeLockedError(
                    "upsert published its segments but could not take the "
                    f"lake lock within {lock_wait_s}s; the rows are staged "
                    "exactly-once — the next replay/upsert of this lake "
                    "commits them (do NOT re-call upsert_dataset with the "
                    "same rows: that would stage a duplicate copy)"
                ) from None
            time.sleep(0.05)


def gc_ingested(lake_dir: str | Path) -> int:
    """Unlink committed segments from the ``_ingest`` stream dir (the
    wave pattern: the stream never co-resides with the lake), plus any
    crashed upserts' abandoned ``.staging-*`` scratch dirs. Takes the
    per-stream upsert flock NON-blocking: an active upsert's staging
    dir is indistinguishable from an abandoned one, so on live
    contention the sweep is skipped (returns 0) rather than destroying
    in-flight staged rows. Published-but-uncommitted segments always
    stay."""
    import fcntl
    import os
    import shutil

    lake_dir = Path(lake_dir)
    stream = lake_dir / _INGEST
    if not stream.exists():
        return 0
    fd = os.open(stream / ".upsert.lock", os.O_CREAT | os.O_RDWR, 0o644)
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            return 0  # live upsert: its own completion handles scratch
        committed = {
            n for rec in commit_log(lake_dir) for n in rec.get("segments") or ()
        }
        removed = 0
        for p in stream.glob("seg-*.parquet"):
            if p.name in committed:
                p.unlink()
                removed += 1
        for d in stream.glob(".staging-*"):
            shutil.rmtree(d, ignore_errors=True)
            removed += 1
        return removed
    finally:
        os.close(fd)
