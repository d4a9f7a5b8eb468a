"""Per-shard commit manifests + atomic file commit protocol.

Reference precedent: numbered append-only run dirs + ``run_info.json``
(reference ``scripts/make_maps.py:28-52`` and ``:1159-1176``) — but the
reference overwrites data files in place with no atomicity
(``process_layers.py:252``). Here every data file is written to a temp
path and ``os.replace``d into place, and a shard's manifest (the commit
pointer) is only written AFTER every data file of the commit exists —
manifest-last. A crash leaves either the old manifest (orphan new files
are invisible and GC'd later) or the new one (commit complete), never a
torn table.

Resume = read manifests, diff committed segment names against the WAL
listing, re-apply only what is missing; re-application is harmless
because the merge is LWW-idempotent (tombstones retained).
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifests"


def shard_dir(lake_dir: str | Path, shard: int) -> Path:
    return Path(lake_dir) / f"shard={shard:05d}"


def manifest_path(lake_dir: str | Path, shard: int) -> Path:
    return Path(lake_dir) / MANIFEST_DIR / f"shard-{shard:05d}.json"


def _fsync_dir(d: Path) -> None:
    try:
        fd = os.open(d, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def atomic_write_table(table: pa.Table, dest: Path) -> int:
    """Write parquet via temp file + fsync + atomic rename; returns
    bytes. The data fsync ORDERS data durability before the (also
    fsynced) manifest write — without it a power loss could persist the
    manifest while the files it references are still torn, violating
    the manifest-last invariant."""
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.parent / f".tmp-{uuid.uuid4().hex}-{dest.name}"
    pq.write_table(table, tmp)
    with open(tmp, "rb") as f:
        os.fsync(f.fileno())
    size = tmp.stat().st_size
    os.replace(tmp, dest)
    _fsync_dir(dest.parent)
    return size


def atomic_write_json(obj: dict, dest: Path) -> None:
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.parent / f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, dest)
    _fsync_dir(dest.parent)


def read_manifest(lake_dir: str | Path, shard: int) -> dict | None:
    p = manifest_path(lake_dir, shard)
    if not p.exists():
        return None
    with open(p) as f:
        return json.load(f)


def read_all_manifests(lake_dir: str | Path) -> dict[int, dict]:
    mdir = Path(lake_dir) / MANIFEST_DIR
    out: dict[int, dict] = {}
    if not mdir.exists():
        return out
    for p in sorted(mdir.glob("shard-*.json")):
        with open(p) as f:
            m = json.load(f)
        out[m["shard"]] = m
    return out


def write_manifest(
    lake_dir: str | Path,
    shard: int,
    version: int,
    files: list[str],
    committed_segments: list[str],
    rows: int,
    bytes_: int,
    lineage: list[dict],
) -> dict:
    m = {
        "shard": shard,
        "version": version,
        "files": sorted(files),
        "committed_segments": sorted(committed_segments),
        "rows": rows,
        "bytes": bytes_,
        "lineage": lineage,
    }
    atomic_write_json(m, manifest_path(lake_dir, shard))
    return m


def current_files(lake_dir: str | Path, manifests: dict[int, dict]) -> list[str]:
    lake_dir = Path(lake_dir)
    out = []
    for m in manifests.values():
        out.extend(str(lake_dir / f) for f in m["files"])
    return sorted(out)


def gc_stale_files(lake_dir: str | Path, manifests: dict[int, dict]) -> int:
    """Delete shard data files not referenced by any current manifest
    (old versions, orphans of interrupted commits). Safe because a file
    becomes visible only via a manifest."""
    lake_dir = Path(lake_dir)
    live = {str(lake_dir / f) for m in manifests.values() for f in m["files"]}
    removed = 0
    for p in lake_dir.glob("shard=*/**/*.parquet"):
        if str(p) not in live:
            try:
                p.unlink()
                removed += 1
            except OSError:
                pass
    return removed


def segment_offset(path: str | Path) -> int:
    """``seg-{start:012d}.parquet`` → start offset."""
    name = Path(path).name
    return int(name.split("-")[1].split(".")[0])


class LakeLock:
    """Advisory exclusive lock for replay/compact on one lake.

    ``fcntl.flock(LOCK_EX | LOCK_NB)`` on a persistent lock file under
    ``_manifests/``. The kernel owns the hard guarantees: exclusivity
    across processes AND across fds within one process, and automatic
    release when the holder dies — so a dead writer never blocks the
    lake and there is NO break/steal protocol to race (the previous
    read-liveness-then-unlink scheme let two waiters that both saw a
    dead holder interleave into two live holders). A merely SLOW live
    writer keeps its lock indefinitely (>1h replays are plausible at
    the 10^10-event posture). The lock file is never unlinked —
    unlinking while a holder has the inode flocked would let a new
    acquirer lock a fresh inode at the same path; its JSON body
    (pid/ts/token) is diagnostics only, rewritten by each holder.
    (Single-node semantics; on a multi-node cluster this becomes a
    lease in a shared store.) Raises ``LakeLockedError`` on live
    contention.
    """

    def __init__(self, lake_dir, stale_s: float = 3600.0):
        self.path = Path(lake_dir) / MANIFEST_DIR / "_replay.lock"
        self.stale_s = stale_s  # kept for API compat; flock needs no staleness
        self.token = uuid.uuid4().hex
        self._fd: int | None = None

    def __enter__(self):
        import fcntl
        import time

        self.path.parent.mkdir(parents=True, exist_ok=True)
        fd = os.open(self.path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            try:
                held = json.loads(os.read(fd, 4096).decode() or "{}")
            except (OSError, ValueError):
                held = {}
            finally:
                os.close(fd)
            age = time.time() - held.get("ts", 0)
            raise LakeLockedError(
                f"lake is locked by live pid {held.get('pid')} "
                f"({age:.0f}s ago); concurrent replay/compact refused"
            ) from None
        os.ftruncate(fd, 0)
        os.write(
            fd,
            json.dumps(
                {"pid": os.getpid(), "ts": time.time(), "token": self.token}
            ).encode(),
        )
        self._fd = fd
        return self

    def __exit__(self, *exc):
        import fcntl

        if self._fd is None:
            return
        try:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
        finally:
            os.close(self._fd)
            self._fd = None


class LakeLockedError(RuntimeError):
    pass
