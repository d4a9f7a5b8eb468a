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

    O_EXCL lock file under _manifests/; contains pid + timestamp + a
    unique token. A lock is broken ONLY when its holder pid is provably
    dead (same-host liveness probe) or the file is unreadable and past
    ``stale_s`` — a merely SLOW writer (>1h replays are plausible at
    the 10^10-event posture) keeps its lock, so a second writer can
    never GC the first one's not-yet-manifested files out from under
    it. ``__exit__`` unlinks the lock only while it still carries this
    holder's token, so a writer whose lock was legitimately broken
    cannot delete the new holder's lock on the way out. (Single-node
    semantics; on a multi-node cluster this becomes a lease in a
    shared store.) Raises ``LakeLockedError`` on live contention.
    """

    def __init__(self, lake_dir, stale_s: float = 3600.0):
        self.path = Path(lake_dir) / MANIFEST_DIR / "_replay.lock"
        self.stale_s = stale_s
        self.token = uuid.uuid4().hex

    @staticmethod
    def _pid_alive(pid) -> bool:
        if not isinstance(pid, int) or pid <= 0:
            return False
        try:
            os.kill(pid, 0)
            return True
        except ProcessLookupError:
            return False
        except PermissionError:
            return True  # exists, owned by someone else

    def __enter__(self):
        import time

        self.path.parent.mkdir(parents=True, exist_ok=True)
        for _ in range(3):
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    json.dump(
                        {"pid": os.getpid(), "ts": time.time(), "token": self.token}, f
                    )
                return self
            except FileExistsError:
                try:
                    with open(self.path) as f:
                        held = json.load(f)
                    age = time.time() - held.get("ts", 0)
                except (OSError, ValueError):
                    held, age = {}, self.stale_s + 1
                if self._pid_alive(held.get("pid")):
                    raise LakeLockedError(
                        f"lake is locked by live pid {held.get('pid')} "
                        f"({age:.0f}s ago); concurrent replay/compact refused"
                    )
                if held and age <= self.stale_s and "pid" in held:
                    # dead holder: break immediately
                    pass
                elif age <= self.stale_s:
                    raise LakeLockedError(
                        "lake lock unreadable and not yet stale; refusing"
                    )
                try:
                    self.path.unlink()
                except OSError:
                    pass
        raise LakeLockedError("could not acquire lake lock")

    def __exit__(self, *exc):
        try:
            with open(self.path) as f:
                held = json.load(f)
            if held.get("token") != self.token:
                return  # our lock was broken; don't delete the new holder's
        except (OSError, ValueError):
            return
        try:
            self.path.unlink()
        except OSError:
            pass


class LakeLockedError(RuntimeError):
    pass
