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


def atomic_write_table(table: pa.Table, dest: Path) -> int:
    """Write parquet via temp file + atomic rename; returns bytes."""
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.parent / f".tmp-{uuid.uuid4().hex}-{dest.name}"
    pq.write_table(table, tmp)
    size = tmp.stat().st_size
    os.replace(tmp, dest)
    return size


def atomic_write_json(obj: dict, dest: Path) -> None:
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.parent / f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, dest)


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

    O_EXCL lock file under _manifests/; contains pid + timestamp.
    Stale locks (older than ``stale_s``) are broken — a crashed writer
    must not wedge the lake forever, and the commit protocol is safe
    against the (rare) double-writer this allows: data files only
    become visible via atomic manifest replaces, and the merge is
    LWW-idempotent. Raises ``LakeLockedError`` on live contention.
    """

    def __init__(self, lake_dir, stale_s: float = 3600.0):
        self.path = Path(lake_dir) / MANIFEST_DIR / "_replay.lock"
        self.stale_s = stale_s

    def __enter__(self):
        import time

        self.path.parent.mkdir(parents=True, exist_ok=True)
        for _ in range(2):
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    json.dump({"pid": os.getpid(), "ts": time.time()}, f)
                return self
            except FileExistsError:
                try:
                    with open(self.path) as f:
                        held = json.load(f)
                    age = time.time() - held.get("ts", 0)
                except (OSError, ValueError):
                    held, age = {}, self.stale_s + 1
                if age > self.stale_s:
                    try:
                        self.path.unlink()
                    except OSError:
                        pass
                    continue
                raise LakeLockedError(
                    f"lake is locked by pid {held.get('pid')} "
                    f"({age:.0f}s ago); concurrent replay/compact refused"
                )
        raise LakeLockedError("could not acquire lake lock")

    def __exit__(self, *exc):
        try:
            self.path.unlink()
        except OSError:
            pass


class LakeLockedError(RuntimeError):
    pass
