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
RESHARD_MARKER = "_reshard_commit.json"


def shard_dir(lake_dir: str | Path, shard: int) -> Path:
    return Path(lake_dir) / f"shard={shard:05d}"


def manifest_path(lake_dir: str | Path, shard: int) -> Path:
    return Path(lake_dir) / MANIFEST_DIR / f"shard-{shard:05d}.json"


def reshard_marker(lake_dir: str | Path) -> dict | None:
    """The pending-reshard commit marker, if a committed-but-not-yet-
    finalized shard-count change exists (``replay.reshard``). While it
    exists, the staged manifest set under ``_reshard-{commit}/`` IS
    the committed state; the next writer finalizes the swap."""
    p = Path(lake_dir) / MANIFEST_DIR / RESHARD_MARKER
    try:
        with open(p) as f:
            return json.load(f)
    except FileNotFoundError:
        # absent — or unlinked by a concurrent finalize between a
        # caller's exists() probe and here; either way: no pending swap
        return None


def reshard_staging_dir(lake_dir: str | Path, commit_id: str) -> Path:
    return Path(lake_dir) / MANIFEST_DIR / f"_reshard-{commit_id}"


def lake_meta(lake_dir: str | Path) -> dict:
    """``_lake.json`` resolved through any pending reshard marker —
    the ONE way to learn the lake's effective ``num_shards`` (a
    committed-but-unfinalized reshard already owns the hash layout)."""
    p = Path(lake_dir) / MANIFEST_DIR / "_lake.json"
    meta: dict = {}
    if p.exists():
        with open(p) as f:
            meta = json.load(f)
    marker = reshard_marker(lake_dir)
    if marker is not None:
        meta["num_shards"] = marker["to"]
    return meta


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
    marker = reshard_marker(lake_dir)
    if marker is not None:
        if shard >= marker["to"]:
            return None  # shard doesn't exist under the committed layout
        sp = reshard_staging_dir(lake_dir, marker["commit"]) / f"shard-{shard:05d}.json"
        try:
            with open(sp) as f:
                return json.load(f)
        except FileNotFoundError:
            pass  # already moved into place by a (possibly racing)
            # finalize — the main-dir copy below is the same content
    p = manifest_path(lake_dir, shard)
    try:
        with open(p) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def read_all_manifests(lake_dir: str | Path) -> dict[int, dict]:
    """Every shard's current manifest. If a reshard marker exists, the
    committed state is the STAGED set: staged manifests win, main-dir
    manifests fill in only for shards a partial finalize already moved
    (each move is one atomic rename, so per shard exactly one of the
    two exists with the new content), and shards ≥ ``to`` are dead.
    This makes readers correct through every crash point of the
    finalize sequence without writing anything."""
    mdir = Path(lake_dir) / MANIFEST_DIR
    out: dict[int, dict] = {}
    if not mdir.exists():
        return out
    # every open tolerates FileNotFoundError: a CONCURRENT finalize
    # moves staged files / unlinks dead manifests between our glob and
    # open, and each move is an atomic rename — the main-dir glob runs
    # after the staged loop, so a file that vanished from staging is
    # picked up at its destination (lock-free readers stay exact)
    marker = reshard_marker(lake_dir)
    if marker is not None:
        sdir = reshard_staging_dir(lake_dir, marker["commit"])
        if sdir.exists():
            for p in sorted(sdir.glob("shard-*.json")):
                try:
                    with open(p) as f:
                        m = json.load(f)
                except FileNotFoundError:
                    continue
                out[m["shard"]] = m
        for p in sorted(mdir.glob("shard-*.json")):
            try:
                with open(p) as f:
                    m = json.load(f)
            except FileNotFoundError:
                continue
            if m["shard"] < marker["to"] and m["shard"] not in out:
                out[m["shard"]] = m
        return out
    for p in sorted(mdir.glob("shard-*.json")):
        try:
            with open(p) as f:
                m = json.load(f)
        except FileNotFoundError:
            continue
        out[m["shard"]] = m
    return out


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
        try:
            os.ftruncate(fd, 0)
            os.write(
                fd,
                json.dumps(
                    {"pid": os.getpid(), "ts": time.time(), "token": self.token}
                ).encode(),
            )
        except OSError:
            # e.g. ENOSPC: close (releasing the flock) before raising,
            # or this process would hold the lake lock forever
            os.close(fd)
            raise
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

    def check(self) -> None:
        """Fencing probe (no-op): holding the flock IS the single-node
        exclusivity guarantee — the kernel revokes it only at process
        death, at which point no commit can follow anyway."""


class LakeLockedError(RuntimeError):
    pass


class LeaseFencedError(RuntimeError):
    """A writer's lease expired (or was taken over) before its commit
    point — committing now could interleave with the new holder."""


class LeaseLock:
    """Lease-based exclusive writer lock — the multi-node variant of
    ``LakeLock``. ``flock`` state lives in one node's kernel; on a
    cluster the lock must live in the shared store the lake itself
    lives on. This implementation uses only primitives any shared
    POSIX-ish store provides (exclusive create, atomic replace, read),
    so it runs — and is tested — single-node, and maps 1:1 onto a
    conditional-put object store.

    Protocol:

    * Lease state is an epoch-numbered file
      ``_manifests/_lease-{epoch:010d}.json`` holding
      ``{epoch, holder, pid, heartbeat_ts, ttl_s}``. Epochs only ever
      increase — the epoch IS the fencing token.
    * **Acquire**: read the max-epoch lease. A heartbeat younger than
      its ttl → ``LakeLockedError`` (live holder). Otherwise claim by
      O_EXCL-creating epoch+1: exclusive create is the CAS, exactly
      one contender wins, losers get ``LakeLockedError``. Superseded
      epoch files are GC'd on acquire; release never unlinks (epoch
      monotonicity must survive clean releases), it just zeroes the
      heartbeat so the next acquirer need not wait out the ttl.
    * **Heartbeat**: a daemon thread atomically rewrites the lease
      with a fresh ``heartbeat_ts`` every ttl/3 (disable with
      ``auto_heartbeat=False`` — how tests simulate a stalled zombie).
    * **Fencing**: ``check()`` re-reads the lease directory — a higher
      epoch, or our own lease past its ttl, raises
      ``LeaseFencedError``. ``replay``/``compact`` call it at the
      commit point, immediately before the manifest writes, so a
      zombie that slept past its ttl cannot commit over the new
      holder's state. The check-to-write window is not zero on plain
      files; a store with conditional put closes it by validating the
      epoch token ON the manifest write itself — manifest-last plus
      LWW idempotence bounds the damage to a re-mergeable duplicate
      run in the meantime.
    """

    def __init__(self, lake_dir, ttl_s: float = 60.0, auto_heartbeat: bool = True):
        self.dir = Path(lake_dir) / MANIFEST_DIR
        self.ttl_s = float(ttl_s)
        self.auto_heartbeat = auto_heartbeat
        self.epoch: int | None = None
        self.path: Path | None = None
        self._hb_stop = None
        self._hb_thread = None

    def _scan(self) -> tuple[int, dict | None]:
        mx, rec = -1, None
        for p in self.dir.glob("_lease-*.json"):
            try:
                e = int(p.stem.split("-")[1])
            except (IndexError, ValueError):
                continue
            if e > mx:
                try:
                    rec = json.loads(p.read_text())
                except (OSError, ValueError):
                    # the O_EXCL create and the record write are two
                    # steps: an empty/partial newest lease is a holder
                    # mid-acquire, NOT an expired one — treat it as
                    # live since the file's mtime so a contender can't
                    # fence a holder that acquired milliseconds ago
                    try:
                        beat = p.stat().st_mtime
                    except OSError:
                        beat = 0.0
                    rec = {"heartbeat_ts": beat, "holder": "initializing"}
                mx = e
        return mx, rec

    def _rec(self) -> dict:
        import socket
        import time

        return {
            "epoch": self.epoch,
            "holder": f"{socket.gethostname()}:{os.getpid()}",
            "pid": os.getpid(),
            "heartbeat_ts": time.time(),
            "ttl_s": self.ttl_s,
        }

    def __enter__(self):
        import time

        self.dir.mkdir(parents=True, exist_ok=True)
        mx, rec = self._scan()
        if rec is not None:
            age = time.time() - rec.get("heartbeat_ts", 0)
            if age < rec.get("ttl_s", self.ttl_s):
                raise LakeLockedError(
                    f"lake lease epoch {mx} held by {rec.get('holder')} "
                    f"(heartbeat {age:.1f}s ago, ttl {rec.get('ttl_s')}s)"
                )
        self.epoch = mx + 1
        self.path = self.dir / f"_lease-{self.epoch:010d}.json"
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            self.epoch = self.path = None
            raise LakeLockedError(
                "lost the lease-acquire race (another contender claimed "
                "the next epoch first)"
            ) from None
        with os.fdopen(fd, "w") as f:
            json.dump(self._rec(), f)
            f.flush()
            os.fsync(f.fileno())
        # GC only epochs STRICTLY BELOW our own. Unlinking a HIGHER
        # epoch would un-burn it: a contender stalled since before that
        # epoch was claimed could then O_EXCL-create it again and
        # believe itself max — two live holders. (The O_EXCL create is
        # only a CAS while claimed epoch files persist.)
        for p in self.dir.glob("_lease-*.json"):
            try:
                if int(p.stem.split("-")[1]) < self.epoch:
                    p.unlink()
            except (OSError, IndexError, ValueError):
                pass
        # post-create verification: if a higher epoch appeared while we
        # were acquiring (we stalled between scan and create), we are
        # already fenced — fail the acquire instead of running doomed
        mx2, _ = self._scan()
        if mx2 != self.epoch:
            self.epoch = self.path = None
            raise LakeLockedError(
                f"lease epoch superseded during acquire (saw {mx2})"
            )
        if self.auto_heartbeat:
            import threading

            self._hb_stop = threading.Event()

            def beat(stop=self._hb_stop):
                while not stop.wait(self.ttl_s / 3):
                    try:
                        self.heartbeat()
                    except LeaseFencedError:
                        return
                    except OSError:
                        continue  # transient store hiccup: retry next tick

            self._hb_thread = threading.Thread(target=beat, daemon=True)
            self._hb_thread.start()
        return self

    def heartbeat(self) -> None:
        """Refresh our heartbeat_ts (atomic replace). Raises if fenced."""
        self.check()
        atomic_write_json(self._rec(), self.path)

    def check(self) -> None:
        import time

        if self.epoch is None:
            raise LeaseFencedError("lease not held")
        mx, rec = self._scan()
        if mx != self.epoch:
            raise LeaseFencedError(
                f"lease epoch {self.epoch} fenced by epoch {mx} "
                f"(holder {(rec or {}).get('holder')})"
            )
        age = time.time() - (rec or {}).get("heartbeat_ts", 0)
        if age >= (rec or {}).get("ttl_s", self.ttl_s):
            raise LeaseFencedError(
                f"own lease epoch {self.epoch} expired {age - self.ttl_s:.1f}s "
                "ago; a new holder may claim it at any moment"
            )

    def __exit__(self, *exc):
        if self._hb_stop is not None:
            self._hb_stop.set()
            # join the beat thread so an in-flight heartbeat cannot
            # overwrite the zeroed release record (which would make the
            # released lease look live for a full ttl), or race the
            # path=None teardown below
            t = getattr(self, "_hb_thread", None)
            if t is not None:
                t.join(timeout=self.ttl_s)
        if self.epoch is None:
            return
        try:
            rec = self._rec()
            rec["heartbeat_ts"] = 0  # released: next acquirer skips the ttl wait
            mx, _ = self._scan()
            if mx == self.epoch:  # don't clobber a successor's lease
                atomic_write_json(rec, self.path)
        except OSError:
            pass
        finally:
            self.epoch = self.path = None
