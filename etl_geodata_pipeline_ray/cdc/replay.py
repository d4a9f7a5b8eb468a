"""The CDC replay engine: WAL segments → partitioned Parquet lake.

Ray-Data-first dataflow, LSM-shaped (two stages, no sort shuffle):

  stage A (streamed, no barrier):
    read_parquet(pending segments, grouped by physical schema)
      → map_batches(conform to unified schema)       # schema evolution
      → map_batches(normalize + hash-route)          # add merge_group
      → write_parquet(delta_dir, partition_cols=["merge_group"])
    — the Hive-partitioned write IS the exchange: each shard's delta
    lands as its own sorted-run directory, written concurrently with
    the read under streaming backpressure. Benchmarked 3-4× faster
    than groupby().map_groups' sort shuffle on wide text rows.

  stage B (per-shard compaction fan-out):
    one Ray task per (shard, salt) reads that shard's delta run + its
    committed base files, applies LWW merge (tombstones retained),
    writes the new version atomically, returns commit stats. Raw
    ``@ray.remote`` tasks on purpose: this is a driver-coordinated
    fan-out of independent side-effect writes with a commit barrier —
    the Dataset API adds nothing here (SURVEY §7: "raw tasks only
    where the Dataset API can't express the semantics").

  commit (driver, manifests first, ONE fsynced log append last):
    after ALL stage-B tasks finish, write one manifest per TOUCHED
    shard (version, files, this commit's lineage, row/byte metrics),
    then append the commit record — with its full segment list — to
    the append-only commit log. The log append IS the commit point:
    a crash anywhere before it leaves the segments uncommitted (the
    re-replay is idempotent under LWW) and orphan delta runs / data
    files are GC'd on the next replay. Commit metadata is O(batch),
    written once — never duplicated into all shards' manifests.

Skew defense: salting decisions come from the ACTUAL per-shard delta
sizes (parquet metadata of the partitioned write — free), not a
pre-pass: a shard whose pending delta exceeds ``salt_threshold`` rows
is compacted by k parallel tasks, each owning the sub-keyspace
``hash(conv_id) // num_shards % k == j`` — a conversation never crosses
a salt boundary, so per-conversation turn ordering survives.

Exactly-once: re-applied segments are harmless (LWW + tombstones);
files become visible only via manifests; resume diffs segment names
against the commit log (legacy lakes: against the per-shard lists,
intersected — a missing manifest counts as nothing committed).

Reference parity: stage boundary on durable storage mirrors staging/ →
processed/ (``scripts/process_layers.py:50-52``); manifests mirror
``run_info.json`` (``make_maps.py:1159-1176``) but carry checkpoint
offsets + lineage + metrics and are commit pointers, not logs.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
import warnings
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..state.merge_index import ShardMerger, _HASH_KEY
from . import manifest as mf
from .schema import EVENT_SCHEMA, MERGE_KEY, TRANSCRIPT_SCHEMA, conform, unify

_VALID_OPS = ("I", "U", "D")
_INCOMING = "_incoming"
_QUARANTINE = "quarantine"
# negative merge_group values route to the dead-letter area instead of
# a shard: rows a real binlog tail must not silently drop OR merge
_DLQ_INVALID_OP = -1    # unknown op code
_DLQ_UNROUTABLE = -2    # null conv_id / turn_idx / ts — no merge key
_DLQ_REASON = {_DLQ_INVALID_OP: "invalid_op", _DLQ_UNROUTABLE: "unroutable_key"}


def hash_u64(conv_ids) -> np.ndarray:
    if isinstance(conv_ids, (pa.Array, pa.ChunkedArray)):
        conv_ids = conv_ids.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np.asarray(conv_ids, dtype=object), hash_key=_HASH_KEY)


def shard_of(h: np.ndarray, num_shards: int) -> np.ndarray:
    return (h % np.uint64(num_shards)).astype(np.int64)


def salt_of(h: np.ndarray, num_shards: int, k: int) -> np.ndarray:
    return ((h // np.uint64(num_shards)) % np.uint64(k)).astype(np.int64)


def list_segments(wal_dir: str | Path) -> list[str]:
    return [str(p) for p in sorted(Path(wal_dir).glob("seg-*.parquet"))]


def _committed_segment_names(
    lake_dir: Path, manifests: dict[int, dict], num_shards: int
) -> set[str]:
    """The set of WAL segment names durably committed to this lake.

    Current protocol (round 4): the commit LOG is authoritative — each
    fsynced record carries its commit's full segment list and is
    appended only AFTER every touched shard manifest is durable, so a
    logged segment is committed by definition, and commit metadata is
    written ONCE per commit (O(batch)), not duplicated into all
    ``num_shards`` manifests and rewritten every commit (O(history) ×
    shards — the metadata bottleneck at 10^10-event commit cadence:
    at the 10^9 rung that was ~300 KB × 64 manifests re-serialized
    per commit).

    Legacy lakes recorded the full list in every shard manifest; a
    segment counted as committed only when EVERY shard said so. Those
    frozen lists still count under exactly that intersection rule
    (manifests never append to them again), so mixed lakes union
    both sources."""
    committed: set[str] = set()
    for rec in commit_log(lake_dir):
        committed.update(rec.get("segments") or ())
    if any("committed_segments" in m for m in manifests.values()):
        legacy: set | None = None
        for sh in range(num_shards):
            m = manifests.get(sh)
            s = set(m.get("committed_segments", ())) if m else set()
            legacy = s if legacy is None else legacy & s
            if not legacy:
                break
        committed |= legacy or set()
    return committed


def _pending_segments(segments: list[str], committed: set[str]) -> list[str]:
    """Segments not recorded committed (``_committed_segment_names``)."""
    return [p for p in segments if Path(p).name not in committed]


def _read_unified(pending: list[str]) -> tuple[ray.data.Dataset, pa.Schema]:
    """Read heterogeneous-schema segments as ONE dataset conformed to
    the unified schema — the explicit Arrow schema-reconciliation pass
    (SURVEY §1.3; reference probes/repairs schemas ad hoc,
    ``process_layers.py:260-273``).

    The unified schema is computed driver-side from the parquet footers
    (metadata only) and passed to ONE ``read_parquet`` — the pyarrow
    scanner null-fills late-added columns at the scan, so no per-group
    reads + union (benchmarked 4× slower: the union breaks operator
    fusion). Any residual type widening is conformed per batch
    (zero-copy when types already match)."""
    schemas: dict[bytes, pa.Schema] = {}
    for p in pending:
        s = pq.read_schema(p)
        schemas[s.serialize().to_pybytes()] = s
    unified = unify(list(schemas.values()))
    ds = ray.data.read_parquet(pending, schema=unified)
    if len(schemas) > 1:
        ds = ds.map_batches(
            lambda batch: conform(batch, unified), batch_format="pyarrow"
        )
    return ds, unified


@ray.remote
def _salt_split_task(
    delta_files: list[str], k: int, num_shards: int, out_dir: str
) -> list[list[str]]:
    """Pre-partition a hot shard's delta by salt in ONE pass, so the k
    merge tasks each read only their sub-keyspace (k× → 2× read
    amplification; measured: in-task filtering made salting a net loss
    on fat shards). Streams FILE BY FILE — task memory is bounded by
    one delta file, not the whole hot-shard delta (the single-task
    concat was exactly the memory spike the salting exists to defuse);
    each input file yields up to k per-salt slices, and the merge tasks
    re-read per salt anyway so the extra file count is free."""
    try:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
    except Exception:
        pass
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths: list[list[str]] = [[] for _ in range(k)]
    for i, f in enumerate(delta_files):
        t = pq.read_table(f)
        if "merge_group" in t.column_names:
            t = t.drop_columns(["merge_group"])
        slt = salt_of(hash_u64(t["conv_id"]), num_shards, k)
        order = np.argsort(slt, kind="stable")
        t = t.take(pa.array(order))
        bounds = np.searchsorted(slt[order], np.arange(k + 1))
        for j in range(k):
            lo, hi = int(bounds[j]), int(bounds[j + 1])
            if hi > lo:
                p = out / f"salt-{j:03d}-{i:05d}.parquet"
                pq.write_table(
                    t.slice(lo, hi - lo), p, compression="NONE", use_dictionary=False
                )
                paths[j].append(str(p))
    return paths


# in-memory expansion of a snappy+dictionary lake parquet file once
# decoded to Arrow (text-heavy transcript rows; measured ~2–2.5×,
# padded). Delta runs are written uncompressed/no-dictionary, so their
# in-memory size ≈ on-disk size.
_PARQ_EXPANSION = 3


def _merge_mem_bytes(delta_disk: int, base_disk: int, k: int, max_base_file: int) -> int:
    """Scheduler-visible heap estimate for one merge task, passed as
    Ray's ``memory`` resource so admission is capped by free RAM and
    not just CPU slots (32 CPU-admitted rewrite merges over a lake
    that no longer fits in free memory is a host-OOM, not a slowdown —
    observed at the 3×10^8-event rung). Peak = inputs (this salt's
    kept fraction + one in-flight file) + the merged/sorted output
    copy ≈ 2.2× inputs. Clamped to 70% of the cluster's memory
    resource so a single oversized task degrades to running alone
    instead of never scheduling."""
    base_mem = _PARQ_EXPANSION * (base_disk // max(k, 1) + max_base_file)
    est = int(2.2 * (delta_disk + base_mem))
    try:
        cap = int(ray.cluster_resources().get("memory", 0) * 0.7)
    except Exception:
        cap = 0
    if cap:
        est = min(est, cap)
    return max(est, 256 << 20)


def _file_version(path: str) -> int:
    """Commit-version tier of a lake file ("shard=00001/v000012-s003
    .parquet" → 12): files written by one commit form one tier.
    Parsed up to the salt separator — ``:06d`` is a MINIMUM width, so
    versions past 999,999 (plausible at 10^10-event commit cadence)
    render wider and a fixed [1:7] slice would collapse distinct
    tiers."""
    name = path.rsplit("/", 1)[-1]
    return int(name[1 : name.index("-")])


def _tiered_fold(
    old_recs: list[dict],
    delta_bytes: int,
    k_new: int,
    compact_runs: int,
    ratio: float = 4.0,
) -> tuple[list[dict], list[dict]]:
    """Size-tiered compaction plan for one shard whose run count
    crossed ``compact_runs``: returns ``(fold, keep)`` file records.

    LWW merge is associative, so folding any SUBSET of runs is
    correct; the question is write amplification. The old behavior
    folded everything — O(shard) rewrite every ``compact_runs``
    commits, i.e. the base is re-written over and over as the lake
    grows. Instead, group files by the commit that wrote them (one
    tier per version) and KEEP the dominant tiers: a tier stays out of
    the fold while it is ≥ ``ratio``× everything smaller than it
    (including the incoming delta). Young tiers merge geometrically
    (1st fold ≈ 7 deltas, next ≈ 7+merged, ...) and the base is only
    re-written once the accumulated young data is within ``ratio`` of
    it — amortized O(N log N) bytes written instead of O(N²/8).

    Post-commit run count is forced ≤ ``compact_runs``: if the kept
    tiers alone would exceed the budget (many salted base files), the
    smallest kept tiers are folded too.

    ``delta_bytes`` arrives as the UNCOMPRESSED pre-commit delta run
    (compression="NONE"), while tier sizes are snappy+dictionary lake
    files — compared raw, the delta would weigh ~3× its lake-resident
    size and fold the base earlier than the ratio intends; it is
    normalized by ``_PARQ_EXPANSION`` first."""
    groups: dict[int, list[dict]] = {}
    for f in old_recs:
        groups.setdefault(_file_version(f["path"]), []).append(f)
    sized = sorted(
        ((sum(int(f["bytes"]) for f in g), g) for g in groups.values()),
        key=lambda t: -t[0],
    )
    total = delta_bytes / _PARQ_EXPANSION + sum(b for b, _ in sized)
    keep_groups: list[list[dict]] = []
    kept_files = 0
    for b, g in sized:
        rest = total - b
        if b >= ratio * rest and kept_files + len(g) + k_new <= compact_runs:
            keep_groups.append(g)
            kept_files += len(g)
            total = rest
        else:
            break  # tiers below this are young: fold them all
    keep = [f for g in keep_groups for f in g]
    keep_paths = {f["path"] for f in keep}
    fold = [f for f in old_recs if f["path"] not in keep_paths]
    return fold, keep


# Zone-mapped payload columns: low-cardinality by construction (role
# is an enum, tool a bounded tool-name set, op ∈ {I,U,D}), so a file's
# EXACT distinct-value set is tiny and makes single-column predicate
# satisfiability decidable from the manifest alone — no footer opens.
# A file whose cardinality exceeds the cap records no zone (never
# skipped). Reference analog: scan-level tag filtering at the PBF read
# (reference data_loader.py:100-108) — prune at the source, not after.
_ZONE_COLS = ("role", "tool", "op")
_ZONE_CAP = 64


def _file_zones(t: pa.Table) -> dict:
    """Per-file zones: the manifest-side statistics ``read_lake``
    prunes shards with. ``_ZONE_COLS`` record their exact distinct-
    value set (sound for ANY single-column predicate — post-merge rows
    are a subset of stored rows, values unchanged); ``ts`` records its
    [min, max] range (µs since epoch) for ``ts_range`` time-slice
    reads — the CDC-natural "rows stamped in this window" scan."""
    zones: dict[str, dict] = {}
    for col in _ZONE_COLS:
        if col not in t.column_names or t.num_rows == 0:
            continue
        vals = pc.unique(t[col].combine_chunks())
        pys = vals.to_pylist()
        non_null = [v for v in pys if v is not None]
        if len(non_null) > _ZONE_CAP:
            continue
        zones[col] = {
            "values": sorted(non_null),
            "null": len(non_null) < len(pys) or t[col].null_count > 0,
        }
    if "ts" in t.column_names and t.num_rows:
        mm = pc.min_max(t["ts"])
        lo, hi = mm["min"].value, mm["max"].value
        if lo is not None:
            zones["ts"] = {"min": int(lo), "max": int(hi)}
    if "conv_id" in t.column_names and t.num_rows:
        # [min,max] range over the merge key: point lookups
        # (read_conversation/read_conversations) skip whole files
        # manifest-side — sound even pre-merge on multi-run shards,
        # because a file outside the range holds NO revision of the
        # looked-up key. min_max, not first/last, so soundness never
        # rides the file-sort invariant.
        mm = pc.min_max(t["conv_id"])
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is not None:
            zones["conv_id"] = {"min": lo, "max": hi}
    return zones


def _zone_may_match(zone: dict | None, col: str, predicate) -> bool:
    """False only when NO value in the file's recorded zone can satisfy
    ``predicate`` — a missing zone always may-match."""
    if zone is None:
        return True
    typ = EVENT_SCHEMA.field(col).type
    vals = list(zone.get("values", []))
    pys: list = list(vals)
    if zone.get("null"):
        pys.append(None)
    if not pys:
        return False  # file holds no rows for this column
    probe = pa.table({col: pa.array(pys, type=typ)})
    try:
        return probe.filter(predicate).num_rows > 0
    except Exception:
        return True  # unevaluable predicate: never skip on a guess


def _zone_prunable_col(predicate, pred_cols: set[str]) -> str | None:
    """The single zoned column a payload predicate references, if the
    predicate is eligible for manifest-side pruning."""
    if predicate is None or len(pred_cols) != 1:
        return None
    col = next(iter(pred_cols))
    return col if col in _ZONE_COLS else None


def _ts_bounds_us(ts_range) -> tuple[int, int]:
    """Normalize a ``(lo, hi)`` time-slice (either side may be None =
    unbounded; int = µs since epoch; else anything pyarrow casts to
    timestamp[us]) to inclusive integer µs bounds."""
    lo, hi = ts_range

    def to_us(v, default):
        if v is None:
            return default
        if isinstance(v, (int, np.integer)):
            return int(v)
        return int(pa.scalar(v).cast(pa.timestamp("us")).value)

    return to_us(lo, -(2**62)), to_us(hi, 2**62)


@ray.remote
def _merge_task(
    lake_dir: str,
    shard: int,
    salt: int,
    k: int,
    version: int,
    num_shards: int,
    delta_files: list[str],
    base_files: list[str],
    pre_salted: bool = False,
) -> dict:
    """Stage-B compaction for one (shard, salt) keyspace: delta run +
    base → LWW (tombstones retained) → sorted → atomic write."""
    # one Ray task == one CPU slot: pin Arrow's internal pools so N
    # concurrent merge tasks don't spawn N × os.cpu_count() threads
    # (oversubscription thrashes caches and kills scaling).
    try:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
    except Exception:
        pass
    # salt filters run per FILE, before the concat — peak heap is this
    # task's kept fraction plus one in-flight file, not the whole shard
    # (k salt tasks each scanning the full concatenated base was a k×
    # memory spike; the 3×10^8-event run OOMed exactly there).
    delta = None
    if delta_files:
        tabs = []
        for f in delta_files:
            t = pq.read_table(f)
            if k > 1 and not pre_salted and t.num_rows:
                h = hash_u64(t["conv_id"])
                t = t.filter(pa.array(salt_of(h, num_shards, k) == salt))
            tabs.append(t)
        delta = pa.concat_tables(tabs, promote_options="permissive")
        if "merge_group" in delta.column_names:
            delta = delta.drop_columns(["merge_group"])

    base = None
    if base_files:
        tabs = []
        for f in base_files:
            t = pq.read_table(str(Path(lake_dir) / f))
            # k == 1 owns the whole keyspace: salt_of(·, ·, 1) is
            # identically 0, so filtering would hash a multi-GB base
            # for an all-True mask regardless of how it was salted
            if t.num_rows and k > 1:
                h = hash_u64(t["conv_id"])
                t = t.filter(pa.array(salt_of(h, num_shards, k) == salt))
            tabs.append(t)
        base = pa.concat_tables(tabs, promote_options="permissive")

    if base is not None and delta is not None and base.schema != delta.schema:
        u = unify([base.schema, delta.schema])
        base, delta = conform(base, u), conform(delta, u)

    merger = ShardMerger(base)
    if delta is not None and delta.num_rows:
        merger.apply(delta)
    out = merger.finish()
    if out is None:
        # explicit None checks: an EMPTY typed table is FALSY in
        # pyarrow, and `or` would replace it with a zero-COLUMN table
        # whose schema-less parquet file poisons every later reader
        # (hits when a salt bucket of a skewed shard holds no rows)
        out = delta if delta is not None else base
    if out is None:
        out = EVENT_SCHEMA.empty_table()

    rel = f"shard={shard:05d}/v{version:06d}-s{salt:03d}.parquet"
    nbytes = mf.atomic_write_table(out, Path(lake_dir) / rel)
    return {
        "shard": shard,
        "salt": salt,
        "k": k,
        "version": version,
        "path": rel,
        "rows": out.num_rows,
        "bytes": nbytes,
        "zones": _file_zones(out),
    }


def replay(
    wal_dir: str | Path,
    lake_dir: str | Path,
    num_shards: int = 32,
    salt_threshold: int = 512 * 1024 * 1024,  # bytes of delta run per merge task
    batch_size: int = 65536,
    max_segments: int | None = None,
    mode: str = "rewrite",
    compact_runs: int = 8,
    max_bytes_per_commit: int = 6 << 30,
    retain_versions: int = 2,
    lock_cls=None,
) -> dict:
    """Replay all uncommitted WAL segments into the lake. Idempotent:
    call again after a crash and it resumes from the manifests.

    ``lock_cls`` selects the writer lock: ``mf.LakeLock`` (default;
    single-node flock) or ``mf.LeaseLock`` (epoch-fenced lease, the
    multi-node posture). Either way the lock's ``check()`` runs at
    every commit point, immediately before the manifest writes.

    ``retain_versions`` (pinned in ``_lake.json`` at lake creation,
    like ``num_shards``) keeps that many manifest versions per shard:
    GC never deletes a file referenced by a retained version, so a
    concurrent reader that resolved its file list from the previous
    commit cannot have files unlinked mid-read, and
    ``read_lake(at_commit=...)`` can time-travel to any retained
    commit. ``expire_snapshots`` trims history to reclaim space.

    ``mode="rewrite"`` — every touched shard is fully compacted (delta
    + base → one file per salt). Simple reads; write amplification ∝
    shard size per commit.

    ``mode="append"`` — LSM fast path: each commit lands the shard's
    deduped delta as a NEW run file without reading the base. Write
    cost ∝ delta size only (the 10^10-events posture: a commit never
    rewrites the lake). Readers LWW-merge runs per shard; a shard
    whose run count would exceed ``compact_runs`` takes a SIZE-TIERED
    fold during the commit (``_tiered_fold``: young run tiers merge,
    tiers ≥4× everything younger — usually the base — are kept as-is,
    so the base is only rewritten when young data rivals it);
    ``compact()`` forces full compaction.

    ``max_bytes_per_commit`` bounds how much WAL one commit ingests:
    a larger backlog is split into sequential append-mode micro-batch
    commits (each crash-safe and manifest-complete on its own), with a
    trailing full compaction when ``mode="rewrite"``. This keeps
    in-flight data bounded regardless of backlog size — measured at
    10^8 events, one monolithic commit forces the whole input through
    the object store at once and collapses into disk spill (~28×
    slower than the batched path)."""
    lake_dir = Path(lake_dir)
    # lake-level meta pins num_shards (the hash partitioning must be
    # stable across commits/restarts) and the WAL stream identity: a
    # lake tails ONE log, and segment names ARE that log's offsets —
    # so replaying a different stream whose names collide would
    # silently no-op. Refuse instead (wal_id check).
    wal_id = str(Path(wal_dir).resolve())
    meta_path = lake_dir / mf.MANIFEST_DIR / "_lake.json"

    import time as _time

    timings: dict[str, float] = {}
    _t0 = _time.perf_counter()
    segments = list_segments(wal_dir)
    if max_segments is not None:
        segments = segments[:max_segments]

    with (lock_cls or mf.LakeLock)(lake_dir) as lk:
        fence = lk.check
        # a committed-but-unfinalized reshard owns the hash layout:
        # complete its swap before anything reads num_shards/manifests
        _finalize_reshard_if_pending(lake_dir, fence)
        # the meta decision runs INSIDE the lock: two concurrent FIRST
        # replays with different num_shards would otherwise each
        # proceed with their own local value (last meta write wins)
        # and hash-route the same conv_id to different shards
        if meta_path.exists():
            with open(meta_path) as f:
                meta = json.load(f)
            num_shards = meta["num_shards"]
            # pre-retention lakes default to 1 (old delete-on-commit GC)
            retain_versions = meta.get("retain_versions", 1)
            if meta.get("wal_id") not in (None, wal_id):
                raise ValueError(
                    f"lake {lake_dir} tails WAL stream {meta['wal_id']!r}; "
                    f"refusing to replay {wal_id!r} — segment names are "
                    "stream offsets and would collide. Use a new lake dir."
                )
        else:
            mf.atomic_write_json(
                {"num_shards": num_shards, "wal_id": wal_id,
                 "retain_versions": max(1, retain_versions)},
                meta_path,
            )
        retain_versions = max(1, retain_versions)
        # manifests are read INSIDE the lock: another replay may have
        # committed between call time and lock acquisition, and a stale
        # snapshot here would re-write just-committed v{N}-s{salt}
        # paths and carry file lists the other commit already GC'd.
        manifests = mf.read_all_manifests(lake_dir)
        # roll back dead-letter entries from commits that never reached
        # the manifest point — their segments are about to re-replay
        # ONE log parse + legacy intersection per replay, shared by the
        # rollback pass and the pending computation
        committed = _committed_segment_names(lake_dir, manifests, num_shards)
        _rollback_orphan_quarantine(lake_dir, committed)
        pending = _pending_segments(segments, committed)
        if not pending:
            return {"committed_segments": 0, "shards_updated": 0, "salted_shards": 0}

        total_bytes = sum(Path(p).stat().st_size for p in pending)
        if total_bytes <= max_bytes_per_commit or len(pending) == 1:
            return _replay_locked(
                lake_dir, pending, manifests, num_shards, salt_threshold,
                batch_size, mode, compact_runs, timings, retain_versions,
                fence=fence,
            )

        # micro-batch the backlog: greedy size-bounded groups of
        # segments, each committed append-mode (crash-safe on its own;
        # LWW makes ordering between batches irrelevant because every
        # event carries its own (ts, op_seq))
        batches: list[list[str]] = [[]]
        acc = 0
        for p in pending:
            sz = Path(p).stat().st_size
            if batches[-1] and acc + sz > max_bytes_per_commit:
                batches.append([])
                acc = 0
            batches[-1].append(p)
            acc += sz
        agg = {
            "committed_segments": 0, "shards_updated": 0, "lake_rows": 0,
            "salted_shards": 0, "gc_files": 0, "quarantined_rows": 0,
            "micro_batches": len(batches), "timings": timings,
        }
        for i, b in enumerate(batches):
            # All but the last micro-batch commit append-mode (cost ∝
            # delta). When the caller asked for a fully-compacted lake
            # (mode="rewrite"), the LAST batch merges rewrite-mode —
            # delta + all accumulated runs → one file per salt — so the
            # trailing compaction no-ops on every shard this batch
            # touches instead of re-reading and re-writing the whole
            # lake one more time (measured ~13 s of an 82 s 10^8-event
            # replay). The trailing _compact_locked still runs to catch
            # multi-run shards the last batch did NOT touch.
            batch_mode = (
                "rewrite" if mode == "rewrite" and i == len(batches) - 1 else "append"
            )
            st = _replay_locked(
                lake_dir, b, manifests, num_shards, salt_threshold,
                batch_size, batch_mode, compact_runs, {}, retain_versions,
                fence=fence,
            )
            agg["committed_segments"] += st["committed_segments"]
            agg["shards_updated"] = max(agg["shards_updated"], st["shards_updated"])
            agg["lake_rows"] = st["lake_rows"]
            agg["salted_shards"] += st["salted_shards"]
            agg["gc_files"] += st["gc_files"]
            agg["quarantined_rows"] += st.get("quarantined_rows", 0)
            agg["shards_auto_compacted"] = (
                agg.get("shards_auto_compacted", 0)
                + st.get("shards_auto_compacted", 0)
            )
            for k, v in st["timings"].items():
                timings[k] = round(timings.get(k, 0.0) + v, 3)
            manifests = mf.read_all_manifests(lake_dir)
        if mode == "rewrite":
            _t1 = _time.perf_counter()
            cst = _compact_locked(lake_dir, salt_threshold, retain_versions, fence=fence)
            timings["final_compact"] = round(_time.perf_counter() - _t1, 3)
            agg["shards_compacted"] = cst.get("shards_compacted", 0)
        return agg


def _replay_locked(
    lake_dir: Path,
    pending: list[str],
    manifests: dict[int, dict],
    num_shards: int,
    salt_threshold: int,
    batch_size: int,
    mode: str,
    compact_runs: int,
    timings: dict,
    retain_versions: int = 1,
    fence=None,
) -> dict:
    import time as _time

    _t0 = _time.perf_counter()
    # ---------------- stage A: conform + route + partitioned delta write
    ds, unified = _read_unified(pending)

    # The partitioned write creates one file per (write task × touched
    # shard); unchecked, file count grows with BOTH input blocks and
    # shard count (the classic small-files shuffle explosion — at 43M
    # events it was 21k files and stage B went nonlinear on footer
    # opens). Cap write-task count when the input would fan out too
    # far: one round-robin repartition (no sort) bounds files to
    # T × num_shards. At bench scale the condition is false and the
    # fused read→route→write path is untouched.
    sizes = [Path(p).stat().st_size for p in pending]
    total_bytes = sum(sizes)
    est_blocks = sum(max(1, round(s / (128 << 20))) for s in sizes)
    avail_cpus = int(ray.cluster_resources().get("CPU", 8))
    cap = max(avail_cpus, min(128, int(np.ceil(total_bytes / (384 << 20)))))
    # only pay the repartition hop when the projected file count is in
    # the measured pain zone (>6k files: footer-open cost dominated
    # stage B at 43M events / 21k files; round 2 re-measured the edge —
    # 5.5k files still cost ~90 s of stage-B footer opens at 43M/64
    # shards, so the gate moved to 4k); below it the fused
    # read→route→write path wins, and the bench/scaling workloads
    # (≤2.2k projected files) stay ungated.
    if est_blocks * num_shards > 4000 and est_blocks > 1.5 * cap:
        ds = ds.repartition(cap)

    def route(batch: pa.Table) -> pa.Table:
        # invalid events are ROUTED, not dropped: unknown-op and
        # null-merge-key rows go to negative merge groups that commit
        # into the quarantine area (dead-letter queue) with lineage —
        # a binlog tail that silently discards malformed events loses
        # the audit trail. All-valid batches (the common case) pay one
        # vectorized mask check and nothing else.
        op_ok = pc.fill_null(
            pc.is_in(batch["op"], value_set=pa.array(_VALID_OPS)), False
        )
        key_ok = pc.and_(
            pc.and_(pc.is_valid(batch["conv_id"]), pc.is_valid(batch["turn_idx"])),
            pc.is_valid(batch["ts"]),
        )
        all_ok = pc.all(pc.and_(op_ok, key_ok)).as_py() is not False
        cid = batch["conv_id"] if all_ok else pc.fill_null(batch["conv_id"], "")
        sh = shard_of(hash_u64(cid), num_shards)
        if not all_ok:
            ko = key_ok.to_numpy(zero_copy_only=False)
            oo = op_ok.to_numpy(zero_copy_only=False)
            sh = np.where(ko, np.where(oo, sh, _DLQ_INVALID_OP), _DLQ_UNROUTABLE)
        return batch.append_column("merge_group", pa.array(sh, type=pa.int64()))

    commit_id = uuid.uuid4().hex[:12]
    delta_root = lake_dir / _INCOMING / commit_id
    # delta runs are pre-commit scratch: uncompressed, no dictionary —
    # 3-4x cheaper to encode/decode than snappy, and GC'd post-commit.
    ds.map_batches(route, batch_format="pyarrow", batch_size=batch_size).write_parquet(
        str(delta_root),
        partition_cols=["merge_group"],
        compression="NONE",
        use_dictionary=False,
    )
    timings["stage_a_route_write"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    # ---------------- plan stage B from actual delta-run sizes ---------
    plans = []  # (shard, k, delta_files) — salting from file SIZES
    # (os.stat only; a shard whose delta run exceeds salt_threshold
    # bytes is compacted by k parallel sub-keyspace tasks)
    quarantine_runs: list[tuple[int, list[Path]]] = []  # (group, files)
    for d in sorted(delta_root.glob("merge_group=*")):
        sh = int(d.name.split("=")[1])
        files = sorted(d.glob("*.parquet"))
        if sh < 0:
            quarantine_runs.append((sh, files))
            continue
        nbytes = sum(p.stat().st_size for p in files)
        k = max(1, int(np.ceil(nbytes / salt_threshold)))
        plans.append((sh, k, [str(p) for p in files], nbytes))
    # LPT order: submit the biggest compactions first so the last wave
    # of tasks is made of small ones (shorter straggler tail).
    plans.sort(key=lambda p: -p[3])

    new_version = {sh: m["version"] + 1 for sh, m in manifests.items()}

    timings["plan"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()
    # hot shards: pre-split their delta by salt in one pass each
    split_refs = {
        sh: _salt_split_task.remote(
            files, k, num_shards, str(delta_root / f"salted-{sh:05d}")
        )
        for sh, k, files, _ in plans
        if k > 1
    }
    split_files = {sh: ray.get(r) for sh, r in split_refs.items()}

    refs = []
    keep_map: dict[int, list[dict]] = {}
    auto_compacted = 0
    for sh, k, files, delta_bytes in plans:
        old_m = manifests.get(sh)
        old_recs = list(old_m["files"]) if old_m else []
        if mode == "rewrite":
            fold_recs, keep = old_recs, []
        elif len(old_recs) + k <= compact_runs:
            fold_recs, keep = [], old_recs  # plain append: runs accumulate
        else:
            # run budget exceeded: size-tiered fold (see _tiered_fold)
            fold_recs, keep = _tiered_fold(old_recs, delta_bytes, k, compact_runs)
            auto_compacted += 1
        keep_map[sh] = keep
        fold_paths = [f["path"] for f in fold_recs]
        base_disk = sum(int(f["bytes"]) for f in fold_recs)
        max_base_file = max((int(f["bytes"]) for f in fold_recs), default=0)
        mem = _merge_mem_bytes(delta_bytes // k, base_disk, k, max_base_file)
        for j in range(k):
            delta_j = split_files[sh][j] if k > 1 else files
            refs.append(
                _merge_task.options(memory=mem).remote(
                    str(lake_dir),
                    sh,
                    j,
                    k,
                    new_version.get(sh, 1),
                    num_shards,
                    delta_j,
                    fold_paths,
                    pre_salted=k > 1,
                )
            )
    stats_rows = ray.get(refs)
    timings["stage_b_merge"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    # ------- commit: manifests first, ONE fsynced log append last -------
    if fence is not None:
        # fencing point: a zombie writer whose lease expired (or was
        # taken over) must abort BEFORE anything becomes visible —
        # nothing above this line touched the commit log or manifests
        fence()
    seg_names = [Path(p).name for p in pending]
    # Quarantine and shard manifests land BEFORE the commit-log append
    # (the commit point): crash anywhere in between and the segments
    # read as uncommitted, the re-replay's rollback pass removes the
    # orphan quarantine entry, the rows re-route, and LWW makes the
    # re-applied delta idempotent — never lost, never double-counted.
    quarantined_rows = _commit_quarantine(
        lake_dir, commit_id, quarantine_runs, seg_names
    )
    lineage = [
        {"segment": Path(p).name, "offset_start": mf.segment_offset(p), "commit": commit_id}
        for p in pending
    ]
    by_shard: dict[int, list[dict]] = {}
    for r in stats_rows:
        by_shard.setdefault(int(r["shard"]), []).append(r)

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=16)
    pending_writes = []
    new_manifests: dict[int, dict] = dict(manifests)
    salted = 0
    for sh, rows in sorted(by_shard.items()):
        k = int(rows[0]["k"])
        if k > 1:
            salted += 1
        files = sorted(
            (
                {
                    "salt": int(r["salt"]),
                    "path": r["path"],
                    "rows": int(r["rows"]),
                    "bytes": int(r["bytes"]),
                    **({"zones": r["zones"]} if r.get("zones") else {}),
                }
                for r in rows
            ),
            key=lambda f: f["salt"],
        )
        old_m = manifests.get(sh)
        # files the fold kept out of the merge stay in the manifest
        # (plain append keeps all old runs; full rewrite keeps none)
        files = keep_map.get(sh, []) + files
        m = {
            "shard": sh,
            "version": int(rows[0]["version"]),
            "salt_k": k,
            "commit": commit_id,
            "first_commit": (old_m or {}).get("first_commit", commit_id),
            "history": _push_history(old_m, retain_versions),
            "files": files,
            "rows": sum(f["rows"] for f in files),
            "bytes": sum(f["bytes"] for f in files),
            # THIS commit's segment→offset lineage only; full history
            # is one fsynced commit-log record per commit. (Manifests
            # used to append every commit's lineage + the full
            # committed-segment list forever — O(history) JSON
            # re-serialized per shard per commit.)
            "lineage": lineage,
        }
        if old_m and "committed_segments" in old_m:
            # frozen pre-log-protocol bookkeeping, kept verbatim so
            # legacy segments stay committed under the mixed-lake rule
            m["committed_segments"] = old_m["committed_segments"]
        pending_writes.append(pool.submit(mf.atomic_write_json, m, mf.manifest_path(lake_dir, sh)))
        new_manifests[sh] = m

    for f in pending_writes:
        f.result()  # barrier: every manifest durable before the commit point
    pool.shutdown()
    if fence is not None:
        fence()  # re-check at the REAL commit point: the log append
    # THE commit point: one O(batch) fsynced record; untouched shards
    # are never rewritten (previously all num_shards manifests were)
    _append_commit_log(lake_dir, commit_id, seg_names)
    removed = _fenced_gc(lake_dir, new_manifests, fence)
    timings["commit_gc"] = round(_time.perf_counter() - _t0, 3)
    total_rows = sum(m["rows"] for m in new_manifests.values())
    return {
        "committed_segments": len(pending),
        "shards_updated": len(by_shard),
        "lake_rows": total_rows,
        "salted_shards": salted,
        "gc_files": removed,
        "quarantined_rows": quarantined_rows,
        # append-mode shards whose run count crossed compact_runs and
        # took a size-tiered fold this commit (these commits pay
        # O(young tiers), not O(delta) — invisible cost otherwise)
        "shards_auto_compacted": auto_compacted,
        "commit": commit_id,
        "timings": timings,
    }


def compact(
    lake_dir: str | Path,
    salt_threshold: int = 512 * 1024 * 1024,
    lock_cls=None,
) -> dict:
    """Force full compaction: every shard with more than one run file
    is LWW-merged into one file per salt. Commit protocol identical to
    replay (new files invisible until the manifest lands); committed
    segment bookkeeping is untouched. ``lock_cls`` as in ``replay``."""
    lake_dir = Path(lake_dir)
    meta_path = lake_dir / mf.MANIFEST_DIR / "_lake.json"
    retain = 1
    if meta_path.exists():
        with open(meta_path) as f:
            retain = json.load(f).get("retain_versions", 1)
    with (lock_cls or mf.LakeLock)(lake_dir) as lk:
        _finalize_reshard_if_pending(lake_dir, lk.check)
        return _compact_locked(lake_dir, salt_threshold, retain, fence=lk.check)


def _compact_locked(
    lake_dir: Path, salt_threshold: int, retain_versions: int = 1, fence=None
) -> dict:
    manifests = mf.read_all_manifests(lake_dir)
    num_shards = mf.lake_meta(lake_dir)["num_shards"]

    plans = []
    for sh, m in manifests.items():
        # fully compacted = one file per salt (same test read_lake
        # uses); a salted shard at len(files) == salt_k must NOT be
        # re-read and re-written every trailing compaction
        if len(m["files"]) <= m.get("salt_k", 1):
            continue
        nbytes = sum(f["bytes"] for f in m["files"])
        k = max(1, int(np.ceil(nbytes / salt_threshold)))
        plans.append((sh, k, [f["path"] for f in m["files"]], nbytes))
    plans.sort(key=lambda p: -p[3])
    if not plans:
        return {"shards_compacted": 0}

    refs = []
    for sh, k, files, nbytes in plans:
        version = manifests[sh]["version"] + 1
        max_f = max((int(f["bytes"]) for f in manifests[sh]["files"]), default=0)
        mem = _merge_mem_bytes(0, nbytes, k, max_f)
        for j in range(k):
            refs.append(
                _merge_task.options(memory=mem).remote(
                    str(lake_dir), sh, j, k,
                    version, num_shards, [], files,
                )
            )
    stats_rows = ray.get(refs)

    by_shard: dict[int, list[dict]] = {}
    for r in stats_rows:
        by_shard.setdefault(int(r["shard"]), []).append(r)
    commit_id = uuid.uuid4().hex[:12]
    if fence is not None:
        fence()  # fencing point: nothing visible has been written yet
    _append_commit_log(lake_dir, commit_id, [])
    new_manifests = dict(manifests)
    for sh, rows in sorted(by_shard.items()):
        m = dict(manifests[sh])
        m["history"] = _push_history(manifests[sh], retain_versions)
        m["commit"] = commit_id
        m["version"] = int(rows[0]["version"])
        m["salt_k"] = int(rows[0]["k"])
        m["files"] = sorted(
            (
                {"salt": int(r["salt"]), "path": r["path"],
                 "rows": int(r["rows"]), "bytes": int(r["bytes"]),
                 **({"zones": r["zones"]} if r.get("zones") else {})}
                for r in rows
            ),
            key=lambda f: f["salt"],
        )
        m["rows"] = sum(f["rows"] for f in m["files"])
        m["bytes"] = sum(f["bytes"] for f in m["files"])
        mf.atomic_write_json(m, mf.manifest_path(lake_dir, sh))
        new_manifests[sh] = m
    removed = _fenced_gc(lake_dir, new_manifests, fence)
    return {"shards_compacted": len(by_shard), "gc_files": removed}


@ray.remote
def _reshard_task(
    lake_dir: str,
    new_shard: int,
    salt: int,
    k: int,
    new_num_shards: int,
    version: int,
    src_files: list[str],
) -> dict:
    """Rebuild one (new_shard, salt) keyspace from the old layout's
    files: read each contributing source file, keep the rows that
    hash-route to this new shard (and salt), LWW-merge (the sources
    may be multi-run — every revision of a kept key is in this task's
    input because its old shard is in the residue class), and write
    one sorted file through the atomic protocol. Tombstones are
    retained — reshard changes layout, never state."""
    try:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
    except Exception:
        pass
    from ..state.merge_index import lww_merge_sorted

    tabs = []
    for f in src_files:
        t = pq.read_table(str(Path(lake_dir) / f))
        if t.num_rows:
            h = hash_u64(t["conv_id"])
            mask = shard_of(h, new_num_shards) == new_shard
            if k > 1:
                mask &= salt_of(h, new_num_shards, k) == salt
            t = t.filter(pa.array(mask))
        if t.num_rows:
            tabs.append(t)
    if not tabs:
        return {"shard": new_shard, "salt": salt, "k": k, "version": version,
                "path": None, "rows": 0, "bytes": 0, "zones": {}}
    out = lww_merge_sorted(pa.concat_tables(tabs, promote_options="permissive"))
    rel = f"shard={new_shard:05d}/v{version:06d}-s{salt:03d}.parquet"
    nbytes = mf.atomic_write_table(out, Path(lake_dir) / rel)
    return {"shard": new_shard, "salt": salt, "k": k, "version": version,
            "path": rel, "rows": out.num_rows, "bytes": nbytes,
            "zones": _file_zones(out)}


def reshard(
    lake_dir: str | Path,
    new_num_shards: int,
    salt_threshold: int = 512 * 1024 * 1024,
    lock_cls=None,
) -> dict:
    """Partition evolution: rewrite the lake from its current hash
    layout to ``new_num_shards`` shards — the operation a growing
    10^10-event lake needs when its shard count stops matching the
    cluster (e.g. 64 → 256 as nodes are added).

    Distribution: with ``g = gcd(old, new)``, a conv hash that lives
    in old shard ``s`` can only land in a new shard ``t`` with
    ``t ≡ s (mod g)`` — so each new shard reads exactly its residue
    class of old shards. For the natural growth shapes (N→k·N or
    N→N/k) that is each old shard being read by exactly its k children
    (or k parents folding into one child); read amplification is
    ``new/g`` (resp. 1) and there is NO shuffle. A coprime change
    (g = 1) would make every new shard read the whole lake — allowed,
    but warned about loudly.

    Crash safety — two-phase swap, marker as the commit point:

    1. *Prepare* (invisible): new data files land under the new shard
       dirs at a version above every old file; the full new manifest
       set is staged under ``_manifests/_reshard-{commit}/``.
    2. *Commit*: one atomic write of ``_manifests/_reshard_commit.json``.
       From this instant readers resolve the staged set
       (``mf.read_all_manifests`` overlays it; ``mf.lake_meta``
       reports the new shard count).
    3. *Finalize* (idempotent, re-run by the next writer after any
       crash): move staged manifests into place (one atomic rename
       each — readers stay exact through every intermediate state),
       drop dead old-shard manifests, update ``_lake.json``, append
       the reshard record to the commit log, remove the marker. The
       old layout's files are NOT GC'd immediately: a
       ``_reshard_dead-{commit}.json`` pin keeps them on disk until
       ``retain_versions`` subsequent commits exist (the same grace
       compact/expire give via manifest history), so a lock-free
       reader mid-scan on the pre-reshard file list is never broken.

    Reshard truncates time travel: ``at_commit`` older than the
    reshard RAISES (the old hash layout's files are gone; never a
    silent empty answer). State is provably unchanged — the final
    table before and after is byte-equal (tests + ★q64)."""
    import math

    lake_dir = Path(lake_dir)
    with (lock_cls or mf.LakeLock)(lake_dir) as lk:
        fence = getattr(lk, "check", None)
        _finalize_reshard_if_pending(lake_dir, fence)
        _sweep_dead_reshard_staging(lake_dir)
        meta_path = lake_dir / mf.MANIFEST_DIR / "_lake.json"
        if not meta_path.exists():
            raise ValueError(f"{lake_dir} is not a lake (no _lake.json)")
        with open(meta_path) as f:
            meta = json.load(f)
        old_n = meta["num_shards"]
        if int(new_num_shards) == old_n:
            return {"resharded": False, "num_shards": old_n}
        if new_num_shards < 1:
            raise ValueError("new_num_shards must be >= 1")
        new_n = int(new_num_shards)
        g = math.gcd(old_n, new_n)
        if g == 1:
            warnings.warn(
                f"reshard {old_n}→{new_n}: gcd 1 (coprime counts) means "
                f"EVERY old file is read by all {new_n} new shards — "
                "prefer a multiple or divisor of the current shard count",
                stacklevel=2,
            )
        elif g < min(old_n, new_n) and new_n // g > 8:
            # not a clean multiple/divisor AND high fan-out; a clean
            # k x growth (g == old_n) inherently reads each file k
            # times and needs no warning — the advice would be
            # unsatisfiable
            warnings.warn(
                f"reshard {old_n}→{new_n}: gcd {g} means each old file is "
                f"read by {new_n // g} new shards — prefer a multiple or "
                "divisor of the current shard count",
                stacklevel=2,
            )
        manifests = mf.read_all_manifests(lake_dir)
        commit_id = uuid.uuid4().hex[:12]

        # legacy lakes record committed segments in manifests we are
        # about to drop: carry the set into the reshard log record so
        # resume bookkeeping survives the layout change
        legacy_segments: list[str] = []
        if any("committed_segments" in m for m in manifests.values()):
            legacy_segments = sorted(
                _committed_segment_names(lake_dir, manifests, old_n)
            )

        version = max((m["version"] for m in manifests.values()), default=0) + 1
        src_by_res: dict[int, list[str]] = {r: [] for r in range(g)}
        bytes_by_res: dict[int, int] = {r: 0 for r in range(g)}
        maxf = 0
        for sh, m in manifests.items():
            for f in m["files"]:
                src_by_res[sh % g].append(f["path"])
                bytes_by_res[sh % g] += int(f["bytes"])
                maxf = max(maxf, int(f["bytes"]))

        refs = []
        for t in range(new_n):
            src = src_by_res[t % g]
            if not src:
                continue
            est = max(1, bytes_by_res[t % g] * g // new_n)
            k = max(1, int(np.ceil(est / salt_threshold)))
            mem = _merge_mem_bytes(0, est, k, maxf)
            for j in range(k):
                refs.append(
                    _reshard_task.options(memory=mem).remote(
                        str(lake_dir), t, j, k, new_n, version, src
                    )
                )
        stats_rows = ray.get(refs)

        by_shard: dict[int, list[dict]] = {}
        for r in stats_rows:
            by_shard.setdefault(int(r["shard"]), []).append(r)

        if fence is not None:
            fence()  # nothing visible yet: abort point for a zombie
        sdir = mf.reshard_staging_dir(lake_dir, commit_id)
        sdir.mkdir(parents=True, exist_ok=True)
        from concurrent.futures import ThreadPoolExecutor

        rows_total = 0
        with ThreadPoolExecutor(max_workers=16) as pool:
            futs = []
            for t in range(new_n):
                rows = by_shard.get(t, [])
                files = sorted(
                    (
                        {"salt": int(r["salt"]), "path": r["path"],
                         "rows": int(r["rows"]), "bytes": int(r["bytes"]),
                         **({"zones": r["zones"]} if r.get("zones") else {})}
                        for r in rows
                        if r["path"] is not None
                    ),
                    key=lambda f: f["salt"],
                )
                m = {
                    "shard": t,
                    "version": version,
                    "salt_k": int(rows[0]["k"]) if rows else 1,
                    "commit": commit_id,
                    "first_commit": commit_id,
                    "history": [],
                    "files": files,
                    "rows": sum(f["rows"] for f in files),
                    "bytes": sum(f["bytes"] for f in files),
                    "lineage": [],
                }
                rows_total += m["rows"]
                futs.append(
                    pool.submit(
                        mf.atomic_write_json, m, sdir / f"shard-{t:05d}.json"
                    )
                )
            for f in futs:
                f.result()  # every staged manifest durable pre-marker

        # pin the old layout's files (current + retained history) for a
        # retention grace: a lock-free reader that resolved the
        # pre-reshard manifests must not have files unlinked mid-scan.
        # The pin expires after retain_versions subsequent commits —
        # the same window compact/expire give — and _gc enforces it.
        # Written BEFORE the marker: a crash here leaves a pin whose
        # commit never reaches the log; _gc sweeps it as debris.
        old_files = sorted(
            {f["path"] for m in manifests.values() for f in m["files"]}
            | {
                f["path"]
                for m in manifests.values()
                for h in m.get("history", [])
                for f in h["files"]
            }
        )
        mf.atomic_write_json(
            {"commit": commit_id, "files": old_files},
            lake_dir / mf.MANIFEST_DIR / f"_reshard_dead-{commit_id}.json",
        )
        if fence is not None:
            fence()  # the REAL commit point follows immediately
        mf.atomic_write_json(
            {"commit": commit_id, "from": old_n, "to": new_n,
             "segments": legacy_segments},
            lake_dir / mf.MANIFEST_DIR / mf.RESHARD_MARKER,
        )
        # committed: finalize in-line (idempotent; any crash from here
        # on is completed by the next writer)
        _finalize_reshard_if_pending(lake_dir, fence)
        return {
            "resharded": True,
            "num_shards": new_n,
            "from_shards": old_n,
            "commit": commit_id,
            "lake_rows": rows_total,
            "new_files": sum(
                1 for rs in by_shard.values() for r in rs if r["path"]
            ),
        }


def _sweep_dead_reshard_staging(lake_dir: Path) -> int:
    """Remove ``_reshard-*`` staging dirs with NO marker (a reshard
    crashed during prepare: nothing was committed, the staged files
    are dead). Caller holds the writer lock and has already finalized
    any marked swap."""
    if mf.reshard_marker(lake_dir) is not None:
        return 0
    n = 0
    for d in (Path(lake_dir) / mf.MANIFEST_DIR).glob("_reshard-*"):
        if d.is_dir():
            shutil.rmtree(d, ignore_errors=True)
            n += 1
    return n


def _finalize_reshard_if_pending(lake_dir: Path, fence=None) -> bool:
    """Complete a committed reshard swap (marker present): move staged
    manifests into place, drop dead shard manifests, flip
    ``_lake.json``, log the commit, remove the marker, GC (the old
    layout's files stay pinned for a retention grace — see
    ``_reshard_pinned``). Every step is atomic and re-runnable; readers resolve
    exactly through any crash point via the marker overlay. Returns
    True if a swap was finalized. Callers hold the writer lock."""
    marker = mf.reshard_marker(lake_dir)
    if marker is None:
        return False
    if fence is not None:
        fence()
    mdir = Path(lake_dir) / mf.MANIFEST_DIR
    new_n = int(marker["to"])
    sdir = mf.reshard_staging_dir(lake_dir, marker["commit"])
    if sdir.exists():
        for p in sorted(sdir.glob("shard-*.json")):
            os.replace(p, mdir / p.name)
        mf._fsync_dir(mdir)
        shutil.rmtree(sdir, ignore_errors=True)
    for p in mdir.glob("shard-*.json"):
        try:
            sh = int(p.stem.split("-")[1])
        except (IndexError, ValueError):
            continue
        if sh >= new_n:
            p.unlink(missing_ok=True)
    meta_path = mdir / "_lake.json"
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("num_shards") != new_n:
        meta["num_shards"] = new_n
        mf.atomic_write_json(meta, meta_path)
    if marker["commit"] not in {e["commit"] for e in commit_log(lake_dir)}:
        if fence is not None:
            fence()  # a zombie past its TTL must not append a second
            # reshard record a successor's finalize already logged
        _append_commit_log(
            lake_dir, marker["commit"], list(marker.get("segments") or ()),
            extra={"reshard": {"from": marker["from"], "to": new_n}},
        )
    (mdir / mf.RESHARD_MARKER).unlink(missing_ok=True)
    mf._fsync_dir(mdir)
    _fenced_gc(lake_dir, mf.read_all_manifests(lake_dir), fence)
    return True


def _fenced_gc(
    lake_dir: Path,
    new_manifests: dict[int, dict],
    fence,
    pin_keep: int | None = None,
) -> int:
    """GC orphan files, but only while the lease is still provably
    ours. A zombie that stalled past its lease TTL between the last
    fence and here could otherwise unlink files a SUCCESSOR's commit
    just made live (its ``new_manifests`` view is stale). GC is always
    safe to defer — the next replay/compact under a valid lease sweeps
    the same orphans — so on a lost lease we skip it, never risk it."""
    if fence is not None:
        try:
            fence()
        except mf.LeaseFencedError:
            warnings.warn(
                "lease lost after commit; skipping GC (orphans will be "
                "swept by the next replay/compact)",
                stacklevel=2,
            )
            return 0
    return _gc(lake_dir, new_manifests, pin_keep=pin_keep)


def _push_history(old_m: dict | None, retain_versions: int) -> list[dict]:
    """History entries (newest first) for a shard manifest about to be
    replaced: the outgoing current version plus the old history,
    truncated to ``retain_versions - 1`` entries. GC keeps every file
    they reference, so a reader resolved against a retained version
    never has files unlinked mid-read."""
    if old_m is None or retain_versions <= 1:
        return []
    head = {
        "version": old_m["version"],
        "salt_k": old_m.get("salt_k", 1),
        "commit": old_m.get("commit"),
        "files": old_m["files"],
    }
    return ([head] + old_m.get("history", []))[: retain_versions - 1]


def _append_commit_log(
    lake_dir: Path, commit_id: str, segments: list[str], extra: dict | None = None
) -> None:
    """Ordered commit log (``_manifests/_commits.jsonl``) — the global
    ordering ``read_lake(at_commit=...)`` resolves against, and since
    round 4 THE commit point: appended (fsynced) only AFTER every
    touched shard manifest is durable, carrying the commit's full
    segment list — so segment-committed state is recorded exactly
    once, O(batch) per commit, instead of being duplicated into all
    shard manifests and re-serialized forever. APPEND-ONLY JSONL on
    purpose: never a rewrite of history, which would make commit cost
    grow with commit count at 10^10-event cadence. (Total log size is
    O(total segments) — ~30 bytes per 500k-row segment, read once per
    replay/stats call, not per commit per shard.)"""
    p = Path(lake_dir) / mf.MANIFEST_DIR / "_commits.jsonl"
    rec = {
        "commit": commit_id,
        "n_segments": len(segments),
        "first_segment": min(segments) if segments else None,
        "last_segment": max(segments) if segments else None,
        "segments": sorted(segments),
        **(extra or {}),
    }
    with open(p, "ab") as f:
        lead = b""
        if f.tell():
            # a torn previous append (crash mid-write, no trailing
            # newline) must not swallow THIS record into its line:
            # seal it with a newline first, leaving the torn fragment
            # as its own invalid line for the reader to skip
            with open(p, "rb") as r:
                r.seek(-1, 2)
                if r.read(1) != b"\n":
                    lead = b"\n"
        f.write(lead + json.dumps(rec).encode() + b"\n")
        f.flush()
        os.fsync(f.fileno())


def commit_log(lake_dir: str | Path) -> list[dict]:
    """The ordered commit log (oldest first); [] for a fresh lake. A
    torn line (crash mid-append) is skipped — its commit never reached
    the manifests either, so it does not exist; later appends seal the
    fragment onto its own line, so records after it stay readable.

    Phantom demotion — LEGACY records only (written before round 4's
    log-is-the-commit-point protocol, when the log was appended BEFORE
    the manifests): such a record may claim segments a resumed replay
    re-committed under a later id. Legacy commits consumed
    monotonically increasing segment ranges, so a legacy record whose
    range reaches into a LATER record's range is a phantom — reported
    as the empty commit it effectively is (``n_segments`` 0,
    ``phantom`` True). Records carrying a ``segments`` list are
    post-manifest appends and therefore authoritative — never demoted
    (which also makes genuinely out-of-order stream slices, e.g. wave
    7 delivered before wave 6, safe from false demotion)."""
    p = Path(lake_dir) / mf.MANIFEST_DIR / "_commits.jsonl"
    if not p.exists():
        return []
    out = []
    with open(p) as f:
        for line in f:
            if not line.strip():
                continue
            try:
                out.append(json.loads(line))
            except ValueError:
                continue  # torn fragment: skip, keep reading
    # exact interval test, not a watermark: a legacy record is a
    # phantom iff some LATER record's range INTERSECTS its range (its
    # claimed segments were re-committed). A later record that merely
    # starts below it (an out-of-order stream slice, e.g. wave 7
    # delivered before wave 6) must not demote it. O(n·legacy) over
    # the in-memory list — legacy records are a bounded pre-upgrade
    # prefix.
    later: list[tuple[str, str]] = []
    for rec in reversed(out):
        if not rec.get("n_segments"):
            continue
        first, last = rec.get("first_segment"), rec.get("last_segment")
        if (
            "segments" not in rec
            and first is not None
            and any(f2 <= last and l2 >= first for f2, l2 in later)
        ):
            rec.update(
                n_segments=0, first_segment=None, last_segment=None, phantom=True
            )
            continue
        if first is not None:
            later.append((first, last))
    return out


def _snapshot_manifests(
    lake_dir: Path, manifests: dict[int, dict], at_commit: str
) -> dict[int, dict]:
    """Resolve each shard's manifest entry as of ``at_commit``. Raises
    if the commit is unknown or its state has been expired out of a
    shard's retained history (detectable via the shard's
    ``first_commit``: created-later shards are legitimately empty,
    expired ones are an error, never a silent wrong answer)."""
    import math

    if mf.reshard_marker(lake_dir) is not None:
        # a committed-but-unfinalized reshard: the old layout is
        # already dead and the new commit is not yet logged — loud,
        # never a silent empty snapshot
        raise ValueError(
            "a reshard is committed but not yet finalized; time travel "
            "resumes after the next write finalizes the swap (reshard "
            "truncates history at its commit)"
        )
    log = commit_log(lake_dir)
    ranks = {e["commit"]: i for i, e in enumerate(log)}
    if at_commit not in ranks:
        raise ValueError(
            f"unknown commit {at_commit!r}; see commit_log() for valid ids"
        )
    target = ranks[at_commit]
    floor = max(
        (i for i, e in enumerate(log) if e.get("reshard")), default=-1
    )
    if target < floor:
        raise ValueError(
            f"commit {at_commit!r} predates the lake's reshard "
            f"({log[floor]['reshard']['from']}→{log[floor]['reshard']['to']} "
            f"at commit {log[floor]['commit']!r}); resharding rewrites the "
            "hash layout and truncates time travel"
        )
    # A manifest entry with a STRING commit id ABSENT from the log is a
    # torn-window write: manifests land BEFORE the log append (the
    # commit point), so an unlogged id is NEWER than every logged
    # commit and must never be served as any logged commit's state (it
    # is uncommitted until the recovery replay re-lands it under a
    # logged id). Rank +inf — excluded from every time-travel target.
    # An entry with NO commit id at all (``commit: None``) is the
    # opposite era: written by pre-commit-log code, therefore OLDER
    # than every logged commit — rank -1 so legacy shards keep serving
    # their data at every time-travel point instead of reading empty.
    unlogged = math.inf
    pre_log = -1
    out: dict[int, dict] = {}
    for sh, m in manifests.items():
        entries = [
            {
                "version": m["version"],
                "salt_k": m.get("salt_k", 1),
                "commit": m.get("commit"),
                "files": m["files"],
            }
        ] + m.get("history", [])
        best, best_rank = None, -2
        for e in entries:
            c = e.get("commit")
            r = pre_log if c is None else ranks.get(c, unlogged)
            if r <= target and r > best_rank:
                best, best_rank = e, r
        if best is None:
            # Every entry carries an unlogged string id here (a None id
            # would have ranked pre_log and matched). Silent-empty is
            # only correct when the shard's CREATION is also unlogged
            # (torn first-ever write, never yet committed) or logged
            # after the target; anything else is loud.
            first = m.get("first_commit")
            if first is not None and ranks.get(first, unlogged) > target:
                # shard created after at_commit (or by a torn,
                # not-yet-recovered commit): empty at that point
                continue
            raise ValueError(
                f"commit {at_commit!r} is older than shard {sh}'s retained "
                f"history (retain_versions; see expire_snapshots)"
                if first is not None
                else f"shard {sh} has data files but no logged or pre-log "
                f"manifest entry resolvable at commit {at_commit!r} — "
                f"corrupt or mixed-era manifest; refusing to serve it "
                f"as empty"
            )
        if best["files"]:
            out[sh] = {"shard": sh, **best}
    return out


def expire_snapshots(lake_dir: str | Path, keep: int = 1, lock_cls=None) -> dict:
    """Trim every shard's retained history to ``keep`` versions
    (current included) and GC the files that fall out — the storage
    lever for long-running lakes. Runs under the lake lock;
    ``lock_cls`` as in ``replay`` (on a multi-node deployment pass
    ``mf.LeaseLock`` here too — a flock only excludes THIS node's
    writers, and GC racing a remote commit can unlink files the
    in-flight manifests are about to reference)."""
    lake_dir = Path(lake_dir)
    with (lock_cls or mf.LakeLock)(lake_dir) as lk:
        _finalize_reshard_if_pending(lake_dir, getattr(lk, "check", None))
        manifests = mf.read_all_manifests(lake_dir)
        # fencing point BEFORE any manifest write (same discipline as
        # _replay_locked): a zombie past its lease TTL must abort here,
        # or its stale trimmed manifests would clobber a successor's
        # newer committed state
        check = getattr(lk, "check", None)
        if check is not None:
            check()
        dropped = 0
        for sh, m in manifests.items():
            hist = m.get("history", [])
            if len(hist) <= keep - 1:
                continue
            m = dict(m)
            dropped += len(hist) - max(0, keep - 1)
            m["history"] = hist[: max(0, keep - 1)]
            mf.atomic_write_json(m, mf.manifest_path(lake_dir, sh))
            manifests[sh] = m
        removed = _fenced_gc(
            lake_dir, manifests, getattr(lk, "check", None), pin_keep=keep
        )
        return {"versions_dropped": dropped, "gc_files": removed}


def vacuum(lake_dir: str | Path, lock_cls=None) -> dict:
    """Reclaim storage left by crashed writers WITHOUT waiting for the
    next replay/compact: orphan data files no retained manifest
    references (a run killed after its fan-out wrote shard files but
    before its manifests landed), stale ``_incoming`` delta-run dirs,
    quarantine dirs whose per-commit manifest never landed, torn
    ``.tmp-*`` scratch from interrupted atomic writes under
    ``_manifests``, and ``.staging-*`` scratch from crashed
    ``upsert_dataset`` calls. Pure maintenance — manifests and the
    commit log are never modified, so the committed state is untouched
    by construction. Runs under the writer lock (``lock_cls`` as in
    ``replay``; on multi-node pass ``mf.LeaseLock``) so it can never
    sweep an in-flight writer's scratch."""
    lake_dir = Path(lake_dir)
    with (lock_cls or mf.LakeLock)(lake_dir) as lk:
        _finalize_reshard_if_pending(lake_dir, getattr(lk, "check", None))
        dead_staging = _sweep_dead_reshard_staging(lake_dir)
        manifests = mf.read_all_manifests(lake_dir)
        removed = _fenced_gc(lake_dir, manifests, getattr(lk, "check", None))
        tmp_swept = dead_staging
        for p in (lake_dir / mf.MANIFEST_DIR).glob(".tmp-*"):
            try:
                p.unlink()
                tmp_swept += 1
            except OSError:
                pass
        ingest_swept = 0
        if (lake_dir / "_ingest").exists():
            # gc_ingested itself takes the per-stream upsert flock
            # non-blocking and skips on live contention, so an
            # in-flight upsert's staging dir can never be swept
            from .ingest import gc_ingested

            ingest_swept = gc_ingested(lake_dir)
        return {
            "gc_files": removed,
            "tmp_files": tmp_swept,
            "ingest_swept": ingest_swept,
        }


def _commit_quarantine(
    lake_dir: Path,
    commit_id: str,
    quarantine_runs: list[tuple[int, list[Path]]],
    seg_names: list[str],
) -> int:
    """Move this commit's dead-letter delta runs from ``_incoming`` to
    ``quarantine/commit=<id>/reason=<r>/`` and record them in an
    atomic per-commit quarantine manifest (rows/bytes/reason per file +
    the segment lineage). Same-filesystem renames; counted from parquet
    footers. Returns the quarantined row count (0 → no manifest)."""
    if not quarantine_runs:
        return 0
    frecs = []
    total = 0
    for grp, files in quarantine_runs:
        reason = _DLQ_REASON[grp]
        dest = lake_dir / _QUARANTINE / f"commit={commit_id}" / f"reason={reason}"
        dest.mkdir(parents=True, exist_ok=True)
        for f in files:
            rows = pq.ParquetFile(f).metadata.num_rows
            nbytes = f.stat().st_size
            rel = str(Path(_QUARANTINE) / f"commit={commit_id}" / f"reason={reason}" / f.name)
            os.replace(f, lake_dir / rel)
            frecs.append({"path": rel, "rows": rows, "bytes": nbytes, "reason": reason})
            total += rows
    mf.atomic_write_json(
        {"commit": commit_id, "segments": sorted(seg_names), "rows": total,
         "files": frecs},
        lake_dir / mf.MANIFEST_DIR / f"quarantine-{commit_id}.json",
    )
    return total


def _quarantine_manifests(lake_dir: Path) -> list[dict]:
    out = []
    for p in sorted((Path(lake_dir) / mf.MANIFEST_DIR).glob("quarantine-*.json")):
        with open(p) as f:
            out.append(json.load(f))
    return out


def _rollback_orphan_quarantine(lake_dir: Path, committed: set[str]) -> int:
    """Remove quarantine entries whose commit never reached the commit
    point (crash between quarantine landing and the commit-log
    append). Their segments read as uncommitted, so the caller is
    about to re-replay them — the rows will quarantine again under the
    new commit. Runs under the lake lock; ``committed`` is the
    caller's already-derived ``_committed_segment_names`` set."""
    removed = 0
    for rec in _quarantine_manifests(lake_dir):
        if rec["segments"] and set(rec["segments"]) <= committed:
            continue
        shutil.rmtree(
            Path(lake_dir) / _QUARANTINE / f"commit={rec['commit']}",
            ignore_errors=True,
        )
        try:
            (Path(lake_dir) / mf.MANIFEST_DIR / f"quarantine-{rec['commit']}.json").unlink()
        except OSError:
            pass
        removed += 1
    return removed


def read_quarantine(lake_dir: str | Path) -> ray.data.Dataset:
    """The committed dead-letter rows as a streaming Dataset: original
    event envelope (unified schema) plus a ``dlq_reason`` column.
    Empty-lake/empty-queue safe."""
    lake_dir = Path(lake_dir)
    by_reason: dict[str, list[str]] = {}
    for rec in _quarantine_manifests(lake_dir):
        for f in rec["files"]:
            by_reason.setdefault(f["reason"], []).append(str(lake_dir / f["path"]))
    if not by_reason:
        empty = pa.schema(list(EVENT_SCHEMA) + [pa.field("dlq_reason", pa.string())])
        return ray.data.from_arrow(empty.empty_table())

    parts = []
    for reason in sorted(by_reason):
        ds, unified = _read_unified(by_reason[reason])

        def tag(t: pa.Table, _r: str = reason) -> pa.Table:
            t = conform(t, EVENT_SCHEMA)
            return t.append_column(
                "dlq_reason", pa.nulls(t.num_rows, pa.string()).fill_null(_r)
            )

        parts.append(ds.map_batches(tag, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _reshard_pinned(lake_dir: Path, keep: int | None = None) -> set[str]:
    """Live-file pins from recent reshards. The old layout's files are
    unreferenced the instant a reshard finalizes, but a lock-free
    reader that resolved the PRE-reshard manifests may still be
    streaming them — so they stay on disk until ``keep`` (default: the
    lake's ``retain_versions``) subsequent commits exist, the same
    grace window compact/expire give via manifest history. Expired
    pins and pins from never-committed reshards (crash before the
    marker landed — their files are still the live manifests' files)
    are deleted here."""
    mdir = Path(lake_dir) / mf.MANIFEST_DIR
    pins = sorted(mdir.glob("_reshard_dead-*.json"))
    if not pins:
        return set()
    if keep is None:
        keep = 1
        meta_p = mdir / "_lake.json"
        if meta_p.exists():
            with open(meta_p) as f:
                keep = json.load(f).get("retain_versions", 1)
        keep = max(1, int(keep))
    log_ids = [e["commit"] for e in commit_log(lake_dir)]
    marker = mf.reshard_marker(lake_dir)
    live: set[str] = set()
    for p in pins:
        try:
            with open(p) as f:
                pin = json.load(f)
        except (OSError, json.JSONDecodeError):
            p.unlink(missing_ok=True)
            continue
        c = pin.get("commit")
        if c in log_ids:
            if len(log_ids) - 1 - log_ids.index(c) >= keep:
                p.unlink(missing_ok=True)  # grace over: files GC now
                continue
        elif marker is None or marker.get("commit") != c:
            p.unlink(missing_ok=True)  # reshard never committed
            continue
        live.update(str(Path(lake_dir) / rel) for rel in pin.get("files", ()))
    return live


def _gc(lake_dir: Path, manifests: dict[int, dict], pin_keep: int | None = None) -> int:
    """Remove data files not referenced by any manifest and stale
    delta-run dirs (both are invisible to readers by construction).
    Files pinned by a recent reshard (``_reshard_dead-*.json``) are
    kept until their retention grace expires; ``pin_keep`` overrides
    the lake's retain_versions for that window (expire_snapshots
    passes its ``keep``)."""
    live = {
        str(Path(lake_dir) / f["path"]) for m in manifests.values() for f in m["files"]
    }
    live |= {
        str(Path(lake_dir) / f["path"])
        for m in manifests.values()
        for h in m.get("history", [])
        for f in h["files"]
    }
    live |= _reshard_pinned(lake_dir, pin_keep)
    removed = 0
    for p in Path(lake_dir).glob("shard=*/*.parquet"):
        if str(p) not in live:
            try:
                p.unlink()
                removed += 1
            except OSError:
                pass
    inc = Path(lake_dir) / _INCOMING
    if inc.exists():
        for d in inc.iterdir():
            shutil.rmtree(d, ignore_errors=True)
            removed += 1
    # quarantine dirs whose per-commit manifest never landed (crash
    # mid-move): invisible to read_quarantine, safe to drop
    qroot = Path(lake_dir) / _QUARANTINE
    if qroot.exists():
        manifested = {
            p.stem.split("-", 1)[1]
            for p in (Path(lake_dir) / mf.MANIFEST_DIR).glob("quarantine-*.json")
        }
        for d in qroot.glob("commit=*"):
            if d.name.split("=", 1)[1] not in manifested:
                shutil.rmtree(d, ignore_errors=True)
                removed += 1
    return removed


def lake_files(lake_dir: str | Path) -> list[str]:
    manifests = mf.read_all_manifests(lake_dir)
    return sorted(
        str(Path(lake_dir) / f["path"]) for m in manifests.values() for f in m["files"]
    )


def lake_stats(lake_dir: str | Path) -> dict:
    """Manifest-level observability (metadata only — no data files are
    opened): the reference's ``run_info.json`` summary idea
    (``make_maps.py:1159-1176``) over the whole lake. Safe to call
    while a replay runs (manifests are atomic)."""
    lake_dir = Path(lake_dir)
    manifests = mf.read_all_manifests(lake_dir)
    qrecs = _quarantine_manifests(lake_dir)
    log = commit_log(lake_dir)
    meta = mf.lake_meta(lake_dir)
    fully_committed = _committed_segment_names(
        lake_dir, manifests, meta.get("num_shards", len(manifests))
    )
    run_counts = [len(m["files"]) for m in manifests.values()]
    return {
        "num_shards": meta.get("num_shards", len(manifests)),
        "retain_versions": meta.get("retain_versions", 1),
        "rows": sum(m["rows"] for m in manifests.values()),
        "bytes": sum(m["bytes"] for m in manifests.values()),
        "data_files": sum(run_counts),
        "max_runs_per_shard": max(run_counts, default=0),
        "salted_shards": sum(1 for m in manifests.values() if m.get("salt_k", 1) > 1),
        "committed_segments": len(fully_committed),
        "commits": len(log),
        "retained_history_versions": sum(
            len(m.get("history", [])) for m in manifests.values()
        ),
        "quarantined_rows": sum(r["rows"] for r in qrecs),
        "quarantine_commits": len(qrecs),
        "pending_reshard": mf.reshard_marker(lake_dir) is not None,
    }


def _predicate_fields(predicate, schema: pa.Schema) -> set[str]:
    """Columns of ``schema`` referenced by a ``pyarrow.dataset``
    expression. pyarrow exposes no public field introspection on
    ``Expression``, so probe: filter an empty table with one column
    removed at a time — a raise means the removed column is
    referenced. O(n_columns) empty-table filters, driver-side only."""
    refs = set()
    for name in schema.names:
        sub = pa.schema([f for f in schema if f.name != name]).empty_table()
        try:
            sub.filter(predicate)
        except Exception:
            refs.add(name)
    return refs


def _plan_predicate(predicate, fields: set | None = None):
    """Predicate plan for the multi-run (LSM) read path.

    Returns ``(scan_filter, post_filter, extra_cols)``:

    * a predicate referencing ONLY merge-key columns is LWW-safe to
      push pre-merge (every revision of a key carries the key, so
      filtering revisions == filtering merged rows) — it becomes the
      per-file scan filter and row-group-prunes exactly like
      ``read_conversation``; no post-merge filter needed;
    * any payload-referencing predicate must run AFTER the per-shard
      LWW merge (a matching stale revision may be superseded by a
      non-matching newer one); its referenced columns are added to the
      projection so a predicate on a non-projected column works the
      same as on a compacted lake (they are dropped again by the
      output projection).
    """
    if predicate is None:
        return None, None, set()
    refs = (
        fields
        if fields is not None
        else _predicate_fields(predicate, EVENT_SCHEMA)
    )
    if refs and refs <= set(MERGE_KEY):
        return predicate, None, set()
    return None, predicate, refs


def read_lake(
    lake_dir: str | Path,
    columns: list[str] | None = None,
    include_tombstones: bool = False,
    at_commit: str | None = None,
    predicate=None,
    ts_range: tuple | None = None,
    plan_info: dict | None = None,
) -> ray.data.Dataset:
    """The committed lake as a streaming Dataset (tombstones filtered,
    transcript columns selected). ``at_commit`` time-travels to the
    state as of that commit id (``commit_log``), as long as it is
    within the lake's ``retain_versions`` window. ``predicate`` (a
    ``pyarrow.dataset`` expression) is pushed to the SCAN on compacted
    lakes (row-group pruning). On multi-run LSM lakes the plan splits
    (``_plan_predicate``): a predicate referencing ONLY merge-key
    columns is LWW-safe pre-merge and pushes to every run file's scan
    (row-group pruning, payload never decodes); any other predicate is
    applied AFTER the per-shard LWW merge — pre-merge payload
    filtering would be wrong, since a matching stale revision may be
    superseded by a non-matching newer one. On BOTH layouts a
    predicate's referenced columns are auto-added to the scan
    projection and dropped again by the output projection, so
    predicates on non-projected columns behave identically everywhere
    (including when the late-added ``tool`` column forces a declared
    subset schema on the compacted path).

    Manifest zone maps: a predicate over a single low-cardinality
    payload column (``_ZONE_COLS``) additionally prunes whole FILES
    (compacted) / whole SHARDS (multi-run) from the plan using the
    per-file distinct-value sets the merge tasks record — sound
    because post-merge rows are a subset of stored rows — so a
    selective analytical read over a 64-shard uncompacted lake opens
    only the shards that can possibly match. ``ts_range=(lo, hi)``
    (either side None = unbounded; int µs or anything pyarrow casts to
    timestamp) is the time-slice read: rows whose MERGED revision is
    stamped inside the window, pruned the same way via per-file ts
    [min,max] zones and filtered post-merge (scan-level on compacted
    lakes). ``plan_info`` (optional dict) is filled with
    ``files_total/files_skipped`` or ``shards_total/shards_skipped``
    for observability."""
    manifests = mf.read_all_manifests(lake_dir)
    if at_commit is not None:
        manifests = _snapshot_manifests(Path(lake_dir), manifests, at_commit)
    multi_run = any(len(m["files"]) > 1 and m.get("salt_k", 1) < len(m["files"])
                    for m in manifests.values())
    pred_fields = (
        _predicate_fields(predicate, EVENT_SCHEMA) if predicate is not None else set()
    )
    zone_col = _zone_prunable_col(predicate, pred_fields)
    ts_lo = ts_hi = None
    ts_expr = None
    if ts_range is not None:
        import pyarrow.dataset as pads

        ts_lo, ts_hi = _ts_bounds_us(ts_range)
        ts_expr = (
            pads.field("ts") >= pa.scalar(ts_lo, pa.timestamp("us"))
        ) & (pads.field("ts") <= pa.scalar(ts_hi, pa.timestamp("us")))

    def empty_result() -> ray.data.Dataset:
        # the empty plan (fresh lake, or everything zone/ts-pruned —
        # the ROUTINE outcome of a quiet time slice) must present the
        # same schema shape as the non-empty path: projection applied,
        # tombstone columns only when requested
        sch = EVENT_SCHEMA if include_tombstones else TRANSCRIPT_SCHEMA
        t = sch.empty_table()
        if columns:
            t = t.select(columns)
        return ray.data.from_arrow(t)

    def may_match(f: dict) -> bool:
        z = f.get("zones") or {}
        if ts_range is not None:
            tz = z.get("ts")
            # a file whose [min,max] ts range misses the slice cannot
            # contribute a post-merge row inside it (subset argument)
            if tz is not None and (tz["min"] > ts_hi or tz["max"] < ts_lo):
                return False
        if zone_col is None:
            return True
        return _zone_may_match(z.get(zone_col), zone_col, predicate)

    n_total = sum(len(m["files"]) for m in manifests.values())
    # per-FILE pruning is only plan-relevant on the compacted layout;
    # multi-run shards must keep every run for the LWW merge and are
    # pruned whole-shard below
    files = sorted(
        str(Path(lake_dir) / f["path"])
        for m in manifests.values()
        for f in m["files"]
        if multi_run or may_match(f)
    )
    if plan_info is not None and not multi_run:
        plan_info["files_total"] = n_total
        plan_info["files_skipped"] = n_total - len(files)
    if not files:
        return empty_result()

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["op"], pa.scalar("D")))
        t = conform(t, TRANSCRIPT_SCHEMA)
        return t.select(columns) if columns else t

    if not multi_run:
        # fully compacted: plain streaming read. Column pruning is
        # pushed to the SCAN (plus `op` for the tombstone filter) —
        # on wide text rows reading two columns must not decode six.
        # The explicit schema null-fills late-added columns (e.g.
        # `tool`) in files written before the schema change.
        read_schema, need = None, None
        if columns:
            # predicate-referenced columns are auto-added to the scan
            # (and dropped again by the output projection), so a
            # predicate on a non-projected column behaves identically
            # on compacted and multi-run layouts — including when the
            # late-added `tool` forces a declared subset schema below
            want = set(columns) | {"op"} | pred_fields
            if ts_range is not None:
                want |= {"ts"}
            # EVENT_SCHEMA order: the scan validates batches against
            # the declared schema positionally
            need = [f.name for f in EVENT_SCHEMA if f.name in want]
            if "tool" in want:
                # `tool` is the late-added column: declare the subset
                # schema so pre-evolution files null-fill it
                read_schema = pa.schema([f for f in EVENT_SCHEMA if f.name in want])
            # else: leave schema unified from footers — the dataset
            # schema stays FULL, so the predicate may reference any
            # event column while only `need` is decoded
        scan_pred = predicate
        if ts_expr is not None:
            # compacted == already merged, so the time slice is safe
            # at the scan (row-group pruned by parquet ts stats)
            scan_pred = ts_expr if scan_pred is None else scan_pred & ts_expr
        ds = ray.data.read_parquet(
            files, columns=need, schema=read_schema, filter=scan_pred
        )
        if not include_tombstones:
            ds = ds.map_batches(finalize, batch_format="pyarrow")
        elif columns:
            ds = ds.map_batches(
                lambda t: t.select(columns), batch_format="pyarrow"
            )
        return ds

    # uncompacted LSM runs: LWW-merge per shard at read (one task per
    # shard; the merge key never crosses shards so this is exact).
    # Each task declares the shard's estimated decoded footprint so
    # admission is memory-capped, same as the write-side merges.
    lake_str = str(Path(lake_dir))
    scan_filter, post_filter, pred_cols = _plan_predicate(predicate, pred_fields)
    # zone-map shard skipping: a shard where NO file's recorded value
    # set can satisfy the (single-column payload) predicate is dropped
    # from the plan entirely — zero footer opens, zero merge tasks.
    # Files within a surviving shard are NEVER pruned individually:
    # the LWW merge needs every revision (a pruned newer non-matching
    # revision would resurrect an older matching one).
    shard_files, shards_total, shards_skipped = [], 0, 0
    for m in manifests.values():
        if not m["files"]:
            continue
        shards_total += 1
        if (zone_col is not None or ts_range is not None) and not any(
            may_match(f) for f in m["files"]
        ):
            shards_skipped += 1
            continue
        shard_files.append(
            {"files": [str(Path(lake_str) / f["path"]) for f in m["files"]]}
        )
    if plan_info is not None:
        plan_info["shards_total"] = shards_total
        plan_info["shards_skipped"] = shards_skipped
    if not shard_files:
        return empty_result()
    max_shard_bytes = max(
        sum(int(f["bytes"]) for f in m["files"]) for m in manifests.values()
    )
    mem = _merge_mem_bytes(0, max_shard_bytes, 1, 0)
    need_mr = (
        sorted(
            set(columns) | {"conv_id", "turn_idx", "ts", "op_seq", "op"} | pred_cols
        )
        if columns
        else None
    )

    def merge_read(batch) -> pa.Table:
        from ..state.merge_index import lww_merge_sorted

        out = []
        for flist in batch["files"]:
            tabs = []
            for f in list(flist):
                cols = need_mr
                if cols is not None:
                    present = set(pq.read_schema(f).names)
                    cols = [c for c in need_mr if c in present]
                # merge-key-only predicates push to the scan: parquet
                # row-group stats on the key-sorted run files prune
                # before any byte of payload decodes
                tabs.append(pq.read_table(f, columns=cols, filters=scan_filter))
            t = pa.concat_tables(tabs, promote_options="permissive")
            t = lww_merge_sorted(t)
            if post_filter is not None:
                t = t.filter(post_filter)
            if ts_expr is not None:
                # the time slice selects MERGED revisions, so it must
                # run post-merge here (an in-slice stale revision may
                # be superseded by an out-of-slice newer one)
                t = t.filter(ts_expr)
            if not include_tombstones:
                t = finalize(t)
            elif columns:
                # same output shape as the compacted branch: exactly
                # the requested columns, merge keys not leaked
                t = t.select(columns)
            out.append(t)
        return pa.concat_tables(out, promote_options="permissive")

    return ray.data.from_items(shard_files).map_batches(
        merge_read, batch_format="pandas", batch_size=1, memory=mem
    )


def _conv_zone_excludes(frec: dict, conv_ids) -> bool:
    """True when the file's recorded conv_id [min,max] zone proves it
    holds no revision of ANY looked-up key — sound pre-merge on
    multi-run shards (a file outside the range contributes nothing to
    those keys' LWW merges). Missing zone = may-match."""
    z = (frec.get("zones") or {}).get("conv_id")
    if z is None:
        return False
    return all(c < z["min"] or c > z["max"] for c in conv_ids)


def read_conversation(
    lake_dir: str | Path,
    conv_id: str,
    at_commit: str | None = None,
    plan_info: dict | None = None,
) -> pa.Table:
    """Point lookup: hash-route ``conv_id`` to its single owning shard
    and read ONLY that shard's files (files whose manifest conv_id
    [min,max] zone excludes the key are skipped with zero footer
    opens; survivors are row-group pruned by a conv_id filter — shard
    files are sorted by (conv_id, turn_idx), so parquet min/max
    statistics skip non-matching row groups), then LWW-merge and drop
    tombstones. At 10^10-row scale this touches a handful of files in
    one shard, never the lake. ``plan_info`` (optional dict) is filled
    with ``files_total/files_skipped``. Returns the conversation's
    turns in turn_idx order (empty table if unknown)."""
    lake_dir = Path(lake_dir)
    manifests = mf.read_all_manifests(lake_dir)
    if at_commit is not None:
        manifests = _snapshot_manifests(lake_dir, manifests, at_commit)
    if not manifests:
        return TRANSCRIPT_SCHEMA.empty_table()
    num_shards = mf.lake_meta(lake_dir)["num_shards"]
    sh = int(shard_of(hash_u64(np.array([conv_id], dtype=object)), num_shards)[0])
    m = manifests.get(sh)
    if m is None or not m["files"]:
        return TRANSCRIPT_SCHEMA.empty_table()
    from ..state.merge_index import lww_merge_sorted

    tabs, skipped = [], 0
    for frec in m["files"]:
        if _conv_zone_excludes(frec, (conv_id,)):
            skipped += 1
            continue
        t = pq.read_table(
            lake_dir / frec["path"], filters=[("conv_id", "==", conv_id)]
        )
        if t.num_rows:
            tabs.append(t)
    if plan_info is not None:
        plan_info["files_total"] = len(m["files"])
        plan_info["files_skipped"] = skipped
    if not tabs:
        return TRANSCRIPT_SCHEMA.empty_table()
    t = lww_merge_sorted(pa.concat_tables(tabs, promote_options="permissive"))
    t = t.filter(pc.not_equal(t["op"], pa.scalar("D")))
    t = conform(t, TRANSCRIPT_SCHEMA)
    return t.take(pc.sort_indices(t, sort_keys=[("turn_idx", "ascending")]))


def read_conversations(
    lake_dir: str | Path,
    conv_ids,
    columns: list[str] | None = None,
    at_commit: str | None = None,
    plan_info: dict | None = None,
) -> ray.data.Dataset:
    """Batch point lookup: fetch many conversations from a huge lake
    as a streaming Dataset — the "sample 10k transcripts out of 10^10
    rows" read a training-data pipeline issues constantly. The plan
    touches ONLY the shards that own a looked-up key (hash routing),
    and within each, only the files whose manifest conv_id zone can
    contain one (exact pre-merge pruning — conv_id is the merge key,
    so filtering revisions == filtering merged rows); survivors scan
    with an ``isin`` filter restricted to that shard's own targets
    (row-group pruned). One merge task per owning shard, LWW +
    tombstone drop per shard, no global sort (each conversation's
    turns arrive together and turn-ordered within its shard's block).
    ``plan_info`` is filled with shards/files totals and skip counts.
    """
    import pyarrow.dataset as pads

    lake_dir = Path(lake_dir)
    conv_ids = sorted(set(conv_ids))
    manifests = mf.read_all_manifests(lake_dir)
    if at_commit is not None:
        manifests = _snapshot_manifests(lake_dir, manifests, at_commit)
    sch = TRANSCRIPT_SCHEMA

    def empty_result() -> ray.data.Dataset:
        t = sch.empty_table()
        return ray.data.from_arrow(t.select(columns) if columns else t)

    if not manifests or not conv_ids:
        if plan_info is not None:
            plan_info.update(shards_total=len(manifests), shards_skipped=len(manifests),
                             files_total=0, files_skipped=0)
        return empty_result()
    num_shards = mf.lake_meta(lake_dir)["num_shards"]
    ids_arr = np.array(conv_ids, dtype=object)
    owner = shard_of(hash_u64(ids_arr), num_shards)
    by_shard: dict[int, list[str]] = {}
    for cid, sh in zip(conv_ids, owner):
        by_shard.setdefault(int(sh), []).append(cid)

    items, f_total, f_skip = [], 0, 0
    for sh, targets in sorted(by_shard.items()):
        m = manifests.get(sh)
        if m is None or not m["files"]:
            continue
        f_total += len(m["files"])
        keep = [f["path"] for f in m["files"]
                if not _conv_zone_excludes(f, targets)]
        f_skip += len(m["files"]) - len(keep)
        if keep:
            items.append({
                "files": [str(lake_dir / p) for p in keep],
                "targets": targets,
            })
    if plan_info is not None:
        plan_info["shards_total"] = sum(1 for m in manifests.values() if m["files"])
        plan_info["shards_skipped"] = plan_info["shards_total"] - len(items)
        plan_info["files_total"] = f_total
        plan_info["files_skipped"] = f_skip
    if not items:
        return empty_result()

    need = (
        sorted(set(columns) | {"conv_id", "turn_idx", "ts", "op_seq", "op"})
        if columns
        else None
    )

    def fetch(batch) -> pa.Table:
        from ..state.merge_index import lww_merge_sorted

        out = []
        for flist, targets in zip(batch["files"], batch["targets"]):
            flt = pads.field("conv_id").isin(list(targets))
            tabs = []
            for f in list(flist):
                cols = need
                if cols is not None:
                    present = set(pq.read_schema(f).names)
                    cols = [c for c in need if c in present]
                tabs.append(pq.read_table(f, columns=cols, filters=flt))
            t = lww_merge_sorted(
                pa.concat_tables(tabs, promote_options="permissive")
            )
            t = t.filter(pc.not_equal(t["op"], pa.scalar("D")))
            t = conform(t, sch)
            if columns:
                t = t.select(columns)
            out.append(t)
        return pa.concat_tables(out, promote_options="permissive")

    return ray.data.from_items(items).map_batches(
        fetch, batch_format="pandas", batch_size=1
    )


_DIFF_SLIM_COLS = ["conv_id", "turn_idx", "ts", "op_seq", "op"]


def _flat(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.Array):
        return col
    ca = col.combine_chunks()
    if isinstance(ca, pa.Array):
        return ca
    return ca.chunk(0) if ca.num_chunks else pa.array([], type=col.type)


def _diff_states(
    a: pa.Table, b: pa.Table, out_schema: pa.Schema, include_before: bool = False
) -> pa.Table:
    """Changed-key detection between two per-shard LWW states, pure
    Arrow/numpy (round-3 verdict #2: the old pandas left-merge copied
    every wide ``text`` column of BOTH snapshots just to compare
    keys+stamps). ``a`` carries only ``_DIFF_SLIM_COLS``; ``b`` is the
    full ``to`` state, conformed to EVENT_SCHEMA. The payload is
    touched exactly once, by the final ``filter`` on the emit mask —
    and ``op_seq`` compares int64-to-int64 (never the float64 upcast a
    pandas left merge introduces, which goes imprecise above 2^53)."""
    n_a, n_b = a.num_rows, b.num_rows
    if n_b == 0:
        return out_schema.empty_table()
    # composite int64 key: dictionary-encode conv_id across BOTH sides
    # (shared dictionary -> comparable codes), then code<<32 | turn_idx
    conv = pa.concat_arrays(
        [
            _flat(a["conv_id"]).cast(pa.string()),
            _flat(b["conv_id"]).cast(pa.string()),
        ]
    )
    codes = conv.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn_a = _flat(a["turn_idx"]).to_numpy(zero_copy_only=False).astype(np.int64)
    turn_b = _flat(b["turn_idx"]).to_numpy(zero_copy_only=False).astype(np.int64)
    # mask the turn component to its 32 bits: a negative int32
    # turn_idx (valid at route(), which only checks non-null) would
    # otherwise sign-extend into the conv-code bits and collide keys
    # ACROSS conversations
    key_a = (codes[:n_a] << 32) | (turn_a & 0xFFFFFFFF)
    key_b = (codes[n_a:] << 32) | (turn_b & 0xFFFFFFFF)
    is_del_b = pc.equal(b["op"], pa.scalar("D")).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    if n_a == 0:
        found = np.zeros(n_b, dtype=bool)
        same = found
        dead_before = np.ones(n_b, dtype=bool)
    else:
        ord_a = np.argsort(key_a, kind="stable")
        sa = key_a[ord_a]
        pos = np.searchsorted(sa, key_b)
        safe = np.clip(pos, 0, n_a - 1)
        found = (pos < n_a) & (sa[safe] == key_b)
        ai = ord_a[safe]  # index into a for found rows (garbage elsewhere)
        ts_a = _flat(a["ts"]).to_numpy(zero_copy_only=False)
        ts_b = _flat(b["ts"]).to_numpy(zero_copy_only=False)
        seq_a = _flat(a["op_seq"]).to_numpy(zero_copy_only=False)
        seq_b = _flat(b["op_seq"]).to_numpy(zero_copy_only=False)
        dead_a = pc.equal(a["op"], pa.scalar("D")).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        same = found & (ts_a[ai] == ts_b) & (seq_a[ai] == seq_b)
        dead_before = np.where(found, dead_a[ai], True)
    # a tombstone over a key that was absent or already dead is a no-op
    # for the consumer — emit nothing
    emit = ~same & ~(is_del_b & dead_before)
    out = b.filter(pa.array(emit))
    change = np.where(
        is_del_b[emit], "delete", np.where(dead_before[emit], "insert", "update")
    )
    out = out.append_column(
        out_schema.field("change"), pa.array(change, type=pa.string())
    )
    if include_before:
        # Debezium-style before-image STAMPS of the superseded live
        # revision (null on insert — logically the key did not exist;
        # a dead prior revision is not a before-image). The slim
        # ``a`` columns carry everything needed; the old payload is
        # never read.
        k = int(np.count_nonzero(emit))
        if n_a == 0:
            bts = pa.nulls(k, pa.timestamp("us"))
            bseq = pa.nulls(k, pa.int64())
        else:
            has = (found & ~dead_before)[emit]
            idx = ai[emit]
            bts = pa.array(
                ts_a[idx].astype("datetime64[us]"),
                type=pa.timestamp("us"),
                mask=~has,
            )
            bseq = pa.array(
                seq_a[idx].astype(np.int64), type=pa.int64(), mask=~has
            )
        out = out.append_column(out_schema.field("before_ts"), bts)
        out = out.append_column(out_schema.field("before_op_seq"), bseq)
    return out.cast(out_schema)


def lake_diff(
    lake_dir: str | Path,
    from_commit: str,
    to_commit: str,
    include_before: bool = False,
) -> ray.data.Dataset:
    """Row-level changelog between two retained snapshots — the CDC
    *output* feed: what a downstream consumer must apply to move from
    ``from_commit``'s state to ``to_commit``'s. Streaming and
    per-shard distributed (the merge key never crosses shards, so each
    task diffs one shard's two LWW states independently).

    Emits the ``to``-side row per changed key plus a ``change`` column:
    ``insert`` (key absent before), ``update`` (newer revision),
    ``delete`` (newest revision became a tombstone). Un-changed keys
    emit nothing. Both commits must be within the retention window.

    ``include_before=True`` adds the Debezium-style before-image
    STAMPS ``before_ts`` / ``before_op_seq`` of the superseded live
    revision (null on insert) — enough for a consumer to verify it is
    applying the change to the exact state it holds, without the old
    payload ever being read (the from-side scan stays slim)."""
    lake_dir = Path(lake_dir)
    manifests = mf.read_all_manifests(lake_dir)
    m_from = _snapshot_manifests(lake_dir, manifests, from_commit)
    m_to = _snapshot_manifests(lake_dir, manifests, to_commit)
    items = []
    max_bytes = 0
    for sh in sorted(set(m_from) | set(m_to)):
        a, b = m_from.get(sh, {}).get("files", []), m_to.get(sh, {}).get("files", [])
        if [f["path"] for f in a] == [f["path"] for f in b]:
            continue  # untouched shard: identical files, no diff to compute
        max_bytes = max(
            max_bytes, sum(int(f["bytes"]) for f in a) + sum(int(f["bytes"]) for f in b)
        )
        items.append(
            {
                "from": [str(lake_dir / f["path"]) for f in a],
                "to": [str(lake_dir / f["path"]) for f in b],
            }
        )
    out_fields = list(EVENT_SCHEMA) + [pa.field("change", pa.string())]
    if include_before:
        out_fields += [
            pa.field("before_ts", pa.timestamp("us")),
            pa.field("before_op_seq", pa.int64()),
        ]
    out_schema = pa.schema(out_fields)
    if not items:
        return ray.data.from_arrow(out_schema.empty_table())
    mem = _merge_mem_bytes(0, max_bytes, 1, 0)

    def diff_shard(batch) -> pa.Table:
        from ..state.merge_index import lww_merge_sorted

        def state(files, columns=None, filters=None) -> pa.Table:
            target = (
                EVENT_SCHEMA
                if columns is None
                else pa.schema([EVENT_SCHEMA.field(c) for c in columns])
            )
            if not files:
                return target.empty_table()
            t = pa.concat_tables(
                [pq.read_table(f, columns=columns, filters=filters) for f in files],
                promote_options="permissive",
            )
            return conform(lww_merge_sorted(t), target)

        slim_schema = pa.schema(
            [EVENT_SCHEMA.field(c) for c in _DIFF_SLIM_COLS]
            + [f for f in out_schema if f.name not in EVENT_SCHEMA.names]
        )
        out = []
        for frm, to in zip(batch["from"], batch["to"]):
            # the ``from`` side never needs the payload: read only the
            # key/stamp/op columns (row-group pruning at the scan), so
            # the wide ``text`` of the old snapshot never leaves parquet
            a = state(list(frm), columns=_DIFF_SLIM_COLS)
            # adaptive two-pass on the ``to`` side: a slim stamp pass
            # finds the changed keys first; when the change is SPARSE
            # (the steady-state CDC shape) the payload is then read
            # with a conv_id-set filter — shard files are sorted by
            # (conv_id, turn_idx), so parquet min/max stats prune
            # untouched row groups and unchanged text never leaves
            # disk. Dense changes fall back to one full read (the
            # two-pass would re-read most of the payload anyway).
            b_slim = state(list(to), columns=_DIFF_SLIM_COLS)
            probe = _diff_states(
                a, b_slim, slim_schema, include_before=include_before
            )
            if probe.num_rows == 0:
                out.append(out_schema.empty_table())
                continue
            if probe.num_rows < 0.2 * max(1, b_slim.num_rows):
                import pyarrow.dataset as pads

                convs = pc.unique(_flat(probe["conv_id"]))
                b = state(list(to), filters=pads.field("conv_id").isin(convs))
            else:
                b = state(list(to))
            out.append(_diff_states(a, b, out_schema, include_before=include_before))
        return pa.concat_tables(out, promote_options="permissive")

    return ray.data.from_items(items).map_batches(
        diff_shard, batch_format="pandas", batch_size=1, memory=mem
    )


def lake_final_table(lake_dir: str | Path, at_commit: str | None = None) -> pa.Table:
    """Driver-side materialization for tests/small scales only."""
    if at_commit is None:
        files = lake_files(lake_dir)
    else:
        manifests = _snapshot_manifests(
            Path(lake_dir), mf.read_all_manifests(lake_dir), at_commit
        )
        files = sorted(
            str(Path(lake_dir) / f["path"])
            for m in manifests.values()
            for f in m["files"]
        )
    if not files:
        return TRANSCRIPT_SCHEMA.empty_table()
    from ..state.merge_index import lww_merge_sorted

    tabs = [pq.read_table(f) for f in files]
    t = pa.concat_tables(tabs, promote_options="permissive")
    t = lww_merge_sorted(t)  # collapse uncompacted LSM runs
    t = t.filter(pc.not_equal(t["op"], pa.scalar("D")))
    t = conform(t, TRANSCRIPT_SCHEMA)
    order = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return t.take(order)
