"""The CDC replay engine: WAL segments → partitioned Parquet lake.

Ray-Data-first dataflow (one streaming pipeline, no driver row loops):

    read_parquet(pending segments, grouped by physical schema)
      → map_batches(conform to unified schema)        # schema evolution
      → map_batches(normalize + hash-route)           # add merge_group
      → groupby("merge_group").map_groups(merge)      # shard-local LWW
      → (small) commit-stats rows → driver writes manifests (commit)

Scale properties:
  * The only all-to-all exchange is the groupby on ``merge_group`` and
    it moves DELTA rows only — base state is read shard-locally inside
    each merge task and never shuffled.
  * Skew: hot shards (Zipf conv_id activity) are salted — split into k
    sub-keyspaces by a second hash of ``conv_id`` so one task never owns
    an unbounded group (SURVEY §4 "skew: unhandled" → handled). A
    conversation never crosses a salt boundary, so per-conversation
    turn ordering survives.
  * Exactly-once: merge output files are invisible until the per-shard
    manifest (written driver-side, after the whole commit's tasks
    finished) references them; re-applied segments are harmless because
    the merge is LWW with retained tombstones.

Reference parity notes: stage boundary on durable storage mirrors the
reference's staging/ → processed/ convention
(``scripts/process_layers.py:50-52``); run manifests mirror
``run_info.json`` (``make_maps.py:1159-1176``).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..state.merge_index import ShardMerger, _HASH_KEY
from . import manifest as mf
from .schema import EVENT_SCHEMA, TRANSCRIPT_SCHEMA, conform, unify

_MAX_SALT = 4096
_SENTINEL_OP = "~RESALT~"
_VALID_OPS = ("I", "U", "D")


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


def _pending_segments(
    segments: list[str], manifests: dict[int, dict], num_shards: int
) -> list[str]:
    """Segments not committed by every one of the ``num_shards`` shard
    manifests (a missing manifest counts as nothing committed — covers
    a crash before that shard's first manifest write). Re-applying a
    segment some shards already saw is safe (LWW-idempotent)."""
    committed_by_all: set | None = None
    for sh in range(num_shards):
        m = manifests.get(sh)
        s = set(m["committed_segments"]) if m else set()
        committed_by_all = s if committed_by_all is None else committed_by_all & s
        if not committed_by_all:
            return segments
    return [p for p in segments if Path(p).name not in committed_by_all]


def _read_unified(pending: list[str], parallelism: int = -1) -> tuple[ray.data.Dataset, pa.Schema]:
    """Read heterogeneous-schema segments as ONE dataset conformed to
    the unified schema — the explicit Arrow schema-reconciliation pass
    (SURVEY §1.3: the reference probes/repairs schemas ad hoc;
    ``process_layers.py:260-273``)."""
    groups: dict[tuple, list[str]] = {}
    schemas: dict[tuple, pa.Schema] = {}
    for p in pending:
        s = pq.read_schema(p)
        key = tuple(zip(s.names, (str(t) for t in s.types)))
        groups.setdefault(key, []).append(p)
        schemas[key] = s
    unified = unify(list(schemas.values()))

    def conform_fn(batch: pa.Table) -> pa.Table:
        return conform(batch, unified)

    ds = None
    for key, files in groups.items():
        d = ray.data.read_parquet(files)
        if key != tuple(zip(unified.names, (str(t) for t in unified.types))):
            d = d.map_batches(conform_fn, batch_format="pyarrow")
        ds = d if ds is None else ds.union(d)
    return ds, unified


def _shard_counts(pending: list[str], num_shards: int) -> dict[int, int]:
    """Cheap column-pruned pre-pass: pending event count per shard,
    used only to decide salting. Reads a single column and partially
    aggregates inside map_batches before a tiny groupby."""
    ds = ray.data.read_parquet(pending, columns=["conv_id"])

    def partial(batch: pa.Table) -> pa.Table:
        sh = shard_of(hash_u64(batch["conv_id"]), num_shards)
        uniq, cnt = np.unique(sh, return_counts=True)
        return pa.table({"shard": uniq, "cnt": cnt.astype(np.int64)})

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("shard").sum("cnt")
    return {r["shard"]: r["sum(cnt)"] for r in agg.take_all()}


def replay(
    wal_dir: str | Path,
    lake_dir: str | Path,
    num_shards: int = 32,
    salt_threshold: int = 500_000,
    salt: str = "auto",
    batch_size: int = 65536,
    max_segments: int | None = None,
) -> dict:
    """Replay all uncommitted WAL segments into the lake. Returns commit
    stats. Idempotent: call again after a crash and it resumes from the
    per-shard manifests."""
    lake_dir = Path(lake_dir)
    # lake-level meta pins num_shards for the lake's lifetime (the hash
    # partitioning key must be stable across commits and restarts).
    meta_path = lake_dir / mf.MANIFEST_DIR / "_lake.json"
    if meta_path.exists():
        with open(meta_path) as f:
            num_shards = json.load(f)["num_shards"]
    else:
        mf.atomic_write_json({"num_shards": num_shards}, meta_path)

    segments = list_segments(wal_dir)
    if max_segments is not None:
        segments = segments[:max_segments]
    manifests = mf.read_all_manifests(lake_dir)
    pending = _pending_segments(segments, manifests, num_shards)
    if not pending:
        return {"committed_segments": 0, "shards_updated": 0}

    # --- decide per-shard salting (skew defense) -------------------
    salt_k: dict[int, int] = {}
    if salt == "auto":
        counts = _shard_counts(pending, num_shards)
        for sh, c in counts.items():
            k = int(np.ceil(c / salt_threshold))
            if k > 1:
                salt_k[sh] = min(k, _MAX_SALT - 1)

    old_files: dict[int, list[str]] = {
        sh: [f["path"] for f in m["files"]] for sh, m in manifests.items()
    }
    old_k: dict[int, int] = {sh: m.get("salt_k", 1) for sh, m in manifests.items()}

    ds, unified = _read_unified(pending)

    def route(batch: pa.Table) -> pa.Table:
        """Validate ops + compute merge_group = shard * MAX_SALT + salt."""
        valid = pc.is_in(batch["op"], value_set=pa.array(_VALID_OPS))
        if not pc.all(valid).as_py():
            batch = batch.filter(valid)
        h = hash_u64(batch["conv_id"])
        sh = shard_of(h, num_shards)
        slt = np.zeros(len(sh), dtype=np.int64)
        for hot, k in salt_k.items():
            m = sh == hot
            if m.any():
                slt[m] = salt_of(h[m], num_shards, k)
        mg = sh * _MAX_SALT + slt
        return batch.append_column("merge_group", pa.array(mg, type=pa.int64()))

    ds = ds.map_batches(route, batch_format="pyarrow", batch_size=batch_size)

    # --- sentinels force every salt group of a re-salted shard to
    # materialize, so the rewrite covers the whole shard keyspace even
    # for sub-groups that received no delta this commit.
    sentinel_groups = []
    for sh, k in salt_k.items():
        if old_k.get(sh, 1) != k:
            sentinel_groups.extend(sh * _MAX_SALT + j for j in range(k))
    for sh, k in old_k.items():
        if k > 1 and sh not in salt_k:
            # shard was salted before, collapses back to k=1 on next touch
            pass
    if sentinel_groups:
        n = len(sentinel_groups)
        sent = conform(
            pa.table(
                {
                    "op": pa.array([_SENTINEL_OP] * n),
                    "op_seq": pa.array([-1] * n, type=pa.int64()),
                    "conv_id": pa.array([""] * n),
                    "turn_idx": pa.array([0] * n, type=pa.int32()),
                }
            ),
            unified,
        ).append_column("merge_group", pa.array(sentinel_groups, type=pa.int64()))
        ds = ds.union(ray.data.from_arrow(sent))

    new_version = {sh: m["version"] + 1 for sh, m in manifests.items()}
    lake_str = str(lake_dir)

    def merge(group: pa.Table) -> pa.Table:
        mg = group["merge_group"][0].as_py()
        sh, slt = divmod(mg, _MAX_SALT)
        k = salt_k.get(sh, 1)
        version = new_version.get(sh, 1)
        delta = group.drop_columns(["merge_group"])
        real = pc.not_equal(delta["op"], pa.scalar(_SENTINEL_OP))
        if not pc.all(real).as_py():
            delta = delta.filter(real)

        base = None
        files = old_files.get(sh, [])
        if files:
            tabs = [pq.read_table(str(Path(lake_str) / f)) for f in files]
            base = pa.concat_tables(tabs, promote_options="permissive")
            if base.num_rows and (k > 1 or old_k.get(sh, 1) > 1):
                h = hash_u64(base["conv_id"])
                base = base.filter(pa.array(salt_of(h, num_shards, k) == slt))
            if base.num_rows and base.schema != delta.schema:
                base = conform(base, unify([base.schema, delta.schema]))
                delta = conform(delta, base.schema)

        merger = ShardMerger(base)
        if delta.num_rows:
            merger.apply(delta)
        out = merger.finish()
        if out is None:
            out = delta  # empty table with right schema

        rel = f"shard={sh:05d}/v{version:06d}-s{slt:03d}.parquet"
        nbytes = mf.atomic_write_table(out, Path(lake_str) / rel)
        return pa.table(
            {
                "shard": pa.array([sh], type=pa.int64()),
                "salt": pa.array([slt], type=pa.int64()),
                "k": pa.array([k], type=pa.int64()),
                "version": pa.array([version], type=pa.int64()),
                "path": pa.array([rel]),
                "rows": pa.array([out.num_rows], type=pa.int64()),
                "bytes": pa.array([nbytes], type=pa.int64()),
            }
        )

    stats_rows = (
        ds.groupby("merge_group")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )

    # --- commit: manifest-last, one per shard ----------------------
    seg_names = [Path(p).name for p in pending]
    lineage = [
        {"segment": Path(p).name, "offset_start": mf.segment_offset(p)} for p in pending
    ]
    by_shard: dict[int, list[dict]] = {}
    for r in stats_rows:
        by_shard.setdefault(int(r["shard"]), []).append(r)

    new_manifests: dict[int, dict] = dict(manifests)
    total_rows = 0
    for sh, rows in sorted(by_shard.items()):
        k = int(rows[0]["k"])
        old_m = manifests.get(sh)
        new_entries = {
            int(r["salt"]): {
                "salt": int(r["salt"]),
                "path": r["path"],
                "rows": int(r["rows"]),
                "bytes": int(r["bytes"]),
            }
            for r in rows
        }
        if old_m is not None and old_m.get("salt_k", 1) == k and k > 1:
            entries = {f["salt"]: f for f in old_m["files"]}
            entries.update(new_entries)  # untouched sub-groups keep old files
        else:
            entries = new_entries
        files = [entries[s] for s in sorted(entries)]
        committed = sorted(
            set(old_m["committed_segments"] if old_m else []) | set(seg_names)
        )
        m = {
            "shard": sh,
            "version": int(rows[0]["version"]),
            "salt_k": k,
            "files": files,
            "committed_segments": committed,
            "rows": sum(f["rows"] for f in files),
            "bytes": sum(f["bytes"] for f in files),
            "lineage": (old_m.get("lineage", []) if old_m else []) + lineage,
        }
        mf.atomic_write_json(m, mf.manifest_path(lake_dir, sh))
        new_manifests[sh] = m
        total_rows += m["rows"]

    # every shard not updated this commit — including shards that have
    # never seen data — still records the segments as committed, so
    # resume can prove full coverage from the manifests alone.
    for sh in range(num_shards):
        if sh in by_shard:
            continue
        old_m = manifests.get(sh)
        if old_m is not None:
            m = dict(old_m)
            m["committed_segments"] = sorted(
                set(old_m["committed_segments"]) | set(seg_names)
            )
        else:
            m = {
                "shard": sh,
                "version": 0,
                "salt_k": 1,
                "files": [],
                "committed_segments": sorted(seg_names),
                "rows": 0,
                "bytes": 0,
                "lineage": lineage,
            }
        mf.atomic_write_json(m, mf.manifest_path(lake_dir, sh))
        new_manifests[sh] = m

    removed = _gc(lake_dir, new_manifests)
    return {
        "committed_segments": len(pending),
        "shards_updated": len(by_shard),
        "lake_rows": total_rows,
        "salted_shards": len(salt_k),
        "gc_files": removed,
    }


def _gc(lake_dir: Path, manifests: dict[int, dict]) -> int:
    live = {
        str(Path(lake_dir) / f["path"]) for m in manifests.values() for f in m["files"]
    }
    removed = 0
    for p in Path(lake_dir).glob("shard=*/*.parquet"):
        if str(p) not in live:
            try:
                p.unlink()
                removed += 1
            except OSError:
                pass
    return removed


def lake_files(lake_dir: str | Path) -> list[str]:
    manifests = mf.read_all_manifests(lake_dir)
    return sorted(
        str(Path(lake_dir) / f["path"]) for m in manifests.values() for f in m["files"]
    )


def read_lake(
    lake_dir: str | Path,
    columns: list[str] | None = None,
    include_tombstones: bool = False,
) -> ray.data.Dataset:
    """The committed lake as a streaming Dataset (tombstones filtered,
    transcript columns selected)."""
    files = lake_files(lake_dir)
    if not files:
        return ray.data.from_arrow(TRANSCRIPT_SCHEMA.empty_table())
    ds = ray.data.read_parquet(files)
    if not include_tombstones:

        def finalize(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(t["op"], pa.scalar("D")))
            t = conform(t, TRANSCRIPT_SCHEMA)
            return t.select(columns) if columns else t

        ds = ds.map_batches(finalize, batch_format="pyarrow")
    return ds


def lake_final_table(lake_dir: str | Path) -> pa.Table:
    """Driver-side materialization for tests/small scales only."""
    files = lake_files(lake_dir)
    if not files:
        return TRANSCRIPT_SCHEMA.empty_table()
    tabs = [pq.read_table(f) for f in files]
    t = pa.concat_tables(tabs, promote_options="permissive")
    t = t.filter(pc.not_equal(t["op"], pa.scalar("D")))
    t = conform(t, TRANSCRIPT_SCHEMA)
    order = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return t.take(order)
