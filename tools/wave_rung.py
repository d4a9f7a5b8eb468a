"""10^9-event rung via WAL waves: generate -> replay(append) -> GC.

The full 10^9-event stream (~90+ GB of WAL parquet) never co-resides
on this single VM: each wave generates one bounded slice of the ONE
logical stream (disjoint conv-id / op_seq / segment-name spaces via
``chunk_base``), replays it into the same lake as append-mode
micro-batch commits, then unlinks the committed segments. This is the
sandbox's strongest proxy for the 10^10 posture: commit cost must stay
flat (proportional to the delta, never the lake) across every wave,
and the lake is the only thing that grows.

The stream is update-heavy (update_frac=6.0 -> ~91 delivered events
per conversation), which is the realistic CDC shape at this event
count: 10^9 binlog events over ~132M live rows, not 10^9 inserts.

Usage (defaults = the recorded BASELINE.md rung):
    python tools/wave_rung.py [--waves 10] [--convs-per-wave 1100000]
        [--wal /dev/shm/graft_rung/wal] [--lake /tmp/graft_rung/lake]
        [--num-shards 64] [--num-cpus 32] [--smoke]

Prints one JSON line per wave and a final summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import logging
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _spill_mb() -> float | None:
    """Cumulative object-store spill (MiB) for THIS session, from the
    raylet log's periodic "Spilled N MiB" counter. (The previous
    memory_summary() path can never work in this container — no grpc
    module — and its silent 0.0 fallback under-reported spill; spilled
    object FILES are deleted on release, so the log counter is the
    only honest cumulative source.) 0.0 = no spill line yet; None =
    log unavailable — never fake a zero."""
    import re

    try:
        import ray._private.worker as _w

        log = Path(_w._global_node.get_session_dir_path()) / "logs" / "raylet.out"
        with open(log, "rb") as f:
            f.seek(0, 2)
            size = f.tell()
            f.seek(max(0, size - 512 * 1024))
            txt = f.read().decode(errors="replace")
        hits = re.findall(r"Spilled (\d+) MiB", txt)
        if hits:
            return float(hits[-1])
        # no hit in the scanned tail: only a FULLY scanned log proves
        # "no spill"; a long-scrolled log may have pushed the last
        # spill line out of the window — unknown, not zero
        return 0.0 if size <= 512 * 1024 else None
    except Exception:
        return None


def _dir_bytes(p: Path) -> int:
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--waves", type=int, default=10)
    ap.add_argument("--convs-per-wave", type=int, default=1_100_000)
    ap.add_argument("--chunk-convs", type=int, default=34_375)
    ap.add_argument("--wal", default="/dev/shm/graft_rung/wal")
    ap.add_argument("--lake", default="/tmp/graft_rung/lake")
    ap.add_argument("--num-shards", type=int, default=64)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--object-store-gb", type=float, default=20.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--seg-size", type=int, default=500_000)
    ap.add_argument("--keep", action="store_true", help="keep the lake")
    ap.add_argument(
        "--smoke", action="store_true",
        help="tiny 3-wave sanity run with an oracle-equality check",
    )
    args = ap.parse_args()

    if args.smoke:
        args.waves, args.convs_per_wave, args.chunk_convs = 3, 2_000, 500
        args.seg_size = 5_000
        args.num_cpus = min(args.num_cpus, 8)
        args.object_store_gb = min(args.object_store_gb, 2.0)
        args.wal = "/tmp/graft_rung_smoke/wal"
        args.lake = "/tmp/graft_rung_smoke/lake"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.num_cpus,
            include_dashboard=False, logging_level=logging.ERROR,
            object_store_memory=int(args.object_store_gb * (1 << 30)),
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal_parallel
    from etl_geodata_pipeline_ray.cdc.replay import compact, lake_stats, replay
    from etl_geodata_pipeline_ray.cdc.validate import validate_lake

    import pyarrow.parquet as pq

    wal, lake = Path(args.wal), Path(args.lake)
    shutil.rmtree(wal, ignore_errors=True)
    shutil.rmtree(lake, ignore_errors=True)
    if args.smoke:
        combined = Path(args.wal).parent / "combined"
        shutil.rmtree(combined, ignore_errors=True)
        combined.mkdir(parents=True)

    spec = WalSpec(
        n_convs=args.convs_per_wave, update_frac=6.0, delete_frac=0.03,
        dup_rate=0.08, shuffle_window=300, schema_change_frac=0.5,
        zipf_s=1.1, seg_size=args.seg_size, seed=args.seed,
    )
    chunks_per_wave = -(-spec.n_convs // args.chunk_convs)

    total_events = 0
    total_gen = total_replay = 0.0
    t_start = time.perf_counter()
    for w in range(args.waves):
        t0 = time.perf_counter()
        paths = write_wal_parallel(
            spec, wal, chunk_convs=args.chunk_convs,
            chunk_base=w * chunks_per_wave, task_cpus=1,
        )
        gen_s = time.perf_counter() - t0
        wal_rows = sum(pq.read_metadata(p).num_rows for p in paths)
        wal_bytes = sum(p.stat().st_size for p in paths)
        if args.smoke:
            for p in paths:
                shutil.copy(p, combined / p.name)

        t1 = time.perf_counter()
        st = replay(wal, lake, num_shards=args.num_shards, mode="append")
        replay_s = time.perf_counter() - t1
        for p in paths:  # GC the committed wave: the stream never co-resides
            p.unlink()

        total_events += wal_rows
        total_gen += gen_s
        total_replay += replay_s
        print(json.dumps({
            "wave": w, "segments": len(paths), "events": wal_rows,
            "wal_gb": round(wal_bytes / 1e9, 2), "gen_s": round(gen_s, 1),
            "replay_s": round(replay_s, 1),
            "events_per_s": int(wal_rows / replay_s),
            "micro_batches": st.get("micro_batches", 1),
            "lake_rows": st.get("lake_rows"),
            "shards_compacted": st.get("shards_compacted", 0),
            "timings": st.get("timings"),
            "lake_gb": round(_dir_bytes(lake) / 1e9, 2),
            "spilled_mb": _spill_mb(),
            "cum_events": total_events,
        }), flush=True)

    t2 = time.perf_counter()
    cst = compact(lake)
    compact_s = time.perf_counter() - t2
    stats = lake_stats(lake)
    val = validate_lake(lake) if args.smoke else {"ok": "skipped (full scan)"}

    if args.smoke:
        from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state
        from etl_geodata_pipeline_ray.cdc.replay import lake_final_table

        ok = lake_final_table(lake).equals(oracle_final_state(combined))
        val["oracle_equal"] = bool(ok)

    print(json.dumps({
        "summary": True, "waves": args.waves, "total_events": total_events,
        "gen_s": round(total_gen, 1), "replay_s": round(total_replay, 1),
        "replay_events_per_s": int(total_events / total_replay),
        "wall_s": round(time.perf_counter() - t_start, 1),
        "compact_s": round(compact_s, 1), "compact": cst,
        "lake_rows": stats.get("rows"), "commits": stats.get("commits"),
        "lake_gb": round(_dir_bytes(lake) / 1e9, 2),
        "spilled_mb": _spill_mb(), "validate": val,
    }), flush=True)

    if not args.keep and args.smoke:
        shutil.rmtree(Path(args.wal).parent, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
