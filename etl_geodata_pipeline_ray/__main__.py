"""CLI entry points — the reference's pipelines are CLI-driven
(``process_layers.py --city X``, ``make_maps.py``); this is the
equivalent surface for the Ray engine:

    python -m etl_geodata_pipeline_ray replay   <wal> <lake> [opts]
    python -m etl_geodata_pipeline_ray compact  <lake>
    python -m etl_geodata_pipeline_ray validate <lake>
    python -m etl_geodata_pipeline_ray tail     <wal> <lake> [opts]
    python -m etl_geodata_pipeline_ray run-spec <spec.yaml> [-p k=v ...]
    python -m etl_geodata_pipeline_ray query    <name> <sf_dir>
    python -m etl_geodata_pipeline_ray stats    <lake>
    python -m etl_geodata_pipeline_ray quarantine <lake>
    python -m etl_geodata_pipeline_ray log      <lake>
    python -m etl_geodata_pipeline_ray expire   <lake> [--keep N]
    python -m etl_geodata_pipeline_ray reshard  <lake> <num_shards>
    python -m etl_geodata_pipeline_ray vacuum   <lake>

The CLI owns its Ray session (init guarded, shutdown on exit); library
code never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            logging_level=logging.ERROR,
            ignore_reinit_error=True,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_geodata_pipeline_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("replay", help="replay WAL segments into a lake")
    pr.add_argument("wal"), pr.add_argument("lake")
    pr.add_argument("--num-shards", type=int, default=32)
    pr.add_argument("--mode", choices=["rewrite", "append"], default="rewrite")
    pr.add_argument("--salt-threshold", type=int, default=512 << 20)
    pr.add_argument("--max-bytes-per-commit", type=int, default=6 << 30)
    pr.add_argument("--retain-versions", type=int, default=2)

    pc_ = sub.add_parser("compact", help="force full compaction of a lake")
    pc_.add_argument("lake")

    pv = sub.add_parser("validate", help="check lake invariants (I1-I6)")
    pv.add_argument("lake")

    pdl = sub.add_parser("quarantine", help="show committed dead-letter rows")
    pdl.add_argument("lake")
    pdl.add_argument("--limit", type=int, default=20)

    pl = sub.add_parser("log", help="show the lake's ordered commit log")
    pl.add_argument("lake")

    pst = sub.add_parser("stats", help="manifest-level lake summary (metadata only)")
    pst.add_argument("lake")

    pe = sub.add_parser("expire", help="trim snapshot history, GC old versions")
    pe.add_argument("lake")
    pe.add_argument("--keep", type=int, default=1)

    pdf = sub.add_parser("diff", help="changelog between two retained commits")
    pdf.add_argument("lake"), pdf.add_argument("from_commit"), pdf.add_argument("to_commit")
    pdf.add_argument("--limit", type=int, default=20)

    pt = sub.add_parser("tail", help="continuously ingest a growing WAL")
    pt.add_argument("wal"), pt.add_argument("lake")
    pt.add_argument("--num-shards", type=int, default=32)
    pt.add_argument("--poll-interval-s", type=float, default=1.0)
    pt.add_argument("--idle-polls", type=int, default=3)
    pt.add_argument("--mode", choices=["rewrite", "append"], default="append")

    ps = sub.add_parser("run-spec", help="run a YAML pipeline spec")
    ps.add_argument("spec")
    ps.add_argument("-p", "--param", action="append", default=[], metavar="K=V")
    ps.add_argument("--output", help="write result parquet here instead of printing")
    ps.add_argument("--limit", type=int, default=20)

    pu = sub.add_parser("upsert", help="commit parquet rows into a lake via upsert_dataset")
    pu.add_argument("parquet"), pu.add_argument("lake")
    pu.add_argument("--num-shards", type=int, default=32)
    pu.add_argument("--mode", default="append", choices=["append", "rewrite"])
    pu.add_argument("--op", default="U", help="default op for rows without an op column")
    pu.add_argument("--gc", action="store_true", help="GC committed stream segments after")

    pq_ = sub.add_parser("query", help="run a catalog query from __ray_entry__")
    pq_.add_argument("name"), pq_.add_argument("sf_dir")
    pq_.add_argument("--limit", type=int, default=20)

    prs = sub.add_parser("reshard", help="rewrite a lake to a new shard count")
    prs.add_argument("lake")
    prs.add_argument("num_shards", type=int)
    prs.add_argument("--salt-threshold", type=int, default=512 << 20)

    pvc = sub.add_parser("vacuum", help="reclaim crashed-writer debris")
    pvc.add_argument("lake")

    a = p.parse_args(argv)
    ray = _ray_session()
    try:
        if a.cmd == "replay":
            from .cdc.replay import replay

            print(json.dumps(replay(
                a.wal, a.lake, num_shards=a.num_shards, mode=a.mode,
                salt_threshold=a.salt_threshold,
                max_bytes_per_commit=a.max_bytes_per_commit,
                retain_versions=a.retain_versions,
            )))
        elif a.cmd == "compact":
            from .cdc.replay import compact

            print(json.dumps(compact(a.lake)))
        elif a.cmd == "validate":
            from .cdc.validate import validate_lake

            res = validate_lake(a.lake)
            print(json.dumps(res, indent=1))
            return 0 if res["ok"] else 1
        elif a.cmd == "quarantine":
            from .cdc.replay import read_quarantine

            df = read_quarantine(a.lake).to_pandas()
            print(df.head(a.limit).to_string())
            print(f"[{len(df)} rows]")
        elif a.cmd == "log":
            from .cdc.replay import commit_log

            print(json.dumps(commit_log(a.lake), indent=1))
        elif a.cmd == "stats":
            from .cdc.replay import lake_stats

            print(json.dumps(lake_stats(a.lake), indent=1))
        elif a.cmd == "expire":
            from .cdc.replay import expire_snapshots

            print(json.dumps(expire_snapshots(a.lake, keep=a.keep)))
        elif a.cmd == "diff":
            from .cdc.replay import lake_diff

            df = lake_diff(a.lake, a.from_commit, a.to_commit).to_pandas()
            print(df.head(a.limit).to_string())
            print(f"[{len(df)} rows]")
        elif a.cmd == "tail":
            from .cdc.tail import tail

            commits = tail(
                a.wal, a.lake, poll_interval_s=a.poll_interval_s,
                idle_polls=a.idle_polls, num_shards=a.num_shards, mode=a.mode,
            )
            print(json.dumps({"commits": len(commits)}))
        elif a.cmd == "upsert":
            import ray.data as rd

            from .cdc.ingest import gc_ingested, upsert_dataset

            st = upsert_dataset(
                rd.read_parquet(a.parquet), a.lake,
                num_shards=a.num_shards, mode=a.mode, op=a.op,
            )
            if a.gc:
                st["stream_gc"] = gc_ingested(a.lake)
            print(json.dumps(st))
        elif a.cmd == "run-spec":
            from .pipelines.spec import run_file

            params = dict(kv.split("=", 1) for kv in a.param)
            ds = run_file(a.spec, **params)
            if a.output:
                ds.write_parquet(a.output)
                print(json.dumps({"written": a.output}))
            else:
                df = ds.to_pandas()
                print(df.head(a.limit).to_string())
                print(f"[{len(df)} rows]")
        elif a.cmd == "reshard":
            from .cdc.replay import reshard

            print(json.dumps(reshard(
                a.lake, a.num_shards, salt_threshold=a.salt_threshold,
            )))
        elif a.cmd == "vacuum":
            from .cdc.replay import vacuum

            print(json.dumps(vacuum(a.lake)))
        elif a.cmd == "query":
            from pathlib import Path as _P

            sys.path.insert(0, str(_P(__file__).resolve().parents[1]))
            import __ray_entry__ as e

            res = e.queries()[a.name](a.sf_dir)
            import pandas as pd

            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            print(df.head(a.limit).to_string())
            print(f"[{len(df)} rows]")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
