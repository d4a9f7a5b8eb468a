"""Lake invariant checks — the reference's QA-threshold / preflight
idea (``docs/data_layers.md:259-264`` acceptance thresholds,
``stuttgart_comprehensive_script.py:806-845`` input preflight) turned
into machine-checkable invariants over a committed lake.

``validate_lake`` streams every committed file once (one Ray task per
file via ``map_batches``; nothing driver-side except the per-file
verdict rows) and checks:

  I1  every row's op is a valid op code (unknown-op rows = 0 — the
      analog of "category 'other' < 1%", tightened to zero)
  I2  rows are sorted by (conv_id, turn_idx) within each file
      (stable turn ordering, BASELINE correctness gate)
  I3  no duplicate (conv_id, turn_idx) within a fully-compacted
      shard file (LWW collapsed)
  I4  every row hash-routes to the shard directory that holds it
      (misplaced rows = 0)
  I5  manifest row/byte counts match the files on disk
  I6  every quarantine manifest's files exist with the recorded
      row/byte counts, only known reasons appear, and no quarantined
      row carries a valid (op, merge-key) combination — i.e. nothing
      was dead-lettered that should have merged
  I7  manifest zone maps are SOUND: a file's recorded distinct-value
      set covers every value actually stored in it (an under-covering
      zone would let read_lake's pruning skip matching shards)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from . import manifest as mf
from .replay import _VALID_OPS, hash_u64, shard_of


def validate_lake(lake_dir: str | Path) -> dict:
    """Returns {ok, files_checked, violations: [str]}; raises nothing.
    Distributed: one task per committed file; only verdicts return."""
    import json

    lake_dir = Path(lake_dir)
    manifests = mf.read_all_manifests(lake_dir)

    items = []
    for sh, m in manifests.items():
        fully_compacted = len(m["files"]) <= m.get("salt_k", 1)
        for frec in m["files"]:
            items.append(
                {
                    "path": str(lake_dir / frec["path"]),
                    "shard": sh,
                    "expect_rows": frec["rows"],
                    "expect_bytes": frec["bytes"],
                    "check_dups": fully_compacted,
                    "zones_json": json.dumps(frec.get("zones") or {}),
                }
            )
    if not items:
        return {"ok": True, "files_checked": 0, "violations": []}
    num_shards = mf.lake_meta(lake_dir)["num_shards"]

    def check(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        # iteration is per FILE (each row = one parquet file to audit),
        # not per data row; the per-file checks inside are vectorized
        for _, it in batch.iterrows():
            v = []
            zones = json.loads(it["zones_json"])
            try:
                # prune to the audited columns: the wide text payload
                # (the dominant share of lake bytes) is never inspected
                # and must not ride through every validation task
                schema_names = pq.read_schema(it["path"]).names
                need = ({"op", "conv_id", "turn_idx"} | set(zones)) & set(
                    schema_names
                )
                t = pq.read_table(it["path"], columns=sorted(need))
                fsize = Path(it["path"]).stat().st_size
            except FileNotFoundError:
                # the corruption the validator exists to detect must be
                # REPORTED, not crash the audit ("raises nothing")
                out.append({"path": it["path"],
                            "violations": "I5 committed file missing"})
                continue
            if t.num_rows != it["expect_rows"]:
                v.append(f"I5 rows {t.num_rows} != manifest {it['expect_rows']}")
            if fsize != it["expect_bytes"]:
                v.append("I5 bytes != manifest")
            ops = set(pc.unique(t["op"]).to_pylist())
            if not ops <= set(_VALID_OPS):
                # key=repr: a corrupt file can hold null AND a bad
                # string; None < str comparison would crash the report
                bad_ops = sorted(ops - set(_VALID_OPS), key=repr)
                v.append(f"I1 unknown ops {bad_ops}")
            df = t.select(["conv_id", "turn_idx"]).to_pandas()
            srt = df.sort_values(["conv_id", "turn_idx"], kind="stable")
            if not (srt.index.to_numpy() == np.arange(len(df))).all():
                v.append("I2 not sorted by (conv_id, turn_idx)")
            # NB: never build a separator-joined string key here —
            # pandas' Series-str concat kernel silently DROPS "\x00",
            # so "conv_1010653"+sep+"10" == "conv_10106531"+sep+"0"
            # and variable-length ids (>10M convs) false-flag; the
            # tuple-wise duplicated() is exact (found at the 10^9 rung)
            if it["check_dups"] and df.duplicated(["conv_id", "turn_idx"]).any():
                v.append("I3 duplicate keys in compacted file")
            sh_all = shard_of(hash_u64(t["conv_id"].combine_chunks()), num_shards)
            if not (sh_all == int(it["shard"])).all():
                v.append("I4 misrouted rows present")
            for col, z in zones.items():
                if col not in t.column_names:
                    continue
                if "values" not in z:
                    # range zone (ts: int µs; conv_id: string) — the
                    # stored [min,max] must lie inside the recorded one
                    mm = pc.min_max(t[col])
                    if isinstance(z["min"], str):
                        lo, hi = mm["min"].as_py(), mm["max"].as_py()
                    else:
                        lo = mm["min"].value
                        hi = mm["max"].value
                        if lo is not None:
                            lo, hi = int(lo), int(hi)
                    if lo is not None and (lo < z["min"] or hi > z["max"]):
                        v.append(f"I7 zone[{col}] range misses stored values")
                    continue
                stored = set(pc.unique(t[col]).to_pylist())
                has_null = None in stored
                stored.discard(None)
                extra = stored - set(z.get("values", []))
                if extra:
                    v.append(f"I7 zone[{col}] misses values {sorted(extra)[:5]}")
                if has_null and not z.get("null"):
                    v.append(f"I7 zone[{col}] misses null")
            out.append({"path": it["path"], "violations": "; ".join(v)})
        return pd.DataFrame(out)

    ds = ray.data.from_pandas(pd.DataFrame(items)).repartition(min(len(items), 64))
    res = ds.map_batches(check, batch_format="pandas", batch_size=4).to_pandas()
    bad = [f"{r['path']}: {r['violations']}" for _, r in res.iterrows() if r["violations"]]
    n_quar, qbad = _check_quarantine(lake_dir)
    bad.extend(qbad)
    return {"ok": not bad, "files_checked": len(res) + n_quar, "violations": bad}


def _check_quarantine(lake_dir: Path) -> tuple[int, list[str]]:
    """I6 — driver-side (quarantine is small by construction; a lake
    where it isn't has a worse problem than validation cost)."""
    from .replay import _DLQ_REASON, _quarantine_manifests, read_quarantine

    recs = _quarantine_manifests(lake_dir)
    if not recs:
        return 0, []
    bad: list[str] = []
    n = 0
    known = set(_DLQ_REASON.values())
    for rec in recs:
        for fr in rec["files"]:
            n += 1
            fp = lake_dir / fr["path"]
            if fr["reason"] not in known:
                bad.append(f"{fr['path']}: I6 unknown reason {fr['reason']!r}")
            if not fp.exists():
                bad.append(f"{fr['path']}: I6 missing quarantine file")
                continue
            meta = pq.ParquetFile(fp).metadata
            if meta.num_rows != fr["rows"]:
                bad.append(f"{fr['path']}: I6 rows {meta.num_rows} != manifest {fr['rows']}")
            if fp.stat().st_size != fr["bytes"]:
                bad.append(f"{fr['path']}: I6 bytes != manifest")
    q = read_quarantine(lake_dir).to_pandas()
    valid_op = q["op"].isin(list(_VALID_OPS))
    keyed = q["conv_id"].notna() & q["turn_idx"].notna() & q["ts"].notna()
    wrongly_quarantined = int((valid_op & keyed).sum())
    if wrongly_quarantined:
        bad.append(f"I6 {wrongly_quarantined} quarantined rows are valid events")
    return n, bad
