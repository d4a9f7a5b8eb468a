"""Second-wave catalog entries: JSON extraction, window ranks, as-of
join, string normalization, sketch aggregation, paged source, CSV
round-trip (SURVEY §2 rows M7/M8/A11/J6/S5/S6/K3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from ..stages.bucketed import bucketed_apply


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from ..io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------- q33
def q33_json_extract(sf_dir: str) -> pd.DataFrame:
    """JSON field extraction from the events ``props`` column (M8/scalar
    JSON functions, SURVEY §2.8) — vectorized regex kernel (the JSON
    here is one flat int field; a nested payload would use a JSON
    parser inside the same map_batches slot)."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(pc.fill_null(t["props"], ""), r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(st, [0]), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    out = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
        .to_pandas()
    )
    return out


Q33_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events GROUP BY 1
"""

# ---------------------------------------------------------------- q34
def q34_percentile_rank(sf_dir: str) -> pd.DataFrame:
    """A11/O1: percent_rank of customers by balance within segment —
    bucketed by the partition key, one vectorized rank kernel per
    bucket (ties → min rank, SQL percent_rank semantics)."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby("c_mktsegment")["c_acctbal"].transform("count")
        r = g.groupby("c_mktsegment")["c_acctbal"].rank(method="min")
        g = g.assign(pr=((r - 1) / (n - 1).clip(lower=1) + 0.0).round(6))
        return g[["c_custkey", "c_mktsegment", "pr"]]

    return (
        bucketed_apply(ds, ["c_mktsegment"], ranks, n_buckets=8)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )


Q34_SQL = """
SELECT c_custkey, c_mktsegment,
       round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS pr
FROM customer
"""

# ---------------------------------------------------------------- q35
def q35_asof_join(sf_dir: str) -> pd.DataFrame:
    """J6 as-of/nearest join: for every purchase event, the most recent
    prior view by the same user. Bucketed on user, ``pd.merge_asof``
    per bucket (the guide's as-of pattern; sorted within bucket)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g.event_type == "purchase"].sort_values("ts", kind="stable")
        v = g[g.event_type == "view"].sort_values("ts", kind="stable")
        if not len(p) or not len(v):
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "avg_gap_s": pd.Series([], dtype="float64")}
            )
        m = pd.merge_asof(
            p[["user_id", "ts"]],
            v[["user_id", "ts"]].rename(columns={"ts": "view_ts"}),
            left_on="ts",
            right_on="view_ts",
            by="user_id",
            direction="backward",
        ).dropna(subset=["view_ts"])
        if not len(m):
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "avg_gap_s": pd.Series([], dtype="float64")}
            )
        m["gap"] = (m["ts"] - m["view_ts"]).dt.total_seconds()
        out = m.groupby("user_id", as_index=False).agg(n=("gap", "size"), avg_gap_s=("gap", "mean"))
        out["avg_gap_s"] = (out["avg_gap_s"] + 0.0).round(4)
        return out

    return (
        bucketed_apply(ds, ["user_id"], asof, n_buckets=32)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


Q35_SQL = """
SELECT p.user_id, count(*) AS n, round(avg(epoch(p.ts - v.ts)), 4) AS avg_gap_s
FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
GROUP BY p.user_id
"""

# ---------------------------------------------------------------- q36
def q36_normalized_contains(sf_dir: str) -> pd.DataFrame:
    """M7 string normalizers: lowercase + trim, then substring test —
    per lang, how many documents mention 'merge' case-insensitively."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def norm(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.utf8_trim_whitespace(pc.fill_null(t["text"], "")))
        hit = pc.cast(pc.match_substring(low, "merge"), pa.int64())
        return pa.table({"lang": t["lang"], "hit": hit})

    return (
        ds.map_batches(norm, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("hit", alias_name="n_mentioning"), Count(alias_name="n_docs"))
        .to_pandas()
    )


Q36_SQL = """
SELECT lang,
       CAST(sum(CASE WHEN contains(lower(trim(text)), 'merge') THEN 1 ELSE 0 END) AS BIGINT) AS n_mentioning,
       count(*) AS n_docs
FROM documents GROUP BY 1
"""

def q37_hll_distinct(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct users per event_type as a composable
    ``AggregateFn`` (mergeable-sketch scale path for A3; exact variant
    q11). Tolerance-style oracle: emits the engine's exact distinct
    count plus a bool asserting the HLL estimate lands within 5%; the
    oracle recomputes the exact count and expects within_tol = TRUE."""
    from ..stages.aggregates import distinct_count
    from ..stages.sketches import hll_aggregate

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    est = (
        ds.groupby("event_type")
        .aggregate(hll_aggregate("user_id", p=12, alias_name="hll_est"))
        .to_pandas()
    )
    exact = distinct_count(ds, "event_type", "user_id", output="n_exact").to_pandas()
    out = exact.merge(est, on="event_type").sort_values("event_type")
    out["within_tol"] = (
        (out["hll_est"] - out["n_exact"]).abs() / out["n_exact"] <= 0.05
    ).astype(bool)
    out["n_exact"] = out["n_exact"].astype("int64")
    return out[["event_type", "n_exact", "within_tol"]].reset_index(drop=True)


Q37_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS within_tol
FROM events GROUP BY 1
"""


def q38_paged_source(sf_dir: str) -> pd.DataFrame:
    """S6 paged REST-style custom Datasource: one read task per page
    (synthetic pager standing in for the HTTP fetch)."""
    import pyarrow.parquet as pq

    from ..sources.paged import read_paged

    # drop the parquet pandas-metadata blob: metadata-bearing schemas
    # are unhashable and defeat Ray's reduce-side schema dedup
    events = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    ).replace_schema_metadata(None)
    page_size = 500
    n_pages = (events.num_rows + page_size - 1) // page_size

    def fetch_page(i: int) -> pa.Table:
        return events.slice(i * page_size, page_size)

    ds = read_paged(fetch_page, n_pages, schema=events.schema)
    return ds.groupby("event_type").aggregate(Count(alias_name="n")).to_pandas()


Q38_SQL = """
SELECT event_type, count(*) AS n FROM events GROUP BY 1
"""


def q39_csv_roundtrip(sf_dir: str) -> pd.DataFrame:
    """S5/K3: CSV writer + reader round-trip (nation table), then a
    grouped count on the re-read data."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="graft_csv_")
    try:
        _read(sf_dir, "nation").write_csv(out)
        back = ray.data.read_csv(out)
        return back.groupby("n_regionkey").aggregate(Count(alias_name="n_nations")).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


Q39_SQL = """
SELECT n_regionkey, count(*) AS n_nations FROM nation GROUP BY 1
"""


EXTRA_QUERIES = {
    "q33_json_extract": (q33_json_extract, Q33_SQL),
    "q34_percentile_rank": (q34_percentile_rank, Q34_SQL),
    "q35_asof_join": (q35_asof_join, Q35_SQL),
    "q36_normalized_contains": (q36_normalized_contains, Q36_SQL),
    "q37_hll_distinct": (q37_hll_distinct, Q37_SQL),
    "q38_paged_source": (q38_paged_source, Q38_SQL),
    "q39_csv_roundtrip": (q39_csv_roundtrip, Q39_SQL),
}
