"""Operator-conformance query catalog over the driver's testdata tables.

Every entry proves one or more operators from SURVEY §2 on the
TPC-H-ish tables (region nation customer supplier part orders lineitem
events documents embeddings). Each ``q*`` function takes ``sf_dir`` and
returns a small result (pandas DataFrame / pyarrow Table); ``ORACLE``
holds the equivalent DuckDB SQL with IDENTICAL column names and
rounding, so the driver's row-count + schema + value-hash comparison
passes on exact values.

Float discipline: every derived double is ``round(x, n)`` with the
same ``n`` on both sides, so parallel-summation ulp noise cannot flip
the hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages.aggregates import distinct_count, shannon_entropy, weighted_mean
from ..stages.categorize import cascade_categorize, regex_extract, rule_categorize
from ..stages.relational import (
    broadcast_join,
    hash_join,
    smart_join,
    latest_per_key,
    minmax_normalize,
    topk,
)
from ..stages.windows import tumbling_window


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    from ..io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _small(sf_dir: str, table: str, columns: list[str] | None = None) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def _round(df: pd.DataFrame, spec: dict[str, int]) -> pd.DataFrame:
    for col, n in spec.items():
        df[col] = (df[col] + 0.0).round(n)
    return df


# ---------------------------------------------------------------- q01
def q01_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """A1/A2/M12: filtered grouped aggregate (TPC-H Q1 shape).
    Reference analog: per-district KPI counts ``make_maps.py:106-217``."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-01"))))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", rev)

    out = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    # sum_disc_price has 4 intrinsic decimals (2-dec price x 2-dec discount):
    # round AT that precision — coarser rounding sits on .005 half-way
    # boundaries where parallel-sum ulp noise flips the digit.
    return _round(out, {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 4, "avg_qty": 4})


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------- q02
_PTYPE_RULES = {
    "budget": ["ECONOMY", "SMALL"],
    "premium": ["PROMO", "LARGE"],
    "standard": ["STANDARD"],
}


def q02_rule_categorize(sf_dir: str) -> pd.DataFrame:
    """M1: YAML-style value-set rule categorizer
    (reference ``process_layers.py:302-321``)."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_type"])
    ds = rule_categorize(ds, "p_type", _PTYPE_RULES, default="other")
    return ds.groupby("category").aggregate(Count(alias_name="n")).to_pandas()


Q02_SQL = """
SELECT CASE WHEN p_type IN ('ECONOMY','SMALL') THEN 'budget'
            WHEN p_type IN ('PROMO','LARGE') THEN 'premium'
            WHEN p_type IN ('STANDARD') THEN 'standard'
            ELSE 'other' END AS category,
       count(*) AS n
FROM part GROUP BY 1
"""

# ---------------------------------------------------------------- q03
_NAME_CASCADE = [
    ("tool", "p_name", ["bolt", "gear"]),
    ("shiny", "p_name", ["red", "blue"]),
    ("small_item", "p_name", ["small", "mini"]),
]


def q03_cascade_categorize(sf_dir: str) -> pd.DataFrame:
    """M2: priority substring cascade, first match wins
    (reference ``intelligent_pt_categorize`` ``process_layers.py:130-204``)."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])
    ds = cascade_categorize(ds, _NAME_CASCADE, default="other")
    return ds.groupby("category").aggregate(Count(alias_name="n")).to_pandas()


Q03_SQL = """
SELECT CASE WHEN p_name LIKE '%bolt%' OR p_name LIKE '%gear%' THEN 'tool'
            WHEN p_name LIKE '%red%' OR p_name LIKE '%blue%' THEN 'shiny'
            WHEN p_name LIKE '%small%' OR p_name LIKE '%mini%' THEN 'small_item'
            ELSE 'other' END AS category,
       count(*) AS n
FROM part GROUP BY 1
"""

# ---------------------------------------------------------------- q04
def q04_filter_project(sf_dir: str) -> pd.DataFrame:
    """M4/M13 + pushdown: predicate filter with column pruning at the
    read (reference bbox/tag pushdown ``data_loader.py:97-108``)."""
    ds = _read(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def flt(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1997-01-01"))),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.02)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.06)),
                ),
                pc.less(t["l_quantity"], pa.scalar(25.0)),
            ),
        )
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        return pa.table({"rev": rev})

    agg = ds.map_batches(flt, batch_format="pyarrow").aggregate(
        Sum("rev", alias_name="revenue"), Count(alias_name="n_rows")
    )
    return pd.DataFrame({"revenue": [round(agg["revenue"] + 0.0, 4)], "n_rows": [agg["n_rows"]]})


Q04_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue, count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 25
"""

# ---------------------------------------------------------------- q05
def q05_regex_extract(sf_dir: str) -> pd.DataFrame:
    """M8: regex field extraction (reference year-from-string
    ``population_pipeline_stuttgart.py:47-49``)."""
    ds = _read(sf_dir, "customer", ["c_name", "c_mktsegment"])
    ds = regex_extract(ds, "c_name", r"(?P<num>\d+)", "cust_num_s")

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "cust_num": pc.cast(t["cust_num_s"], pa.int64()),
            }
        )

    out = (
        ds.map_batches(cast, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Max("cust_num", alias_name="max_cust_num"), Count(alias_name="n"))
        .to_pandas()
    )
    return out


Q05_SQL = """
SELECT c_mktsegment,
       max(CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT)) AS max_cust_num,
       count(*) AS n
FROM customer GROUP BY 1
"""

# ---------------------------------------------------------------- q06
def q06_region_revenue(sf_dir: str) -> pd.DataFrame:
    """J3 broadcast join chain + A2: orders ⋈ customer (hash join)
    ⋈ nation ⋈ region (broadcast) → revenue per region
    (reference district ⋈ KPI merges ``population_pipeline_stuttgart.py:141``)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = smart_join(
        orders, customer, on=["o_custkey"], right_on=["c_custkey"]
    )
    nation = _small(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _small(sf_dir, "region", ["r_regionkey", "r_name"])
    dim = nation.join(region, keys=["n_regionkey"], right_keys=["r_regionkey"])
    joined = broadcast_join(joined, dim, keys=["c_nationkey"], right_keys=["n_nationkey"])
    out = (
        joined.groupby("r_name")
        .aggregate(Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders"))
        .to_pandas()
    )
    return _round(out, {"revenue": 2})


Q06_SQL = """
SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

# ---------------------------------------------------------------- q07
def q07_join_priority(sf_dir: str) -> pd.DataFrame:
    """J1: large-large hash-partitioned equi-join
    (reference point-in-polygon joins re-keyed to cells, ``make_maps.py:116-118``)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = smart_join(li, orders, on=["l_orderkey"], right_on=["o_orderkey"])
    out = (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_lines"), Sum("l_extendedprice", alias_name="total_price"))
        .to_pandas()
    )
    return _round(out, {"total_price": 2})


Q07_SQL = """
SELECT o_orderpriority, count(*) AS n_lines,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

# ---------------------------------------------------------------- q08
def q08_customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """J7 anti-join, size-gated (reference residual mask
    ``stuttgart_comprehensive_script.py:258``): the planner broadcasts
    the distinct key set only when the filtered orders side has a KNOWN
    small size; the lazy filter here makes size unknowable, so it takes
    the distributed ``shuffle_join(join_type='anti')`` path — no driver
    ``unique()`` of an unbounded key set."""
    from ..stages.relational import planned_semi_anti_join

    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(490000.0))).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    ds = planned_semi_anti_join(
        customer,
        big,
        "c_custkey",
        "o_custkey",
        anti=True,
        left_schema=pa.schema(
            [("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]
        ),
        right_schema=pa.schema([("o_custkey", pa.int64())]),
    )
    return ds.groupby("c_mktsegment").aggregate(Count(alias_name="n_inactive")).to_pandas()


Q08_SQL = """
SELECT c_mktsegment, count(*) AS n_inactive
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 490000.0)
GROUP BY 1
"""

# ---------------------------------------------------------------- q09
def q09_latest_event_per_user(sf_dir: str) -> pd.DataFrame:
    """O3 latest-selection / LWW shape (reference latest-year filter
    ``population_pipeline_stuttgart.py:52-53``; our CDC merge rule)."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type", "value"])
    out = latest_per_key(ds, ["user_id"], ["ts", "event_id"]).to_pandas()
    out = out.rename(columns={"event_type": "last_event_type", "value": "last_value"})
    out = out[["user_id", "last_event_type", "last_value"]]
    return _round(out, {"last_value": 4})


Q09_SQL = """
SELECT user_id, event_type AS last_event_type, round(value, 4) AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
"""

# ---------------------------------------------------------------- q10
def q10_user_entropy(sf_dir: str) -> pd.DataFrame:
    """A5 Shannon entropy per group (reference land-use mix entropy
    ``stuttgart_maps_all.py:618-625``)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return shannon_entropy(ds, "user_id", "event_type", output="entropy").to_pandas()


Q10_SQL = """
WITH c AS (SELECT user_id, event_type, count(*)::DOUBLE AS cnt FROM events GROUP BY 1, 2),
     t AS (SELECT user_id, sum(cnt) AS tot FROM c GROUP BY 1)
SELECT c.user_id, round(0.0 - sum((cnt / tot) * ln(cnt / tot)), 4) AS entropy
FROM c JOIN t USING (user_id) GROUP BY c.user_id
"""

# ---------------------------------------------------------------- q11
def q11_distinct_users(sf_dir: str) -> pd.DataFrame:
    """A3 exact distinct-count per group (reference ``nunique`` diversity
    ``comprehensive_maps_stuttgart.py:357-360``)."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return distinct_count(ds, "event_type", "user_id", output="n_users").to_pandas()


Q11_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1
"""

# ---------------------------------------------------------------- q12
def q12_weighted_discount(sf_dir: str) -> pd.DataFrame:
    """A6 weighted mean per group (reference pop-weighted green share
    ``make_maps.py:192-201``)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_discount", "l_quantity"])
    return weighted_mean(
        ds, "l_returnflag", "l_discount", "l_quantity", output="wavg_discount", ndigits=6
    ).to_pandas()


Q12_SQL = """
SELECT l_returnflag, round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS wavg_discount
FROM lineitem GROUP BY 1
"""

# ---------------------------------------------------------------- q13
def q13_top_orders(sf_dir: str) -> pd.DataFrame:
    """O2 top-k via per-block prune + tiny global sort (reference
    ``nlargest`` ``visualization_helpers.py:593``). Deterministic
    tiebreak on the key column."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows <= 10:
            return t
        order = pc.sort_indices(
            t, sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        )
        return t.take(order[:10])

    out = (
        ds.map_batches(prune, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    return _round(out, {"o_totalprice": 2})


Q13_SQL = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""

# ---------------------------------------------------------------- q14
def q14_normalized_prices(sf_dir: str) -> pd.DataFrame:
    """A10 two-phase global min-max normalization (reference
    ``scale01`` ``make_maps.py:208-215``): stats aggregate →
    broadcast scalars → vectorized map. Returns the 100 highest."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    ds = minmax_normalize(ds, "o_totalprice", "price_norm", ndigits=6)
    out = (
        ds.select_columns(["o_orderkey", "price_norm"])
        .sort(["price_norm", "o_orderkey"], descending=[True, False])
        .limit(100)
        .to_pandas()
    )
    return out


Q14_SQL = """
SELECT o_orderkey,
       round((o_totalprice - min(o_totalprice) OVER ()) /
             (max(o_totalprice) OVER () - min(o_totalprice) OVER ()), 6) AS price_norm
FROM orders ORDER BY price_norm DESC, o_orderkey ASC LIMIT 100
"""

# ---------------------------------------------------------------- q15
def q15_daily_event_stats(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate (SURVEY §2.9 — added capability; the
    reference has no windowing)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    ds = tumbling_window(ds, "ts", "day")
    out = (
        ds.groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"))
        .to_pandas()
    )
    # us resolution matches DuckDB's timestamp unit exactly (values are
    # identical either way; this removes a dtype-level hash hazard)
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return _round(out, {"total_value": 4})


Q15_SQL = """
SELECT event_type, date_trunc('day', ts) AS window_start,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
"""

# ---------------------------------------------------------------- q16
def q16_event_histogram(sf_dir: str) -> pd.DataFrame:
    """A4 frequency histogram (reference QA ``value_counts``
    ``process_layers.py:207``)."""
    ds = _read(sf_dir, "events", ["event_type"])
    return ds.groupby("event_type").aggregate(Count(alias_name="n")).to_pandas()


Q16_SQL = "SELECT event_type, count(*) AS n FROM events GROUP BY 1"

# ---------------------------------------------------------------- q17
def q17_cdc_latest_state(sf_dir: str) -> pd.DataFrame:
    """CDC materialized-state shape on the driver's events table:
    upsert stream keyed (user_id, event_type), LWW by (ts, event_id) —
    the engine's merge semantics, SQL-checkable (SURVEY §2.7)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "event_id", "ts", "value"])
    latest = latest_per_key(ds, ["user_id", "event_type"], ["ts", "event_id"])
    out = (
        latest.groupby("event_type")
        .aggregate(Count(alias_name="n_keys"), Sum("value", alias_name="sum_latest_value"))
        .to_pandas()
    )
    return _round(out, {"sum_latest_value": 4})


Q17_SQL = """
WITH latest AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT event_type, count(*) AS n_keys, round(sum(value), 4) AS sum_latest_value
FROM latest WHERE rn = 1 GROUP BY 1
"""

# ---------------------------------------------------------------- q18
def q18_user_sessions(sf_dir: str) -> pd.DataFrame:
    """Session windows per user (gap > 1h starts a new session) —
    streaming-shaped added capability; per-key ordered map_groups."""
    from ..stages.windows import session_windows

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    sess = session_windows(ds, "user_id", "ts", gap_seconds=3600.0)
    return sess.groupby("user_id").aggregate(Count(alias_name="n_sessions")).to_pandas()


Q18_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN prev IS NULL OR epoch(ts - prev) > 3600.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events)
GROUP BY 1
"""

# ---------------------------------------------------------------- q19
def q19_table_stats(sf_dir: str) -> pd.DataFrame:
    """A13 basic stats summary (reference ``data_loader.py:331-357``),
    in ONE scan: each block emits a partial row (count/min/max/sum +
    its deduped supplier-key set as bytes) and the driver folds ~blocks
    tiny rows — the distinct count rides the same pass instead of a
    second lineitem scan. Blocks whose distinct-key set exceeds
    ``supp_cap`` ship a marker instead of bytes, and the distinct
    count falls back to one distributed dedup-shuffle (exact; the
    driver fold stays provably bounded at blocks × supp_cap × 8
    bytes). HLL (q37) remains the sketch path when exactness isn't
    required."""
    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice"])
    return _table_stats(ds)


def _table_stats(
    ds, supp_cap: int = 65536, plan_info: dict | None = None
) -> pd.DataFrame:

    # ONE explicit Arrow schema for both branches: a pandas-built empty
    # frame infers different types than the value-built one (us-vs-ns
    # timestamps, null-vs-binary supp) and block-schema divergence is
    # exactly what this file's read hygiene exists to avoid
    part_schema = pa.schema(
        [
            pa.field("n_rows", pa.int64()),
            pa.field("first_ship", pa.timestamp("us")),
            pa.field("last_ship", pa.timestamp("us")),
            pa.field("total_price", pa.float64()),
            pa.field("supp", pa.binary()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # an empty block's min/max would be None and poison the fold
            return part_schema.empty_table()
        supp = np.unique(t["l_suppkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "n_rows": [t.num_rows],
                "first_ship": [pc.min(t["l_shipdate"]).as_py()],
                "last_ship": [pc.max(t["l_shipdate"]).as_py()],
                "total_price": [pc.sum(t["l_extendedprice"]).as_py()],
                # above the cap the set is NOT shipped (escape hatch:
                # the driver fold must stay bounded on adversarial
                # cardinalities) — a null marks "go distributed"
                "supp": [
                    supp.astype(np.int64).tobytes()
                    if len(supp) <= supp_cap
                    else None
                ],
            },
            schema=part_schema,
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:  # every block empty: match SQL aggregates over 0 rows
        return pd.DataFrame({
            "n_rows": [0],
            "first_ship": pd.Series([pd.NaT], dtype="datetime64[us]"),
            "last_ship": pd.Series([pd.NaT], dtype="datetime64[us]"),
            "total_price": [None], "n_suppliers": [0],
        })
    if any(r["supp"] is None for r in parts):
        # bounded path: ONE distributed dedup-shuffle of pre-dedupped
        # int64 keys; the groupby's row count IS the exact distinct
        # count and only that scalar reaches the driver
        if plan_info is not None:
            plan_info["distinct_path"] = "distributed"

        def uniq(t: pa.Table) -> pa.Table:
            u = np.unique(t["l_suppkey"].to_numpy(zero_copy_only=False))
            return pa.table({"l_suppkey": pa.array(u, type=pa.int64())})

        n_supp = int(
            ds.map_batches(uniq, batch_format="pyarrow")
            .groupby("l_suppkey")
            .count()
            .count()
        )
    else:
        if plan_info is not None:
            plan_info["distinct_path"] = "driver_fold"
        n_supp = len(
            np.unique(
                np.concatenate(
                    [np.frombuffer(r["supp"], dtype=np.int64) for r in parts]
                )
            )
        )
    out = pd.DataFrame(
        {
            "n_rows": [int(sum(r["n_rows"] for r in parts))],
            "first_ship": [pd.Timestamp(min(r["first_ship"] for r in parts))],
            "last_ship": [pd.Timestamp(max(r["last_ship"] for r in parts))],
            "total_price": [round(sum(r["total_price"] for r in parts), 2)],
            "n_suppliers": [n_supp],
        }
    )
    for c in ("first_ship", "last_ship"):
        out[c] = out[c].astype("datetime64[us]")  # DuckDB timestamp unit
    return out


Q19_SQL = """
SELECT count(*) AS n_rows, min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
       round(sum(l_extendedprice), 2) AS total_price,
       count(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
"""

# ---------------------------------------------------------------- q20
def q20_nation_score(sf_dir: str) -> pd.DataFrame:
    """A12 composite weighted score over normalized KPIs with weights
    from config (reference ``kpi_weights.yaml`` + ``make_maps.py:214-215``).
    The per-nation aggregate is tiny → finished driver-side."""
    customer = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    nation = _small(sf_dir, "nation", ["n_nationkey", "n_name"])
    per = (
        broadcast_join(customer, nation, keys=["c_nationkey"], right_keys=["n_nationkey"])
        .groupby("n_name")
        .aggregate(Count(alias_name="n_cust"), Sum("c_acctbal", alias_name="bal"))
        .to_pandas()
    )
    for col in ["n_cust", "bal"]:
        lo, hi = per[col].min(), per[col].max()
        per[f"_{col}"] = (per[col] - lo) / ((hi - lo) or 1.0)
    per["score"] = (0.6 * per["_n_cust"] + 0.4 * per["_bal"] + 0.0).round(6)
    return per[["n_name", "score"]]


Q20_SQL = """
WITH per AS (
  SELECT n_name, count(*)::DOUBLE AS n_cust, sum(c_acctbal) AS bal
  FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name)
SELECT n_name,
       round(0.6 * (n_cust - min(n_cust) OVER ()) / (max(n_cust) OVER () - min(n_cust) OVER ())
           + 0.4 * (bal - min(bal) OVER ()) / (max(bal) OVER () - min(bal) OVER ()), 6) AS score
FROM per
"""


RELATIONAL_QUERIES = {
    "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
    "q02_rule_categorize": (q02_rule_categorize, Q02_SQL),
    "q03_cascade_categorize": (q03_cascade_categorize, Q03_SQL),
    "q04_filter_project": (q04_filter_project, Q04_SQL),
    "q05_regex_extract": (q05_regex_extract, Q05_SQL),
    "q06_region_revenue": (q06_region_revenue, Q06_SQL),
    "q07_join_priority": (q07_join_priority, Q07_SQL),
    "q08_customers_without_orders": (q08_customers_without_orders, Q08_SQL),
    "q09_latest_event_per_user": (q09_latest_event_per_user, Q09_SQL),
    "q10_user_entropy": (q10_user_entropy, Q10_SQL),
    "q11_distinct_users": (q11_distinct_users, Q11_SQL),
    "q12_weighted_discount": (q12_weighted_discount, Q12_SQL),
    "q13_top_orders": (q13_top_orders, Q13_SQL),
    "q14_normalized_prices": (q14_normalized_prices, Q14_SQL),
    "q15_daily_event_stats": (q15_daily_event_stats, Q15_SQL),
    "q16_event_histogram": (q16_event_histogram, Q16_SQL),
    "q17_cdc_latest_state": (q17_cdc_latest_state, Q17_SQL),
    "q18_user_sessions": (q18_user_sessions, Q18_SQL),
    "q19_table_stats": (q19_table_stats, Q19_SQL),
    "q20_nation_score": (q20_nation_score, Q20_SQL),
}
