"""Relational operators: joins, dedup-by-key, top-k, normalization.

Each operator mirrors a reference capability (SURVEY §2.4-§2.7) but is
expressed Ray-Data-first: broadcast the small side of a join
(reference does driver-side pandas merges of small dims,
``population_pipeline_stuttgart.py:100``), hash-partition the big
joins (reference's spatial point-in-polygon joins,
``make_maps.py:116-118``), and two-phase global statistics
(reference's quantile normalization, ``make_maps.py:208-215``).

All per-batch bodies are vectorized (pyarrow.compute / pyarrow Table
joins / numpy); no Python row loops.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


# per-worker cache of prepared broadcast lookup structures, so the
# build cost is paid once per worker process, not once per batch
# (Acero's table.join rebuilds the hash table on every call).
# LRU-bounded: a long-lived worker serving many distinct broadcast
# joins must not accumulate every dimension table it ever probed.
_BCAST_CACHE_MAX = 8
_BCAST_CACHE: OrderedDict = OrderedDict()


def _bcast_cached(ref, build):
    if ref in _BCAST_CACHE:
        _BCAST_CACHE.move_to_end(ref)
        return _BCAST_CACHE[ref]
    val = build()
    _BCAST_CACHE[ref] = val
    while len(_BCAST_CACHE) > _BCAST_CACHE_MAX:
        _BCAST_CACHE.popitem(last=False)
    return val


def broadcast_join(
    ds: ray.data.Dataset,
    small: pa.Table,
    keys: list[str],
    join_type: str = "inner",
    right_keys: list[str] | None = None,
) -> ray.data.Dataset:
    """Join a Dataset against a SMALL dimension table without a shuffle.

    The dimension table is put in the object store once (``ray.put``);
    each map task probes a per-worker-cached sorted-key index
    (np.searchsorted + Arrow take — built once per worker). Falls back
    to an Acero join per batch for composite keys or duplicate right
    keys. ``join_type`` supports ``inner``/``left`` only (semi/anti go
    through ``planned_semi_anti_join``). Right-side columns colliding
    with left names get the same ``_r`` suffix ``shuffle_join`` uses,
    so ``smart_join``'s output schema does not depend on which side of
    the size threshold the data lands. Reference analog: district
    KPIs ⋈ boundaries (J3, ``visualization_helpers.py:178``)."""
    if join_type not in ("inner", "left"):
        raise ValueError(
            f"broadcast_join supports inner/left, not {join_type!r}; "
            "use planned_semi_anti_join / shuffle_join for semi/anti"
        )
    ref = ray.put(small)
    rkeys = right_keys or keys
    # Acero spells the type 'left outer'
    acero_type = "left outer" if join_type == "left" else join_type

    def _prepare(tbl: pa.Table):
        if len(rkeys) != 1:
            return None
        karr = tbl.column(rkeys[0]).combine_chunks()
        kv = karr.to_numpy(zero_copy_only=False)
        order = np.argsort(kv, kind="stable")
        sk = kv[order]
        if len(sk) and (sk[1:] == sk[:-1]).any():
            return None  # duplicate right keys → fall back
        payload = tbl.drop_columns([rkeys[0]]).take(pa.array(order))
        return sk, payload

    def join_batch(batch: pa.Table) -> pa.Table:
        def build():
            tbl = ray.get(ref)
            # suffix right non-key columns colliding with left names,
            # matching shuffle_join's convention
            clash = [
                c for c in tbl.column_names
                if c in batch.column_names and c not in rkeys
            ]
            if clash:
                tbl = tbl.rename_columns(
                    [c + "_r" if c in clash else c for c in tbl.column_names]
                )
            return tbl, _prepare(tbl)

        tbl, prep = _bcast_cached(ref, build)
        if prep is None:
            return batch.join(
                tbl, keys=keys, right_keys=rkeys, join_type=acero_type
            )
        sk, payload = prep
        bk = batch.column(keys[0]).to_numpy(zero_copy_only=False)
        if len(sk) == 0:  # empty dim table: no key ever matches
            hit = np.zeros(len(bk), dtype=bool)
            idx = idx_c = np.zeros(len(bk), dtype=np.int64)
            if join_type == "inner":
                out = batch.filter(pa.array(hit))
                for name in payload.column_names:
                    out = out.append_column(
                        name, pa.nulls(0, payload.column(name).type)
                    )
                return out
        else:
            idx = np.searchsorted(sk, bk)
            idx_c = np.minimum(idx, len(sk) - 1)
            hit = (sk[idx_c] == bk) & (idx < len(sk))
        if join_type == "inner":
            batch = batch.filter(pa.array(hit))
            picked = payload.take(pa.array(idx_c[hit]))
            for name in picked.column_names:
                batch = batch.append_column(name, picked.column(name))
            return batch
        # left join: null-fill misses (an empty payload cannot be
        # take()n — every row is a miss, so append typed nulls)
        if len(sk) == 0:
            for name in payload.column_names:
                batch = batch.append_column(
                    name, pa.nulls(batch.num_rows, payload.column(name).type)
                )
            return batch
        take_idx = np.where(hit, idx_c, -1)
        picked = payload.take(pa.array(np.where(take_idx >= 0, take_idx, 0)))
        for name in picked.column_names:
            col = picked.column(name)
            col = pc.if_else(pa.array(hit), col.combine_chunks(), pa.scalar(None, type=col.type))
            batch = batch.append_column(name, col)
        return batch

    return ds.map_batches(join_batch, batch_format="pyarrow")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    right_on: list[str] | None = None,
    join_type: str = "inner",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Large-large equi-join via Ray Data's native hash-partitioned
    ``Dataset.join``. NOTE: on Ray 2.49 the join aggregator actors can
    livelock below ~4 CPUs — ``shuffle_join`` below is the robust
    bucketed-shuffle fallback and the default large-large path."""
    # this module's join_type vocabulary ("left") → Ray's ("left_outer")
    native_type = {"left": "left_outer", "right": "right_outer"}.get(
        join_type, join_type
    )
    return left.join(
        right,
        join_type=native_type,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
    )


def shuffle_join_schema(
    lschema: pa.Schema,
    rschema: pa.Schema,
    on: list[str],
    right_on: list[str] | None = None,
    suffix: str = "_r",
    join_type: str = "inner",
) -> pa.Schema:
    """Output schema of ``shuffle_join`` for the given inputs — lets
    callers chain joins without schema probes (a probe on a lazy
    shuffle output executes the whole upstream pipeline)."""
    rkeys = right_on or on
    lnames = list(lschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    if join_type in ("semi", "anti"):
        return pa.schema([pa.field(n, ltypes[n]) for n in lnames])
    rpayload = [n for n in rschema.names if n not in rkeys]
    rename = {n: (n + suffix if n in lnames else n) for n in rpayload}
    rtypes = dict(zip(rschema.names, rschema.types))
    return pa.schema(
        [pa.field(n, ltypes[n]) for n in lnames]
        + [pa.field(rename[n], rtypes[n]) for n in rpayload]
    )


def shuffle_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    right_on: list[str] | None = None,
    join_type: str = "inner",
    n_buckets: int = 32,
    suffix: str = "_r",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Bucketed-shuffle equi-join built from Ray Data primitives only
    (map_batches + one groupby shuffle): both sides are tagged, widened
    to a shared schema, bucketed on ``hash(key) % n_buckets`` and
    merged per bucket with one vectorized pandas merge. The workhorse
    large-large path (reference spatial joins, ``make_maps.py:116-118``)
    — no join aggregator actors, so it cannot livelock at low CPU
    counts, and skew is bounded by the hash. ``join_type``:
    inner|left|semi|anti. semi/anti return LEFT columns only with
    EXISTS / NOT-EXISTS semantics (the scale path for J7 residual
    selection when the key set is too big to broadcast: only the
    right-side KEY columns are shuffled); SQL NULL rules apply — a
    null left key never matches, so it is dropped by semi and kept by
    anti. Right-side non-key columns colliding with left names get
    ``suffix``. Pass ``left_schema``/``right_schema`` (Arrow) whenever
    known — a schema probe on a lazy shuffle output otherwise executes
    the whole upstream pipeline just to peek one block."""
    rkeys = right_on or on
    # canonicalize both sides to Arrow blocks so schemas carry pyarrow
    # types (pandas-block datasets report numpy dtypes), stripping any
    # parquet pandas-metadata dict (it makes schemas unhashable, which
    # disables Ray's block-schema dedup); the map fuses with the
    # neighboring stages.
    left = left.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    right = right.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )

    def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base
        return pa.schema(
            [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
        )

    lschema = left_schema or _arrow_schema(left)
    rschema = right_schema or _arrow_schema(right)
    lnames = list(lschema.names)
    # semi/anti ship only the right KEY columns through the shuffle
    rpayload = (
        [] if join_type in ("semi", "anti")
        else [n for n in rschema.names if n not in rkeys]
    )
    rename = {n: (n + suffix if n in lnames else n) for n in rpayload}
    rtypes = dict(zip(rschema.names, rschema.types))
    ltypes = dict(zip(lschema.names, lschema.types))
    out_fields = (
        [(n, ltypes[n]) for n in lnames]
        + [(rename[n], rtypes[n]) for n in rpayload]
    )

    def _nonnull_keys(t: pa.Table, key_cols: list[str]) -> pa.Table:
        # SQL join semantics: NULL keys never match. pandas merge would
        # happily match NaN==NaN, so null-key rows must be dropped
        # before the bucketed merge (right side always; left side only
        # for inner joins — a left join keeps them, unmatched).
        mask = None
        for k in key_cols:
            v = pc.is_valid(t[k])
            mask = v if mask is None else pc.and_(mask, v)
        return t.filter(mask) if mask is not None else t

    def _bucket_col(t: pa.Table, key_cols: list[str]) -> pa.Array:
        # the shared dtype-stable kernel (see bucketed.key_hash): both
        # sides were cast to the LEFT key types before this, so equal
        # keys hash identically even when one side's null-bearing
        # blocks drifted to float64
        from .bucketed import key_hash

        h = key_hash(t, key_cols, hash_key="graftjoin-hash00")
        return pa.array((h % np.uint64(n_buckets)).astype(np.int64))

    # one shared exchange schema INSTANCE for both widened sides —
    # non-identical schema objects made Ray's streaming executor fall
    # back to per-RefBundle schema comparison and warn "RefBundle with
    # a different schema" on every union block
    exchange_schema = pa.schema(
        [pa.field(n, t) for n, t in out_fields]
        + [pa.field("_side", pa.int8()), pa.field("_bucket", pa.int64())]
    )

    def widen_left(t: pa.Table) -> pa.Table:
        if join_type in ("inner", "semi"):
            t = _nonnull_keys(t, on)  # null keys never match (anti KEEPS them)
        cols = {n: pc.cast(t[n], ltypes[n]) for n in lnames}
        for n in rpayload:
            cols[rename[n]] = pa.nulls(t.num_rows, type=rtypes[n])
        cols["_side"] = pa.nulls(t.num_rows, type=pa.int8()).fill_null(0)
        # hash the CAST columns (exactly like widen_right): a left batch
        # whose physical key dtype drifted from the declared schema
        # (pandas null-upcast int64→float64) must take the same numeric
        # hash path as the right side, or equal keys split buckets
        cols["_bucket"] = _bucket_col(pa.table(cols), on)
        return pa.table(cols, schema=exchange_schema)

    def widen_right(t: pa.Table) -> pa.Table:
        t = _nonnull_keys(t, rkeys)
        cols = {}
        for n in lnames:
            if n in on:
                src = rkeys[on.index(n)]
                cols[n] = pc.cast(t[src], ltypes[n])
            else:
                cols[n] = pa.nulls(t.num_rows, type=ltypes[n])
        for n in rpayload:
            cols[rename[n]] = pc.cast(t[n], rtypes[n])
        cols["_side"] = pa.nulls(t.num_rows, type=pa.int8()).fill_null(1)
        cols["_bucket"] = _bucket_col(pa.table(cols), on)
        return pa.table(cols, schema=exchange_schema)

    # repartition before the groupby sort: the union's block count is
    # the sum of both sides' (often 100+ tiny blocks) and the sort
    # shuffle's cost scales with block count — measured 2x on q47
    both = (
        left.map_batches(widen_left, batch_format="pyarrow")
        .union(right.map_batches(widen_right, batch_format="pyarrow"))
        .repartition(n_buckets)
    )
    out_cols = [n for n, _ in out_fields]
    rpay_cols = [rename[n] for n in rpayload]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0][[c for c in out_cols if c not in rpay_cols]]
        r = g[g["_side"] == 1][on + rpay_cols]
        if join_type in ("semi", "anti"):
            m = l.merge(r.drop_duplicates(on), on=on, how="left", indicator="_m")
            want = "both" if join_type == "semi" else "left_only"
            m = m[m["_m"] == want].drop(columns=["_m"])
        else:
            m = l.merge(r, on=on, how="inner" if join_type == "inner" else "left")
        m = m[out_cols]
        # dtype-stabilize: pandas merges involving empty buckets upcast
        # int64 -> float64, which would hash join keys differently in
        # any later bucketed stage; cast back to the declared schema
        # wherever null-free.
        for n, t in out_fields:
            want = t.to_pandas_dtype()
            if m[n].dtype != want and not m[n].isna().any():
                try:
                    m[n] = m[n].astype(want, copy=False)
                except (TypeError, ValueError):
                    pass
        return m

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return merge_bucket(g.drop(columns=["_bucket"]))

    return both.groupby("_bucket").map_groups(run, batch_format="pandas")


# Planner switch for smart_join's large-large path. "shuffle" =
# bucketed shuffle_join (robust on Ray 2.49, where Dataset.join's
# aggregator actors livelock below ~4 CPUs); flip to "native" to route
# through hash_join once the skipped-by-default Ray-upgrade canary
# (tests/test_operators.py::test_native_join_livelock_canary) passes
# on the upgraded Ray.
LARGE_LARGE_PATH = "shuffle"


def smart_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    right_on: list[str] | None = None,
    join_type: str = "inner",
    num_partitions: int = 32,
    broadcast_threshold_rows: int = 2_000_000,
    broadcast_threshold_bytes: int = 512 << 20,
) -> ray.data.Dataset:
    """Size-based join strategy: broadcast the right side when it is
    small (count/size are metadata-only for parquet-backed datasets),
    else fall back to the bucketed ``shuffle_join``. This is the
    planner rule the reference applies implicitly by always merging
    small dims driver-side (J3) and the guide's 'broadcast the small
    side' — measured ~4x faster than Dataset.join at testdata scales.
    The byte threshold guards the driver/object-store against a
    narrow-but-huge or wide right side that the row threshold alone
    would happily materialize. UNKNOWN size (lazy non-parquet inputs
    report ``size_bytes() is None``) is treated as too big — broadcast
    eligibility must be proven, not defaulted, and probing ``count()``
    on a lazy dataset would execute its whole upstream pipeline just to
    plan the join."""
    sz = right.size_bytes()
    if sz is not None and 0 < sz <= broadcast_threshold_bytes:
        n_right = right.count()
        if n_right <= broadcast_threshold_rows:
            small = pa.concat_tables(
                [ray.get(ref) for ref in right.to_arrow_refs()],
                promote_options="permissive",
            )
            return broadcast_join(
                left, small, keys=on, join_type=join_type, right_keys=right_on
            )
    if LARGE_LARGE_PATH == "native" and join_type in ("inner", "left"):
        return hash_join(
            left, right, on=on, right_on=right_on, join_type=join_type,
            num_partitions=num_partitions,
        )
    return shuffle_join(
        left, right, on=on, right_on=right_on, join_type=join_type,
        n_buckets=num_partitions,
    )


def semi_anti_join(
    ds: ray.data.Dataset,
    key_values: pa.Array | list,
    column: str,
    anti: bool = False,
) -> ray.data.Dataset:
    """Semi/anti join by broadcasting the key set and filtering inside
    map_batches (J7; reference residual selection
    ``stuttgart_comprehensive_script.py:258``). EXISTS / NOT-EXISTS
    semantics (matching ``shuffle_join``'s semi/anti): nulls in the key
    set are ignored, a null left key matches nothing — semi drops it,
    anti keeps it."""
    arr = pa.array(key_values)
    ref = ray.put(arr.drop_null())

    def flt(batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.is_in(batch[column], value_set=ray.get(ref)), False)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(flt, batch_format="pyarrow")


def planned_semi_anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_col: str,
    right_col: str,
    anti: bool = False,
    broadcast_threshold_bytes: int = 256 << 20,
    n_buckets: int = 32,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Size-gated semi/anti planner (the ``smart_join`` rule applied to
    J7): broadcast the distinct key set only when the right side's size
    is KNOWN and small; otherwise — including lazy inputs whose size is
    unknowable without executing them — run the distributed
    ``shuffle_join`` semi/anti, which never pulls the key set to the
    driver. Both paths implement EXISTS / NOT-EXISTS semantics, so the
    planner choice is invisible to results."""
    sz = right.size_bytes()
    if sz is not None and 0 < sz <= broadcast_threshold_bytes:
        keys = right.unique(right_col)
        return semi_anti_join(left, keys, left_col, anti=anti)
    return shuffle_join(
        left,
        right,
        on=[left_col],
        right_on=[right_col],
        join_type="anti" if anti else "semi",
        n_buckets=n_buckets,
        left_schema=left_schema,
        right_schema=right_schema,
    )


def latest_per_key(
    ds: ray.data.Dataset,
    keys: list[str],
    order_by: list[str],
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Keep the row with max ``order_by`` per key group — the LWW /
    latest-selection shape (O3; reference latest-year filter
    ``population_pipeline_stuttgart.py:52-53``).

    Two-phase for scale: (1) vectorized within-batch dedup BEFORE the
    shuffle (the combiner — shrinks shuffled rows to ≤ keys-per-batch),
    (2) one shuffle on ``hash(keys) % n_buckets`` and a single
    vectorized keep-last kernel per bucket — NOT one pandas call per
    key group."""
    from .bucketed import bucketed_apply

    def keep_newest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + order_by, kind="stable")
        return g[~g.duplicated(keys, keep="last")]

    partial = ds.map_batches(keep_newest, batch_format="pandas")
    return bucketed_apply(partial, keys, keep_newest, n_buckets=n_buckets)


def topk(ds: ray.data.Dataset, col: str, k: int, descending: bool = True) -> ray.data.Dataset:
    """Top-k = per-block prune to k, then global sort+limit over the
    tiny survivor set (O2; reference ``nlargest(5, ...)``
    ``visualization_helpers.py:593``)."""

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        order = pc.sort_indices(
            batch, sort_keys=[(col, "descending" if descending else "ascending")]
        )
        return batch.take(order[:k])

    return ds.map_batches(prune, batch_format="pyarrow").sort(col, descending=descending).limit(k)


def global_stats(ds: ray.data.Dataset, col: str) -> dict:
    """Single-pass global min/max/sum/count for normalization stages.
    ``n`` is SQL ``count(col)``: NON-NULL rows only (Ray's Count
    defaults to counting nulls, which would misalign exact_quantiles'
    rank targets against its null-dropping histogram passes)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    row = ds.aggregate(
        Min(col, alias_name="min"),
        Max(col, alias_name="max"),
        Sum(col, alias_name="sum"),
        Count(col, ignore_nulls=True, alias_name="n"),
    )
    return dict(row)


def minmax_normalize(
    ds: ray.data.Dataset, col: str, output: str, ndigits: int | None = None
) -> ray.data.Dataset:
    """Two-phase global normalization: aggregate stats, broadcast, then
    a vectorized map (A10; reference ``scale01``
    ``make_maps.py:208-215``). The stats pass streams; only two
    scalars cross back to the driver."""
    st = global_stats(ds, col)
    lo, hi = float(st["min"]), float(st["max"])
    span = (hi - lo) or 1.0

    def norm(batch: pa.Table) -> pa.Table:
        x = pc.divide(pc.subtract(batch[col], pa.scalar(lo)), pa.scalar(span))
        if ndigits is not None:
            x = pc.round(x, ndigits=ndigits)
        return batch.append_column(output, x)

    return ds.map_batches(norm, batch_format="pyarrow")


def add_column_expr(ds: ray.data.Dataset, output: str, fn) -> ray.data.Dataset:
    """Vectorized derived column: ``fn(batch) -> pa.Array`` (M12)."""

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(output, fn(batch))

    return ds.map_batches(add, batch_format="pyarrow")
