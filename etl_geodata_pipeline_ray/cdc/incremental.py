"""Incremental view maintenance over the lake's changelog.

The CDC-natural consumer pattern: a downstream KPI table (per-
conversation turn/token rollups — the reference's per-district KPI
layer, ``make_maps.py:106-217``, recomputed from scratch every run)
should advance from commit c1 to c2 by applying ``lake_diff(c1, c2)``,
NOT by rescanning the lake. Two layers:

* **Leaf metrics** ``(conv_id, turn_idx, n_tokens)`` — one int per
  live turn. Bootstrapped by ONE full scan (``turn_metrics``), then
  maintained by ``advance_turn_metrics``: changed keys are dropped via
  a size-gated anti-join — the materialized changed-key set has a
  KNOWN size, so the sparse steady-state case broadcasts it and the
  leaf filter is one map-only ``is_in`` pass (no shuffle at all); a
  dense changelog falls back to the bucketed shuffle automatically —
  and the diff's live rows are appended. The expensive work — reading
  + tokenizing the wide ``text`` payload — is done ONLY for changed
  rows; the lake's text is never re-read.
* **Rollup** ``(conv_id, n_turns, total_tokens)`` — maintained by
  delta algebra (``advance_conv_counts``): every diff row contributes
  ``(+1 turn, +new_tokens)`` if live, and every changed key's OLD leaf
  row contributes ``(-1 turn, -old_tokens)``; summing base + deltas
  per conversation yields the c2 rollup exactly (insert = +new only,
  update = +new -old, delete = -old only; ``lake_diff`` emits a delete
  only for a previously-live key, so the algebra needs no casing).

Scale posture: delta construction is ∝ |diff|. Sparse changelogs
(the steady state) broadcast the changed-key set, so the leaf pass is
map-only; dense ones shuffle leaf KEY strings only (~30 bytes/row).
The rollup apply is one union + groupby-sum of rollup-width rows
(~24 bytes/row) — at 10^10 keys, store both tables hash-bucketed by
``conv_id`` (the same bucketing the shuffle fallback uses) and run
the identical algebra per affected bucket.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ..stages.relational import planned_semi_anti_join
from ..stages.text import token_count_batch
from .replay import _flat, lake_diff, read_lake
from .schema import conform

LEAF_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("n_tokens", pa.int64()),
    ]
)
_KEY_SCHEMA = pa.schema([pa.field("_k", pa.string())])
_LEAF_K_SCHEMA = pa.schema(list(LEAF_SCHEMA) + [pa.field("_k", pa.string())])
COUNTS_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("n_turns", pa.int64()),
        pa.field("total_tokens", pa.int64()),
    ]
)


def _leaf(t: pa.Table) -> pa.Table:
    # null text counts 0 tokens (the rollup Sum skips nulls; folding
    # the fill into the leaf keeps leaf/rollup/delta algebra closed
    # over int64 with no null casing anywhere downstream)
    n = pc.fill_null(pc.cast(token_count_batch(t["text"]), pa.int64()), 0)
    return pa.table(
        {
            "conv_id": pc.cast(t["conv_id"], pa.string()),
            "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            "n_tokens": n,
        },
        schema=LEAF_SCHEMA,
    )


def turn_metrics(
    lake_dir: str | Path, at_commit: str | None = None
) -> ray.data.Dataset:
    """Bootstrap the leaf metric table: one streaming scan of the lake
    state at ``at_commit`` (default: current)."""
    ds = read_lake(lake_dir, columns=["conv_id", "turn_idx", "text"], at_commit=at_commit)
    return ds.map_batches(_leaf, batch_format="pyarrow")


def conv_counts(
    metrics: ray.data.Dataset, n_partitions: int = 32
) -> ray.data.Dataset:
    """Rollup from a leaf table: per-conv turn count + token total.
    Map-side COMBINER first (within-batch pandas groupby shrinks each
    block to its distinct convs), then one repartitioned groupby-sum —
    the leaf table's row count never rides the sort shuffle, and the
    repartition collapses the many tiny partial blocks whose per-block
    fixed cost otherwise dominates the aggregate (same lesson as
    ``shuffle_join``'s exchange)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["conv_id", "n_tokens"]).to_pandas()
        g = df.groupby("conv_id", as_index=False, sort=False).agg(
            n_turns=("n_tokens", "size"), total_tokens=("n_tokens", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).cast(COUNTS_SCHEMA)

    return (
        metrics.map_batches(partial, batch_format="pyarrow")
        .repartition(n_partitions)
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("total_tokens", alias_name="total_tokens"),
        )
    )


def _key_col(t: pa.Table) -> pa.Array:
    # collision-safe composite merge key as ONE string column
    # ("len:conv:turn" — length-prefixed, so a conv_id containing the
    # separator cannot alias another key), built Arrow-side so the
    # planner's broadcast is_in and the shuffle fallback hash both see
    # one dtype-stable column
    conv = pc.cast(t["conv_id"], pa.string())
    return pc.binary_join_element_wise(
        pc.cast(pc.utf8_length(conv), pa.string()),
        conv,
        pc.cast(t["turn_idx"], pa.string()),
        ":",
    )


def _with_key(t: pa.Table) -> pa.Table:
    return conform(t, LEAF_SCHEMA).append_column("_k", _key_col(t))


def _diff_keys(diff: ray.data.Dataset) -> ray.data.Dataset:
    def keys(t: pa.Table) -> pa.Table:
        return pa.table({"_k": _key_col(t)}, schema=_KEY_SCHEMA)

    # materialized: the planner broadcasts the key set when its KNOWN
    # size is small (the sparse steady-state case — the leaf filter
    # becomes one map-only is_in pass, no shuffle); a dense changelog
    # exceeds the threshold and falls back to the bucketed shuffle
    return diff.map_batches(keys, batch_format="pyarrow").materialize()


def _diff_live_leaves(diff: ray.data.Dataset) -> ray.data.Dataset:
    def live(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["change"], pa.scalar("delete")))
        return _leaf(t)

    return diff.map_batches(live, batch_format="pyarrow")


def advance_turn_metrics(
    metrics: ray.data.Dataset,
    lake_dir: str | Path,
    from_commit: str,
    to_commit: str,
    n_buckets: int = 32,
    diff: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Leaf table at ``to_commit`` from the table at ``from_commit``:
    drop every changed key (size-gated anti-join: broadcast ``is_in``
    when the changed-key set is small, bucketed shuffle when dense),
    append the changelog's live rows. Text is read and tokenized ONLY
    for the |diff| changed rows.

    The diff is materialized once: it feeds two consumers (the key
    set and the live rows) and is bounded by the CHANGE volume — far
    smaller than the snapshots whose per-shard diff would otherwise
    re-execute per consumer (2x read amplification). A caller
    advancing BOTH the leaf table and the rollup for the same commit
    window should compute it once —
    ``diff = lake_diff(lake, c1, c2).materialize()`` — and pass it to
    both advances via ``diff=`` (halves the changelog I/O)."""
    if diff is None:
        diff = lake_diff(lake_dir, from_commit, to_commit).materialize()
    survivors = planned_semi_anti_join(
        metrics.map_batches(_with_key, batch_format="pyarrow"),
        _diff_keys(diff),
        "_k",
        "_k",
        anti=True,
        n_buckets=n_buckets,
        left_schema=_LEAF_K_SCHEMA,
        right_schema=_KEY_SCHEMA,
    ).map_batches(lambda t: conform(t, LEAF_SCHEMA), batch_format="pyarrow")
    return survivors.union(_diff_live_leaves(diff))


def advance_conv_counts(
    base_counts: ray.data.Dataset,
    metrics: ray.data.Dataset,
    lake_dir: str | Path,
    from_commit: str,
    to_commit: str,
    n_buckets: int = 32,
    broadcast_threshold_bytes: int = 64 << 20,
    diff: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Rollup at ``to_commit`` by delta algebra (module docstring):
    base rollup + (+1, +new_tokens) per live diff row + (-1,
    -old_tokens) per changed key found in the ``from_commit`` leaf
    table (a size-gated semi-join; an inserted key is absent there and
    contributes no minus row). Conversations whose turn count reaches
    0 drop out, matching a fresh recompute.

    The apply is size-gated like the joins: the per-conv DELTA table
    (≤ changed convs) is aggregated first; when its KNOWN size is
    small it is broadcast and applied to the rollup as map-only passes
    (an ``is_in`` probe for which delta convs already exist, then one
    vectorized per-batch Arrow join) — the steady-state advance
    touches the rollup with NO shuffle at all. A dense changelog falls
    back to one union + repartitioned groupby-sum of rollup-width
    rows. The diff feeds two consumers and is change-volume-bounded,
    so it is materialized once (see ``advance_turn_metrics``) — or
    passed in via ``diff=`` to share one changelog across both
    advances of a commit step."""
    import ray as _ray

    if diff is None:
        diff = lake_diff(lake_dir, from_commit, to_commit).materialize()

    def plus(t: pa.Table) -> pa.Table:
        leaf = _leaf(t.filter(pc.not_equal(t["change"], pa.scalar("delete"))))
        ones = pc.fill_null(pa.nulls(leaf.num_rows, pa.int64()), 1)
        return pa.table(
            {
                "conv_id": leaf["conv_id"],
                "n_turns": ones,
                "total_tokens": leaf["n_tokens"],
            },
            schema=COUNTS_SCHEMA,
        )

    old = planned_semi_anti_join(
        metrics.map_batches(_with_key, batch_format="pyarrow"),
        _diff_keys(diff),
        "_k",
        "_k",
        anti=False,
        n_buckets=n_buckets,
        left_schema=_LEAF_K_SCHEMA,
        right_schema=_KEY_SCHEMA,
    )

    def minus(t: pa.Table) -> pa.Table:
        t = conform(t, LEAF_SCHEMA)
        neg1 = pc.fill_null(pa.nulls(t.num_rows, pa.int64()), -1)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "n_turns": neg1,
                "total_tokens": pc.negate_checked(t["n_tokens"]),
            },
            schema=COUNTS_SCHEMA,
        )

    deltas = (
        diff.map_batches(plus, batch_format="pyarrow")
        .union(old.map_batches(minus, batch_format="pyarrow"))
        .repartition(min(8, n_buckets))
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("total_tokens", alias_name="total_tokens"),
        )
        .materialize()
    )
    base = base_counts.map_batches(
        lambda t: conform(t, COUNTS_SCHEMA), batch_format="pyarrow"
    )

    def finish(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(
            lambda t: conform(
                t.filter(pc.greater(t["n_turns"], pa.scalar(0))), COUNTS_SCHEMA
            ),
            batch_format="pyarrow",
        )

    sz = deltas.size_bytes()
    if sz is None or sz > broadcast_threshold_bytes:
        # dense changelog: one narrow shuffle of rollup-width rows
        summed = (
            base.union(deltas)
            .repartition(n_buckets)
            .groupby("conv_id")
            .aggregate(
                Sum("n_turns", alias_name="n_turns"),
                Sum("total_tokens", alias_name="total_tokens"),
            )
        )
        return finish(summed)

    # pin the base rollup's blocks before consuming it twice (probe +
    # apply): without this, chained advances (k = advance(k, ...) per
    # commit) re-execute every earlier advance's lazy lineage on each
    # consume — O(n^2) total recomputation over n steps
    base = base.materialize()
    dt = pa.concat_tables(
        _ray.get(deltas.to_arrow_refs()), promote_options="permissive"
    )
    dt = conform(dt, COUNTS_SCHEMA).rename_columns(
        ["conv_id", "d_turns", "d_tokens"]
    )
    ref = _ray.put(dt)

    def probe(t: pa.Table) -> pa.Table:
        d = _ray.get(ref)
        keys = _flat(d["conv_id"])
        m = pc.fill_null(pc.is_in(t["conv_id"], value_set=keys), False)
        return t.select(["conv_id"]).filter(m)

    # which delta convs already exist in the rollup — map-only, output
    # bounded by |delta convs| (itself under the broadcast gate)
    matched = pa.concat_arrays(
        [
            _flat(t["conv_id"])
            for t in _ray.get(
                base.map_batches(probe, batch_format="pyarrow").to_arrow_refs()
            )
            if t.num_rows
        ]
        or [pa.array([], type=pa.string())]
    )

    def apply(t: pa.Table) -> pa.Table:
        d = _ray.get(ref)
        j = conform(t, COUNTS_SCHEMA).join(
            d, keys=["conv_id"], join_type="left outer"
        )
        n = pc.add(j["n_turns"], pc.fill_null(j["d_turns"], 0))
        tok = pc.add(j["total_tokens"], pc.fill_null(j["d_tokens"], 0))
        out = pa.table(
            {"conv_id": j["conv_id"], "n_turns": n, "total_tokens": tok},
            schema=COUNTS_SCHEMA,
        )
        return out.filter(pc.greater(out["n_turns"], pa.scalar(0)))

    updated = base.map_batches(apply, batch_format="pyarrow")
    fresh = dt.filter(
        pc.invert(pc.fill_null(pc.is_in(dt["conv_id"], value_set=matched), False))
    )
    fresh = pa.table(
        {
            "conv_id": fresh["conv_id"],
            "n_turns": fresh["d_turns"],
            "total_tokens": fresh["d_tokens"],
        },
        schema=COUNTS_SCHEMA,
    )
    fresh = fresh.filter(pc.greater(fresh["n_turns"], pa.scalar(0)))
    return updated.union(ray.data.from_arrow(fresh))


