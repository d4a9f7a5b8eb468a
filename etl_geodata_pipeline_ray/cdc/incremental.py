"""Incremental view maintenance over the lake's changelog.

The CDC-natural consumer pattern: a downstream KPI table (per-
conversation turn/token rollups — the reference's per-district KPI
layer, ``make_maps.py:106-217``, recomputed from scratch every run)
should advance from commit c1 to c2 by applying ``lake_diff(c1, c2)``,
NOT by rescanning the lake. Two layers:

* **Leaf metrics** ``(conv_id, turn_idx, n_tokens)`` — one int per
  live turn. Bootstrapped by ONE full scan (``turn_metrics``), then
  maintained by ``advance_turn_metrics``: changed keys are dropped via
  a bucketed anti-join (only the two key columns of the leaf table
  ride the shuffle) and the diff's live rows are appended. The
  expensive work — reading + tokenizing the wide ``text`` payload — is
  done ONLY for changed rows; the lake's text is never re-read.
* **Rollup** ``(conv_id, n_turns, total_tokens)`` — maintained by
  delta algebra (``advance_conv_counts``): every diff row contributes
  ``(+1 turn, +new_tokens)`` if live, and every changed key's OLD leaf
  row contributes ``(-1 turn, -old_tokens)``; summing base + deltas
  per conversation yields the c2 rollup exactly (insert = +new only,
  update = +new -old, delete = -old only; ``lake_diff`` emits a delete
  only for a previously-live key, so the algebra needs no casing).

Scale posture: delta construction is ∝ |diff|. The anti/semi joins
ship leaf KEY columns only (~16 bytes/row) and the rollup apply is one
co-bucketed union + groupby-sum of rollup-width rows (~24 bytes/row) —
at 10^10 keys, store both tables hash-bucketed by ``conv_id`` (the
same bucketing the joins here already use) and run the identical
algebra per affected bucket.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ..stages.relational import shuffle_join
from ..stages.text import token_count_batch
from .replay import lake_diff, read_lake
from .schema import conform

LEAF_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("n_tokens", pa.int64()),
    ]
)
_KEY_SCHEMA = pa.schema(
    [pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32())]
)
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


def conv_counts(metrics: ray.data.Dataset) -> ray.data.Dataset:
    """Rollup from a leaf table: per-conv turn count + token total
    (map-side combiner via partial per-block sums, then a tiny
    groupby of (conv, partial) rows)."""

    def partial(t: pa.Table) -> pa.Table:
        ones = pc.fill_null(pa.nulls(t.num_rows, pa.int64()), 1)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "n_turns": ones,
                "total_tokens": t["n_tokens"],
            },
            schema=COUNTS_SCHEMA,
        )

    return (
        metrics.map_batches(partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("total_tokens", alias_name="total_tokens"),
        )
    )


def _diff_keys(diff: ray.data.Dataset) -> ray.data.Dataset:
    def keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": pc.cast(t["conv_id"], pa.string()),
                "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            },
            schema=_KEY_SCHEMA,
        )

    return diff.map_batches(keys, batch_format="pyarrow")


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
) -> ray.data.Dataset:
    """Leaf table at ``to_commit`` from the table at ``from_commit``:
    drop every changed key (bucketed anti-join, key columns only on
    the exchange), append the changelog's live rows. Text is read and
    tokenized ONLY for the |diff| changed rows."""
    diff = lake_diff(lake_dir, from_commit, to_commit)
    survivors = shuffle_join(
        metrics,
        _diff_keys(diff),
        on=["conv_id", "turn_idx"],
        join_type="anti",
        n_buckets=n_buckets,
        left_schema=LEAF_SCHEMA,
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
) -> ray.data.Dataset:
    """Rollup at ``to_commit`` by delta algebra (module docstring):
    base rollup + (+1, +new_tokens) per live diff row + (-1,
    -old_tokens) per changed key found in the ``from_commit`` leaf
    table (a bucketed semi-join; an inserted key is absent there and
    contributes no minus row). Conversations whose turn count reaches
    0 drop out, matching a fresh recompute."""
    diff = lake_diff(lake_dir, from_commit, to_commit)

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

    old = shuffle_join(
        metrics,
        _diff_keys(diff),
        on=["conv_id", "turn_idx"],
        join_type="semi",
        n_buckets=n_buckets,
        left_schema=LEAF_SCHEMA,
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

    base = base_counts.map_batches(
        lambda t: conform(t, COUNTS_SCHEMA), batch_format="pyarrow"
    )
    summed = (
        base.union(diff.map_batches(plus, batch_format="pyarrow"))
        .union(old.map_batches(minus, batch_format="pyarrow"))
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("total_tokens", alias_name="total_tokens"),
        )
    )
    return summed.map_batches(
        lambda t: conform(
            t.filter(pc.greater(t["n_turns"], pa.scalar(0))), COUNTS_SCHEMA
        ),
        batch_format="pyarrow",
    )
