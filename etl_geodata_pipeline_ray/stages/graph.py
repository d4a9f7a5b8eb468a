"""Distributed connected components via iterative min-label
propagation with pointer jumping — the scale path for near-duplicate
clustering when the candidate-pair graph is too large for driver-side
union-find.

Algorithm (simplified Two-Phase/label-propagation CC, cf. Kiveris et
al. 2014 "Connected Components in MapReduce and Beyond"): labels L
start as identity; each round every edge (u, v) proposes L[u] to v and
L[v] to u, every node keeps the min of its own and proposed labels,
then one pointer-jumping step (L[x] = L[L[x]]) halves the remaining
diameter, so convergence is O(log d) rounds.

State lives in Ray Datasets end to end: labels are a Dataset, each
round is a bucketed shuffle_join + a bucketed min — the driver holds
only the per-round changed-row count (one scalar). This fixes the
round-1 shape where the whole label table was ray.put once per round
and merged on the driver.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import ray.data

from .bucketed import bucketed_apply


def _min_label_per_node(ds: ray.data.Dataset, n_buckets: int) -> ray.data.Dataset:
    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False)["label"].min()

    return bucketed_apply(ds, ["node"], kernel, n_buckets=n_buckets)


def connected_components(
    edges: pd.DataFrame | ray.data.Dataset,
    max_rounds: int = 25,
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """``edges``: columns (a, b) int64. Returns a DATASET of (node,
    component) where component = min node id reachable; only nodes
    appearing in edges are returned. The result stays Dataset-resident
    so 10^9-node label tables never touch the driver — callers sink it
    with ``write_parquet`` (or ``write_groups_lake``) at scale and
    ``to_pandas()`` only small results. Warns (loudly) if
    ``max_rounds`` is hit before convergence — with pointer jumping
    that means diameter > 2^rounds."""
    from .relational import shuffle_join

    empty = pd.DataFrame(
        {"node": pd.Series([], dtype=np.int64), "component": pd.Series([], dtype=np.int64)}
    )
    if isinstance(edges, pd.DataFrame):
        edges = ray.data.from_pandas(
            edges[["a", "b"]].astype(np.int64)
            if len(edges)
            else pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
        )

    # undirected edge list (src, dst), deduped once, reused every round
    def both_dirs(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": np.concatenate([t["a"].to_numpy(), t["b"].to_numpy()]).astype(np.int64),
                "dst": np.concatenate([t["b"].to_numpy(), t["a"].to_numpy()]).astype(np.int64),
            }
        )

    und = bucketed_apply(
        edges.map_batches(both_dirs, batch_format="pandas"),
        ["src", "dst"],
        lambda g: g.drop_duplicates(),
        n_buckets=n_buckets,
    ).materialize()
    n_edges = und.count()
    if n_edges == 0:
        return ray.data.from_pandas(empty)
    # adapt bucket count to graph size: per-round cost on small graphs
    # is all fixed task/sort overhead, which scales with bucket count
    n_buckets = max(4, min(n_buckets, int(np.ceil(n_edges / 20_000))))

    # neighborhood-min initialization: label(x) = min(x, direct
    # neighbors) — one bucketed min over the edge rows themselves (no
    # join), which fully converges 2-cliques and stars in ZERO
    # propagation rounds, so the first fold detects changed=0 and the
    # common shallow near-dup clusters pay a single round total
    labels = _min_label_per_node(
        und.map_batches(
            lambda t: pd.DataFrame(
                {
                    "node": t["src"],
                    "label": np.minimum(t["src"].to_numpy(), t["dst"].to_numpy()),
                }
            ),
            batch_format="pandas",
        ),
        n_buckets,
    ).materialize()

    import pyarrow as pa

    und_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    lab_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])

    import os, time as _time
    _dbg = os.environ.get("GRAFT_CC_DEBUG")
    converged = False
    for _rnd in range(max_rounds):
        _t0 = _time.time()
        # propose each src's label to its dst neighbors
        j = shuffle_join(
            und, labels, on=["src"], right_on=["node"], n_buckets=n_buckets,
            left_schema=und_schema, right_schema=lab_schema,
        )
        props = j.map_batches(
            lambda t: pd.DataFrame({"node": t["dst"], "label": t["label"]}),
            batch_format="pandas",
        )
        # keep min(own, proposed); count changed rows distributed
        def fold(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("node", as_index=False).agg(
                label=("label", "min"), _old=("_old", "min")
            )
            out["_chg"] = (out["label"] != out["_old"]).astype(np.int64)
            return out[["node", "label", "_chg"]]

        tagged_old = labels.map_batches(
            lambda t: t.assign(_old=t["label"]), batch_format="pandas"
        )
        tagged_new = props.map_batches(
            lambda t: t.assign(_old=np.int64(np.iinfo(np.int64).max)),
            batch_format="pandas",
        )
        folded = bucketed_apply(
            tagged_old.union(tagged_new), ["node"], fold, n_buckets=n_buckets
        ).materialize()
        changed = folded.sum("_chg")
        if _dbg:
            print(f"[cc] round {_rnd}: fold {_time.time()-_t0:.1f}s changed={changed}", flush=True)
        new_labels = folded.drop_columns(["_chg"])
        if not changed:
            labels = new_labels.materialize()
            converged = True
            break
        # pointer jumping: label <- label-of-label (halves diameter)
        as_dict = new_labels.map_batches(
            lambda t: pd.DataFrame({"node2": t["node"], "label2": t["label"]}),
            batch_format="pandas",
        )
        pj = shuffle_join(
            new_labels, as_dict, on=["label"], right_on=["node2"],
            join_type="left", n_buckets=n_buckets,
            left_schema=lab_schema,
            right_schema=pa.schema([("node2", pa.int64()), ("label2", pa.int64())]),
        )
        # pj output is already unique per node (labels are unique per
        # node, as_dict unique per node2), so min(own, label-of-label)
        # is a plain map — no extra shuffle. The repartition caps the
        # per-round block-count snowball: every union+sort chain
        # multiplies tiny blocks, and sort cost scales with block count.
        labels = (
            pj.map_batches(
                lambda t: pd.DataFrame(
                    {
                        "node": t["node"],
                        "label": np.minimum(
                            t["label"].to_numpy(),
                            t["label2"].fillna(t["label"]).to_numpy().astype(np.int64),
                        ),
                    }
                ),
                batch_format="pandas",
            )
            .repartition(n_buckets)
            .materialize()
        )

    if not converged:
        warnings.warn(
            f"connected_components: not converged after {max_rounds} rounds; "
            "labels may split a large-diameter component",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.map_batches(
        lambda t: pd.DataFrame(
            {
                "node": t["node"].to_numpy().astype(np.int64),
                "component": t["label"].to_numpy().astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
