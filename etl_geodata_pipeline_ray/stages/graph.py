"""Distributed connected components via iterative min-label
propagation — the scale path for near-duplicate clustering when the
candidate-pair graph is too large for driver-side union-find
(the guide's recommended shape: "iterate a few rounds of min-label
propagation with groupby").

Algorithm (a simplified Two-Phase/label-propagation CC, cf.
Kiveris et al. 2014 "Connected Components in MapReduce and Beyond"):
  labels L start as identity; each round every edge (u, v) proposes
  L[u] to v and L[v] to u, and every node keeps the min proposal:
      L'{x} = min(L[x], min over neighbors n of L[n])
  Converges in O(diameter) rounds; near-dup clusters are dense and
  shallow, so a handful of rounds suffices. Each round is one
  bucketed shuffle over (edges ∪ labels) — no driver-side state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .bucketed import bucketed_apply


def connected_components(
    edges: pd.DataFrame | ray.data.Dataset,
    max_rounds: int = 10,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """``edges``: columns (a, b) int64. Returns (node, component) where
    component = min node id reachable; only nodes appearing in edges
    are returned."""
    if isinstance(edges, ray.data.Dataset):
        edges = edges.to_pandas()
    edges = edges[["a", "b"]].astype(np.int64)
    # undirected edge list, deduped
    und = pd.concat(
        [edges, edges.rename(columns={"a": "b", "b": "a"})], ignore_index=True
    ).drop_duplicates()
    und_ds = ray.data.from_pandas(und)

    nodes = np.unique(np.concatenate([edges["a"], edges["b"]]))
    labels = pd.DataFrame({"node": nodes, "label": nodes})

    for _ in range(max_rounds):
        import ray as _ray

        lref = _ray.put(labels)

        def propose(batch: pd.DataFrame) -> pd.DataFrame:
            lab = _ray.get(lref)
            m = batch.merge(lab, left_on="b", right_on="node", how="left")
            return pd.DataFrame({"node": m["a"], "prop": m["label"]})

        def take_min(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("node", as_index=False)["prop"].min()
            return out.rename(columns={"prop": "label"})

        proposals = und_ds.map_batches(propose, batch_format="pandas")
        new = (
            bucketed_apply(proposals, ["node"], take_min, n_buckets=n_buckets)
            .to_pandas()
        )
        merged = labels.merge(new, on="node", how="left", suffixes=("", "_new"))
        new_label = np.minimum(
            merged["label"].to_numpy(),
            merged["label_new"].fillna(merged["label"]).to_numpy(),
        ).astype(np.int64)
        changed = int((new_label != labels["label"].to_numpy()).sum())
        labels = pd.DataFrame({"node": labels["node"], "label": new_label})
        if changed == 0:
            break
    return labels.rename(columns={"label": "component"}).sort_values("node").reset_index(drop=True)
