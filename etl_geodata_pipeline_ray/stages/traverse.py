"""Stateful graph-traversal scorer — the reference's walk-graph
Dijkstra stage (ST1: ``generate_h3_advanced_maps.py:350-385`` builds a
networkx road graph once per run, ``:474-515`` scores every H3 cell by
shortest-path access time) re-expressed Ray-Data-first: the edge list
is broadcast once (``ray.put``), each map_batches ACTOR builds its
adjacency structure and runs single-source Dijkstra ONCE in
``__init__``, and ``__call__`` is a vectorized distance lookup per
batch — state per worker, never per batch.

The partitioning assumption: the graph itself is the SMALL side (road
networks, entity graphs — millions of edges fit one worker); the
dataset being scored is the big side and streams. For graphs too big
for one worker, ``stages/graph.py``'s Dataset-resident label
propagation is the template (bounded-hop relaxation as iterated
``shuffle_join`` rounds) — not this operator.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data


def dijkstra(
    n_nodes: int,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    source: int,
) -> np.ndarray:
    """Single-source shortest path over a directed edge list; returns a
    float64 distance array (np.inf where unreachable). CSR adjacency +
    binary heap — O(E log V), built for graphs that fit one worker."""
    # validate up front: a negative dst would WRAP via numpy indexing
    # and silently corrupt another node's distance; out-of-range ids
    # would IndexError mid-traversal
    if len(dst) and (int(dst.min()) < 0 or int(dst.max()) >= n_nodes):
        raise ValueError(
            f"dst node ids must be in [0, {n_nodes}); got "
            f"[{int(dst.min())}, {int(dst.max())}]"
        )
    if len(src) and (int(src.min()) < 0 or int(src.max()) >= n_nodes):
        raise ValueError(
            f"src node ids must be in [0, {n_nodes}); got "
            f"[{int(src.min())}, {int(src.max())}]"
        )
    if not 0 <= source < n_nodes:
        # a negative source would silently wrap (numpy indexing) and
        # anchor every distance at the WRONG node — same hazard the
        # src/dst checks above guard against, for the scalar
        raise ValueError(f"source must be in [0, {n_nodes}); got {source}")
    order = np.argsort(src, kind="stable")
    src_s, dst_s, w_s = src[order], dst[order], weight[order]
    starts = np.searchsorted(src_s, np.arange(n_nodes + 1))
    dist = np.full(n_nodes, np.inf)
    dist[source] = 0.0
    heap = [(0.0, source)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        for i in range(starts[u], starts[u + 1]):
            v = int(dst_s[i])
            nd = d + float(w_s[i])
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(heap, (nd, int(v)))
    return dist


class DijkstraScorer:
    """Actor-pool stage: score a node-id column with its shortest-path
    distance from ``source``. Pass the broadcast edge-table ref
    (``ray.put`` of a dict with src/dst/weight int64/float64 arrays)
    so N actors share ONE object-store copy; the Dijkstra pass runs
    once per actor in ``__init__``."""

    def __init__(
        self,
        edges_ref,
        n_nodes: int,
        source: int = 0,
        node_col: str = "node",
        output: str = "dist",
    ):
        edges = ray.get(edges_ref) if isinstance(edges_ref, ray.ObjectRef) else edges_ref
        self.dist = dijkstra(
            n_nodes,
            np.asarray(edges["src"], dtype=np.int64),
            np.asarray(edges["dst"], dtype=np.int64),
            np.asarray(edges["weight"], dtype=np.float64),
            source,
        )
        self.node_col = node_col
        self.output = output

    def __call__(self, batch: pa.Table) -> pa.Table:
        nodes = batch[self.node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # out-of-range ids (negative sentinels, unknown nodes) score
        # inf, not another node's distance — negative numpy indices
        # would silently wrap around
        ok = (nodes >= 0) & (nodes < len(self.dist))
        d = np.full(len(nodes), np.inf)
        d[ok] = self.dist[nodes[ok]]
        return batch.append_column(self.output, pa.array(d))


def build_edge_table(
    ds: ray.data.Dataset,
    src_col: str,
    dst_col: str,
    weight_col: str,
) -> dict:
    """Distributed edge aggregation: min weight per (src, dst) with a
    per-block combiner before the (tiny) groupby — the graph-build
    shuffle moves at most distinct-edge rows, never raw rows. Returns
    driver-side numpy arrays (the graph is the small side by the
    operator's contract) ready for ``ray.put``."""
    import pandas as pd

    from ray.data.aggregate import Min

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "src": t[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
                "dst": t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64),
                "weight": t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64),
            }
        )
        return df.groupby(["src", "dst"], as_index=False)["weight"].min()

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Min("weight", alias_name="weight"))
        .to_pandas()
    )
    return {
        "src": agg["src"].to_numpy(dtype=np.int64),
        "dst": agg["dst"].to_numpy(dtype=np.int64),
        "weight": agg["weight"].to_numpy(dtype=np.float64),
    }
