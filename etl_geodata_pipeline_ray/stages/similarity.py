"""Similarity search over an embedding column (``list<float>``).

* ``cosine_topk`` — exact brute-force top-k per query: broadcast the
  query matrix once (``ray.put``), per batch one float64 matmul, keep
  the per-batch local top-k, finish with a tiny per-query merge. The
  only data crossing the shuffle is (n_batches × k × n_queries) rows.
* ``ivf_topk`` — IVF-style scale path: k-means centroids trained on a
  driver-side sample, broadcast; per batch assign + search only probed
  partitions. Approximate; recall controlled by ``nprobe``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _to_matrix(col: pa.ChunkedArray | pa.Array, dim: int) -> np.ndarray:
    """Embedding column → (n, dim) float64 matrix. Handles plain Arrow
    list arrays (zero-copy flatten) and Ray's ArrowTensorArray
    extension type (from_pandas ndarray columns)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        return np.asarray(col.flatten(), dtype=np.float64).reshape(-1, dim)
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object:
        arr = np.stack(arr)
    return np.asarray(arr, dtype=np.float64).reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def cosine_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k for each query vector. Returns
    (query_id, vec_id, cos) with cos rounded to 4 digits and
    deterministic (cos desc, vec_id asc) tie order."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(Q)
    qids = np.asarray(query_ids)

    def local_topk(batch: pa.Table) -> pa.Table:
            Q_ = ray.get(qref)  # object-store local: zero-copy after first task
            E = _normalize(_to_matrix(batch[emb_col], dim))
            ids = np.asarray(batch[id_col])
            S = E @ Q_.T  # (n, q)
            out_q, out_id, out_cos = [], [], []
            for j in range(S.shape[1]):
                s = S[:, j]
                m = np.ones(len(s), dtype=bool)
                if exclude_self:
                    m &= ids != qids[j]
                sj, idsj = s[m], ids[m]
                if len(sj) > k:
                    part = np.argpartition(-sj, k)[:k]
                    sj, idsj = sj[part], idsj[part]
                out_q.append(np.full(len(sj), qids[j]))
                out_id.append(idsj)
                out_cos.append(sj)
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                    id_col: pa.array(np.concatenate(out_id), type=pa.int64()),
                    "cos": pa.array(np.concatenate(out_cos)),
                }
            )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", id_col], ascending=[False, True], kind="stable").head(k)
        g["cos"] = g["cos"].round(4)
        return g

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
        .reset_index(drop=True)
    )


def train_centroids(
    ds: ray.data.Dataset,
    n_centroids: int = 16,
    sample_fraction: float = 0.25,
    emb_col: str = "embedding",
    dim: int = 64,
    iters: int = 10,
    seed: int = 3,
    max_train_rows: int = 1_000_000,
    tol: float = 1e-4,
) -> np.ndarray:
    """DISTRIBUTED Lloyd's k-means (spherical): the training sample
    stays a Dataset; each iteration is one ``map_batches`` pass
    emitting per-batch ``(cluster, count, sum)`` partials, and the
    driver folds only ``n_centroids × dim`` floats per pass — never
    the vectors. Replaces the round-4 driver-side 50k ``take_all()``
    (the one training stage that couldn't grow with the cluster; FAISS
    trains IVF on samples, but the SAMPLE here can now be millions of
    rows across the cluster). Early-stops when the max centroid shift
    drops under ``tol``. Only a few strided seed candidates per batch ever
    reach the driver."""
    if sample_fraction < 1.0:
        sample = ds.random_sample(sample_fraction, seed=seed)
    else:
        sample = ds
    sample = sample.limit(max_train_rows).materialize()

    # init: every BATCH contributes a few evenly-strided candidate
    # vectors, so the k-bounded seed pool spans the whole dataset even
    # when it arrives sorted/clustered (a head `limit()` would draw all
    # seeds from one region and Lloyd would merge true clusters).
    # Driver holds O(n_batches·dim) candidates, never the training set.
    per_batch = 4

    def seed_cand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([emb_col])
        idx = np.unique(
            np.linspace(0, t.num_rows - 1, min(per_batch, t.num_rows)).astype(
                np.int64
            )
        )
        return t.select([emb_col]).take(idx)

    cand_rows = sample.map_batches(
        seed_cand, batch_format="pyarrow"
    ).take_all()
    X0 = _normalize(
        np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in cand_rows])
    )
    rng = np.random.default_rng(seed)
    C = X0[rng.choice(len(X0), size=min(n_centroids, len(X0)), replace=False)]
    k = len(C)

    for _ in range(iters):
        cref = ray.put(C)

        def partials(batch: pa.Table) -> pa.Table:
            C_ = ray.get(cref)
            E = _normalize(_to_matrix(batch[emb_col], dim))
            assign = (E @ C_.T).argmax(axis=1)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, assign, E)
            cnts = np.bincount(assign, minlength=k)
            return pa.table({
                "cid": pa.array(np.arange(k), type=pa.int64()),
                "cnt": pa.array(cnts, type=pa.int64()),
                "vsum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), type=pa.float64()), dim
                ),
            })

        # k rows per BATCH reach the driver — k × n_batches × dim
        # floats total, independent of the training-set size
        folded_sums = np.zeros((k, dim), dtype=np.float64)
        folded_cnts = np.zeros(k, dtype=np.int64)
        for part in sample.map_batches(
            partials, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            # np.add.at: one delivered batch may concatenate several
            # tasks' partials, repeating cids — fancy += would drop them
            cid = part["cid"].to_numpy()
            np.add.at(folded_cnts, cid, part["cnt"].to_numpy())
            np.add.at(
                folded_sums,
                cid,
                np.asarray(part["vsum"].combine_chunks().flatten()).reshape(
                    -1, dim
                ),
            )
        nxt = C.copy()
        nz = folded_cnts > 0
        v = folded_sums[nz] / folded_cnts[nz, None]
        nxt[nz] = v / np.linalg.norm(v, axis=1, keepdims=True)
        shift = float(np.abs(nxt - C).max())
        C = nxt
        if shift < tol:
            break
    return C


def ivf_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 10,
    nprobe: int = 4,
    n_centroids: int = 16,
    spill: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
) -> pd.DataFrame:
    """IVF approximate top-k: only batches' vectors assigned to each
    query's ``nprobe`` nearest centroids are scored. Same output shape
    as ``cosine_topk``. ``spill`` multi-assigns each data vector to its
    top-s cells (standard IVF spilling) — cell-boundary neighbors stay
    findable on diffuse data at the cost of an s× larger index."""
    C = train_centroids(ds, n_centroids=n_centroids, emb_col=emb_col, dim=dim)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    cref = ray.put((C, Q, probe))
    qids = np.asarray(query_ids)

    def probed_topk(batch: pa.Table) -> pa.Table:
            C_, Q_, probe_ = ray.get(cref)
            E = _normalize(_to_matrix(batch[emb_col], dim))
            ids = np.asarray(batch[id_col])
            sims = E @ C_.T
            s_ = min(spill, sims.shape[1])
            assign = np.argpartition(-sims, s_ - 1, axis=1)[:, :s_]  # (n, spill)
            out_q, out_id, out_cos = [], [], []
            for j in range(len(Q_)):
                m = np.isin(assign, probe_[j]).any(axis=1) & (ids != qids[j])
                if not m.any():
                    continue
                s = E[m] @ Q_[j]
                idsj = ids[m]
                if len(s) > k:
                    part = np.argpartition(-s, k)[:k]
                    s, idsj = s[part], idsj[part]
                out_q.append(np.full(len(s), qids[j]))
                out_id.append(idsj)
                out_cos.append(s)
            if not out_q:
                return pa.table(
                    {"query_id": pa.array([], type=pa.int64()),
                     id_col: pa.array([], type=pa.int64()),
                     "cos": pa.array([], type=pa.float64())}
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                    id_col: pa.array(np.concatenate(out_id), type=pa.int64()),
                    "cos": pa.array(np.concatenate(out_cos)),
                }
            )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", id_col], ascending=[False, True], kind="stable").head(k)
        g["cos"] = g["cos"].round(4)
        return g

    return (
        ds.map_batches(probed_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "cos", id_col], ascending=[True, False, True])
        .reset_index(drop=True)
    )
