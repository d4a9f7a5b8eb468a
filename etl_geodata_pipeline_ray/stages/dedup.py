"""Deduplication family for training-data pipelines (SURVEY §2.7 scaled
up): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Scale shapes:
  * exact      — content-hash in ``map_batches`` → hash-partitioned
                 groupby keep-first (the reference's D1 set-dedup shape,
                 ``utils/h3_helpers.py:64-75``).
  * MinHash    — per-batch vectorized shingle→signature (Broder 1997),
                 explode to (band, band_hash, doc_id) rows, bucket
                 groupby; candidate verification from signatures; the
                 candidate graph is assumed ≪ corpus and resolved with
                 driver-side union-find (documented assumption — at
                 100 TB swap in iterative min-label propagation).
  * SimHash    — 64-bit sign-sum sketch (Charikar 2002), banded into
                 4×16-bit exact-match buckets, Hamming-verified.
  * embedding  — random-hyperplane LSH buckets then within-bucket
                 cosine (exact within bucket; brute-force fallback).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_HASH_KEY = "graftdedup-hash0"


def _hash_texts(texts: pd.Series) -> np.ndarray:
    return pd.util.hash_array(texts.to_numpy(dtype=object), hash_key=_HASH_KEY)


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the min-id row per byte-identical ``text_col``. The shuffle
    moves only (hash, id) after a vectorized content-hash pass; ties on
    hash are resolved by comparing the texts inside the group."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_h"] = _hash_texts(batch[text_col]).astype(np.int64)
        return batch

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([text_col, id_col], kind="stable")
        return g[~g[text_col].duplicated()].drop(columns=["_h"])

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("_h")
        .map_groups(keep_first, batch_format="pandas")
    )


# ------------------------------------------------------------ MinHash
class MinHasher:
    """Vectorized word-shingle MinHash signatures (one actor-held
    permutation table; Broder 1997 'On the resemblance and containment
    of documents')."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.a = rng.integers(1, 2**61 - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**61 - 1, size=num_perm, dtype=np.uint64)

    def shingle_hashes(self, text: str) -> np.ndarray:
        toks = text.split()
        k = self.shingle_k
        if len(toks) < k:
            sh = [" ".join(toks)] if toks else [""]
        else:
            sh = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        return pd.util.hash_array(np.array(sh, dtype=object), hash_key=_HASH_KEY)

    def signature(self, text: str) -> np.ndarray:
        h = self.shingle_hashes(text)
        with np.errstate(over="ignore"):
            vals = h[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            sigs = [self.signature(t) for t in batch["text"]]
        batch["_sig"] = [s.astype(np.int64) for s in sigs]
        return batch


def _band_rows(
    batch: pd.DataFrame, num_bands: int, rows_per_band: int, id_col: str
) -> pd.DataFrame:
    """Explode signatures into (band, band_hash, id, sig) rows."""
    sig = np.stack(batch["_sig"].to_numpy())
    n = len(batch)
    out_band, out_hash, out_id = [], [], []
    ids = batch[id_col].to_numpy()
    for bnd in range(num_bands):
        chunk = sig[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
        with np.errstate(over="ignore"):
            bh = chunk.astype(np.uint64).sum(axis=1) * np.uint64(0x9E3779B97F4A7C15)
            bh = (bh ^ (bh >> np.uint64(31))).astype(np.int64)
        out_band.append(np.full(n, bnd)), out_hash.append(bh), out_id.append(ids)
    return pd.DataFrame(
        {
            "band": np.concatenate(out_band),
            "band_hash": np.concatenate(out_hash),
            id_col: np.concatenate(out_id),
        }
    )


def minhash_candidates(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    num_perm: int = 128,
    num_bands: int = 32,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (signatures, candidate_pairs) — signatures as a small
    driver frame for verification. Candidate discovery is fully
    distributed; only candidates + their signatures come to the driver."""
    rows_per_band = num_perm // num_bands
    sigs_ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm},
        batch_format="pandas",
        concurrency=(1, 8),
    )

    band_ds = sigs_ds.map_batches(
        lambda b: _band_rows(b, num_bands, rows_per_band, id_col), batch_format="pandas"
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        # pair every member with the bucket min — enough to connect the
        # component without quadratic pair emission
        return pd.DataFrame({"a": np.full(len(ids) - 1, ids[0]), "b": ids[1:]})

    pairs = (
        band_ds.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if len(pairs):
        cand_ids = np.unique(np.concatenate([pairs["a"], pairs["b"]]))
        import ray as _ray

        ref = _ray.put(set(cand_ids.tolist()))

        def only_cands(b: pd.DataFrame) -> pd.DataFrame:
            s = _ray.get(ref)
            return b[b[id_col].isin(s)][[id_col, "_sig"]]

        sigs = sigs_ds.map_batches(only_cands, batch_format="pandas").to_pandas()
    else:
        sigs = pd.DataFrame({id_col: [], "_sig": []})
    return sigs, pairs


def minhash_dedup_groups(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 128,
    num_bands: int = 32,
    distributed_cc: bool = False,
) -> pd.DataFrame:
    """(id, group) for every doc in a near-duplicate cluster; group =
    min id of the connected component (signature-estimated Jaccard ≥
    threshold edges)."""
    sigs, pairs = minhash_candidates(ds, id_col, num_perm, num_bands)
    if not len(pairs):
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64), "group": pd.Series([], dtype=np.int64)})
    sig_map = dict(zip(sigs[id_col].to_numpy(), sigs["_sig"].to_numpy()))
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    keep = []
    for x, y in zip(a, b):
        sx, sy = sig_map.get(x), sig_map.get(y)
        if sx is None or sy is None:
            continue
        jac = float(np.mean(np.asarray(sx) == np.asarray(sy)))
        if jac >= threshold:
            keep.append((x, y))
    if distributed_cc and keep:
        # scale path: iterative min-label propagation (stages/graph.py)
        from .graph import connected_components

        cc = connected_components(pd.DataFrame(keep, columns=["a", "b"]))
        return cc.rename(columns={"node": id_col, "component": "group"}).astype(np.int64)

    # union-find over verified edges (candidate set ≪ corpus)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in keep:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    rows = [(x, find(x)) for x in parent]
    out = pd.DataFrame(rows, columns=[id_col, "group"]).astype(np.int64)
    return out.sort_values(id_col).reset_index(drop=True)


# ------------------------------------------------------------ SimHash
class SimHasher:
    """64-bit SimHash (Charikar 2002): sign of the weighted sum of
    token-hash bit vectors. Vectorized per doc via numpy unpackbits."""

    def __init__(self, text_col: str = "text", output: str = "simhash"):
        self.text_col = text_col
        self.output = output

    def _doc(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        h = pd.util.hash_array(np.array(toks, dtype=object), hash_key=_HASH_KEY)
        bits = np.unpackbits(h.view(np.uint8).reshape(len(h), 8), axis=1)
        score = bits.sum(axis=0) * 2 - len(h)  # (+1/-1 vote per bit)
        out = np.packbits((score > 0).astype(np.uint8))
        return int(out.view(np.uint64)[0])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.output] = np.array(
            [self._doc(t) for t in batch[self.text_col]], dtype=np.uint64
        ).astype(np.int64)
        return batch


def simhash_near_dupes(
    ds: ray.data.Dataset, id_col: str = "doc_id", max_hamming: int = 3
) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band the 64 bits into 4×16-bit keys
    (any pair within Hamming ≤3 of each other shares ≥1 exact band),
    bucket-groupby, verify Hamming distance inside the bucket."""
    hashed = ds.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 8))

    def bands(b: pd.DataFrame) -> pd.DataFrame:
        h = b["simhash"].to_numpy().astype(np.uint64)
        out = []
        for i in range(4):
            key = ((h >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(pd.DataFrame({"band": i, "key": key, id_col: b[id_col], "simhash": b["simhash"]}))
        return pd.concat(out, ignore_index=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(np.int64)
        g = g.sort_values(id_col)
        h = g["simhash"].to_numpy().astype(np.uint64)
        ids = g[id_col].to_numpy()
        xa, xb, hd = [], [], []
        for i in range(len(g)):
            x = h[i] ^ h[i + 1 :]
            d = np.array([bin(int(v)).count("1") for v in x])
            m = d <= max_hamming
            xa.extend([ids[i]] * int(m.sum()))
            xb.extend(ids[i + 1 :][m].tolist())
            hd.extend(d[m].tolist())
        return pd.DataFrame({"a": xa, "b": xb, "hamming": hd}).astype(np.int64)

    pairs = (
        hashed.map_batches(bands, batch_format="pandas")
        .groupby(["band", "key"])
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if "a" not in pairs.columns:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("a", "b", "hamming")}
        )
    return pairs.drop_duplicates(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)


# ----------------------------------------------------- n-gram Jaccard
def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """Exact word-n-gram Jaccard similarity for all pairs WITHIN a
    blocking key (e.g. language) — the exact counterpart MinHash
    approximates; quadratic per block, so blocks must be bounded."""

    def block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)  # canonical a < b pair order
        texts = g[text_col].tolist()
        ids = g[id_col].to_numpy()
        sets = []
        for t in texts:
            toks = t.split()
            sets.append(
                {" ".join(toks[i : i + n]) for i in range(max(1, len(toks) - n + 1))}
            )
        xa, xb, js = [], [], []
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                inter = len(sets[i] & sets[j])
                if not inter:
                    continue
                jac = inter / len(sets[i] | sets[j])
                if jac >= threshold:
                    xa.append(ids[i]), xb.append(ids[j]), js.append(round(jac, 4))
        return pd.DataFrame({"a": xa, "b": xb, "jaccard": js})

    return (
        ds.groupby(block_col)
        .map_groups(block, batch_format="pandas")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


# ------------------------------------------------- embedding near-dup
def embedding_near_dupes(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 13,
) -> pd.DataFrame:
    """Cosine near-duplicate pairs via random-hyperplane LSH buckets
    (within-bucket exact cosine). ``num_planes`` hyperplanes → 2^p
    buckets; a pair must agree on every sign to co-bucket, so raise
    recall by lowering planes or multi-probe at scale."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))
    import ray as _ray

    ref = _ray.put(planes)

    def bucket(b: pa.Table) -> pa.Table:
        from .similarity import _to_matrix

        P = _ray.get(ref)
        emb = _to_matrix(b[emb_col], dim)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        signs = (emb @ P) > 0
        key = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: b[id_col],
                "bucket": pa.array(key),
                "_emb": pa.array(list(emb)),
            }
        )

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty()
        g = g.sort_values(id_col)
        E = np.stack(g["_emb"].to_numpy())
        ids = g[id_col].to_numpy()
        S = E @ E.T
        iu = np.triu_indices(len(g), k=1)
        m = S[iu] >= threshold
        return pd.DataFrame(
            {
                "a": ids[iu[0][m]].astype(np.int64),
                "b": ids[iu[1][m]].astype(np.int64),
                "cos": np.round(S[iu][m], 4),
            }
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if "a" not in out.columns:
        return _empty()
    return out.sort_values(["a", "b"]).reset_index(drop=True)
