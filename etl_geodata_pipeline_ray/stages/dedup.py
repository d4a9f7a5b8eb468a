"""Deduplication family for training-data pipelines (SURVEY §2.7 scaled
up): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Scale shapes:
  * exact      — dual 64-bit content-hash in ``map_batches``, shuffle
                 ONLY (hash, hash2, id) triples through one bucketed
                 keep-min election, semi-join winners back (the
                 reference's D1 set-dedup shape,
                 ``utils/h3_helpers.py:64-75``).
  * MinHash    — per-batch vectorized shingle→signature (Broder 1997),
                 explode to (band, band_hash, doc_id) rows, one
                 bucketed shuffle to propose candidate pairs
                 (C-level all-pairs per bucket, capped), distributed
                 pair dedup, then DISTRIBUTED exact-Jaccard
                 verification (shuffle_join pairs back to texts) and
                 Dataset-resident connected components — no driver
                 gather anywhere on the default path.
  * SimHash    — 64-bit sign-sum sketch (Charikar 2002), banded into
                 4×16-bit exact-match buckets; verification is one
                 vectorized XOR + unpackbits popcount per bucket.
  * embedding  — banded random-hyperplane LSH (OR-construction
                 auto-tuned from the threshold), distributed dedup +
                 shuffle_join back to vectors, vectorized cosine
                 verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_HASH_KEY = "graftdedup-hash0"


def exact_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Keep the min-id row per byte-identical ``text_col`` (D1; the
    reference's set-dedup shape, ``utils/h3_helpers.py:64-75``).

    Scale shape (100-TB posture):

    1. **hash pass** — two independent vectorized 64-bit content hashes
       per row (128 bits total: distinct texts colliding on both keys
       need ~2^64 documents, far beyond any corpus), projected down to
       ``(_h, _h2, id)`` so the wide text column never leaves the scan;
    2. **winner election** — a within-batch keep-min combiner shrinks
       the exchange to distinct-texts-per-batch, then ONE bucketed
       shuffle of the 24-byte triples with a single C-level
       ``duplicated`` kernel per bucket (``bucketed_apply`` — never one
       pandas call per distinct hash);
    3. **semi-join** the winning ids back to the full corpus via
       ``planned_semi_anti_join`` (broadcast when the winner set is
       known-small, distributed shuffle-semi otherwise).
    """
    _HK2 = "graftdedup-hash1"

    def hash_project(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].to_numpy(dtype=object)
        out = pd.DataFrame(
            {
                "_h": pd.util.hash_array(texts, hash_key=_HASH_KEY).astype(np.int64),
                "_h2": pd.util.hash_array(texts, hash_key=_HK2).astype(np.int64),
                id_col: batch[id_col].to_numpy(),
            }
        )
        # combiner: keep the min id per (h, h2) WITHIN the batch so the
        # shuffle carries at most one triple per distinct batch text
        out = out.sort_values(["_h", "_h2", id_col], kind="stable")
        return out[~out.duplicated(["_h", "_h2"])]

    def elect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", "_h2", id_col], kind="stable")
        return g[~g.duplicated(["_h", "_h2"])][[id_col]]

    from .bucketed import bucketed_apply
    from .relational import planned_semi_anti_join

    # canonicalize to Arrow blocks so the schema probe yields pyarrow
    # types (from_pandas-backed datasets report numpy dtypes)
    ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
    slim = ds.map_batches(hash_project, batch_format="pandas")
    winners = bucketed_apply(slim, ["_h"], elect, n_buckets=n_buckets)

    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        left_schema = base
    else:
        left_schema = pa.schema(
            [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
        )
    right_schema = pa.schema([left_schema.field(id_col)])
    return planned_semi_anti_join(
        ds,
        winners,
        id_col,
        id_col,
        n_buckets=n_buckets,
        left_schema=left_schema,
        right_schema=right_schema,
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
        # fully vectorized batch path: shingle strings for ALL docs are
        # hashed in one pass, affine-permuted as one (n_shingles, 128)
        # matrix, and per-doc minima come from one minimum.reduceat —
        # no per-doc numpy round trips (round-1 verdict residue #7).
        texts = batch["text"].tolist()
        shingles: list[str] = []
        offsets = np.empty(len(texts), dtype=np.int64)
        k = self.shingle_k
        for i, t in enumerate(texts):
            offsets[i] = len(shingles)
            toks = t.split()
            if len(toks) < k:
                shingles.append(" ".join(toks) if toks else "")
            else:
                shingles.extend(
                    " ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)
                )
        h = pd.util.hash_array(np.array(shingles, dtype=object), hash_key=_HASH_KEY)
        # chunk along doc boundaries so the (n_shingles, num_perm)
        # intermediate stays ~64 MB regardless of batch size
        max_shingles = max(1, (64 << 20) // (8 * self.num_perm))
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        lo_doc = 0
        with np.errstate(over="ignore"):
            while lo_doc < len(texts):
                hi_doc = lo_doc + 1
                end = len(h) if hi_doc >= len(texts) else offsets[hi_doc]
                while (
                    hi_doc < len(texts)
                    and (len(h) if hi_doc + 1 >= len(texts) else offsets[hi_doc + 1])
                    - offsets[lo_doc]
                    <= max_shingles
                ):
                    hi_doc += 1
                start = offsets[lo_doc]
                end = len(h) if hi_doc >= len(texts) else offsets[hi_doc]
                vals = h[start:end, None] * self.a[None, :] + self.b[None, :]
                sigs[lo_doc:hi_doc] = np.minimum.reduceat(
                    vals, offsets[lo_doc:hi_doc] - start, axis=0
                )
                lo_doc = hi_doc
        batch["_sig"] = list(sigs.astype(np.int64))
        return batch


def _band_rows(
    batch: pd.DataFrame, num_bands: int, rows_per_band: int, id_col: str
) -> pd.DataFrame:
    """Explode signatures into (band, band_hash, id, sig) rows."""
    if len(batch) == 0:  # np.stack raises on an empty block
        return pd.DataFrame({
            "band": pd.Series([], dtype="int64"),
            "band_hash": pd.Series([], dtype="int64"),
            id_col: pd.Series([], dtype="int64"),
        })
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


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame(
        {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
    )


def _pairs_from_buckets(
    df: pd.DataFrame, key_cols: list[str], id_col: str, cap: int = 256
) -> pd.DataFrame:
    """All (a < b) pairs within each bucket group, fully C-level: a
    pandas self-merge for groups ≤ ``cap`` members; oversized buckets
    are chunked TWICE — once at offsets 0, cap, 2·cap … and once
    half-shifted at cap/2, 3·cap/2 … — and pairs are expanded within
    each chunk of both passes. Every pair at sorted-id distance
    ≤ cap/2 co-resides in some chunk of at least one pass, so adjacent
    ids are ALWAYS proposed and chunk-to-chunk connectivity rides on
    many overlapping pairs, never on a single boundary element whose
    verification failure would split a component. Cost is bounded at
    ~n·cap pairs per oversized bucket (vs n²/2 unbounded); pairs
    beyond distance cap are dropped. A warning counts the affected
    rows so the recall limit is visible."""
    df = df[key_cols + [id_col]].drop_duplicates()
    sizes = df.groupby(key_cols)[id_col].transform("size")
    small = df[(sizes >= 2) & (sizes <= cap)]
    big = df[sizes > cap]
    outs = []
    if len(small):
        m = small.merge(small, on=key_cols)
        xa, xb = m[id_col + "_x"].to_numpy(), m[id_col + "_y"].to_numpy()
        keep = xa < xb
        outs.append(pd.DataFrame({"a": xa[keep], "b": xb[keep]}))
    if len(big):
        import logging

        logging.getLogger(__name__).warning(
            "_pairs_from_buckets: %d rows fall in buckets larger than cap=%d; "
            "within those buckets all pairs at sorted-id distance <= cap/2 "
            "(and some up to cap) are proposed via two half-shifted chunk "
            "passes; farther pairs are dropped (bounded sub-quadratic "
            "expansion)",
            len(big),
            cap,
        )
        b = big.sort_values(key_cols + [id_col], kind="stable")
        pos = b.groupby(key_cols).cumcount().to_numpy()
        for off in (0, cap // 2):
            bo = b.copy()
            bo["_chunk"] = (pos + off) // cap
            m = bo.merge(bo, on=key_cols + ["_chunk"])
            xa, xb = m[id_col + "_x"].to_numpy(), m[id_col + "_y"].to_numpy()
            keep = xa < xb
            outs.append(pd.DataFrame({"a": xa[keep], "b": xb[keep]}))
    if not outs:
        return _empty_pairs()
    out = pd.concat(outs, ignore_index=True).drop_duplicates()
    return out.astype({"a": np.int64, "b": np.int64})


def minhash_candidate_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    num_perm: int = 128,
    num_bands: int = 32,
    bucket_cap: int = 256,
    n_buckets: int = 32,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """Distributed LSH candidate generation: signatures → band rows →
    one bucketed shuffle on (band, band_hash) with a vectorized
    all-pairs kernel → one bucketed dedup shuffle on (a, b). Nothing
    touches the driver."""
    from .bucketed import bucketed_apply

    rows_per_band = num_perm // num_bands
    sigs_ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pandas",
        concurrency=(1, 8),
    )
    band_ds = sigs_ds.map_batches(
        lambda b: _band_rows(b, num_bands, rows_per_band, id_col), batch_format="pandas"
    )
    pairs = bucketed_apply(
        band_ds,
        ["band", "band_hash"],
        lambda g: _pairs_from_buckets(g, ["band", "band_hash"], id_col, cap=bucket_cap),
        n_buckets=n_buckets,
    )
    return bucketed_apply(
        pairs, ["a", "b"], lambda g: g.drop_duplicates(), n_buckets=n_buckets
    )


def _shingle_set(text: str, k: int) -> set:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else {""}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def minhash_near_dup_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    bucket_cap: int = 256,
) -> ray.data.Dataset:
    """Near-duplicate pairs with EXACT word-shingle Jaccard ≥
    threshold: LSH banding proposes candidates (distributed), then the
    candidate pairs are joined back to their texts with two
    ``shuffle_join`` passes and verified with one O(doc_len) set kernel
    per pair — verification is distributed over batches, never a
    driver loop. Returns a Dataset of (a, b, jaccard)."""
    from .relational import shuffle_join, shuffle_join_schema

    docs = ds.select_columns([id_col, text_col])
    # the SAME shingle_k drives both the LSH signatures and the exact
    # verification below — a mismatch silently degrades recall
    pairs = minhash_candidate_pairs(
        ds, id_col=id_col, num_perm=num_perm, num_bands=num_bands,
        shingle_k=shingle_k, bucket_cap=bucket_cap,
    )
    pairs_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    docs_schema = pa.schema([(id_col, pa.int64()), (text_col, pa.string())])
    j1 = shuffle_join(
        pairs, docs, on=["a"], right_on=[id_col], suffix="_a",
        left_schema=pairs_schema, right_schema=docs_schema,
    )
    j1_schema = shuffle_join_schema(pairs_schema, docs_schema, ["a"], [id_col], "_a")
    j2 = shuffle_join(
        j1, docs, on=["b"], right_on=[id_col], suffix="_b",
        left_schema=j1_schema, right_schema=docs_schema,
    )
    tcol_a, tcol_b = text_col, text_col + "_b"

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        # memoize shingle sets per doc id: a doc appearing in many
        # candidate pairs is shingled once per batch, not once per pair
        cache: dict = {}

        def sh(doc_id, text):
            s = cache.get(doc_id)
            if s is None:
                s = cache[doc_id] = _shingle_set(text, shingle_k)
            return s

        out_a, out_b, js = [], [], []
        for a, b, x, y in zip(batch["a"], batch["b"], batch[tcol_a], batch[tcol_b]):
            sa, sb = sh(a, x), sh(b, y)
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= threshold:
                out_a.append(a), out_b.append(b), js.append(round(jac, 4))
        return pd.DataFrame(
            {
                "a": pd.Series(out_a, dtype=np.int64),
                "b": pd.Series(out_b, dtype=np.int64),
                "jaccard": pd.Series(js, dtype=np.float64),
            }
        )

    return j2.map_batches(verify, batch_format="pandas")


def minhash_dedup_groups(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 128,
    num_bands: int = 32,
    distributed_cc: bool = True,
) -> ray.data.Dataset:
    """DATASET of (id, group) for every doc in a near-duplicate
    cluster; group = min id of the connected component over
    exact-Jaccard-verified edges. Default path is fully distributed
    (Dataset-resident min-label propagation, ``stages/graph.py``) and
    stays Dataset-resident end to end — sink with ``write_groups_lake``
    at scale; ``distributed_cc=False`` keeps a driver union-find
    shortcut for tiny graphs (its result is re-wrapped as a Dataset for
    a uniform return type)."""
    pairs_ds = minhash_near_dup_pairs(
        ds, id_col=id_col, threshold=threshold, num_perm=num_perm, num_bands=num_bands
    )
    if distributed_cc:
        from .graph import connected_components

        cc = connected_components(pairs_ds)
        return cc.map_batches(
            lambda t: t.rename(columns={"node": id_col, "component": "group"}),
            batch_format="pandas",
        )

    pairs = pairs_ds.to_pandas()
    if not len(pairs):
        return ray.data.from_pandas(
            pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64), "group": pd.Series([], dtype=np.int64)}
            )
        )
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(pairs["a"], pairs["b"]):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    rows = [(x, find(x)) for x in parent]
    out = pd.DataFrame(rows, columns=[id_col, "group"]).astype(np.int64)
    return ray.data.from_pandas(out.sort_values(id_col).reset_index(drop=True))


def write_groups_lake(
    groups: ray.data.Dataset,
    path: str,
    key_col: str = "group",
    n_partitions: int = 16,
) -> None:
    """Lake sink for dedup/cluster outputs: partitioned Parquet keyed
    by ``key_col % n_partitions`` so a failed run can re-emit
    per-partition and readers can prune — the cluster analog of the
    replay lake's shard layout (never one giant file, never a driver
    gather). The partition column is named ``part`` (no underscore
    prefix: Arrow dataset discovery skips ``_``-prefixed paths as
    hidden metadata)."""

    def part(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        t["part"] = (t[key_col].to_numpy().astype(np.uint64) % np.uint64(n_partitions)).astype(
            np.int64
        )
        return t

    groups.map_batches(part, batch_format="pandas").write_parquet(
        path, partition_cols=["part"]
    )


# ------------------------------------------------------------ SimHash
class SimHasher:
    """64-bit SimHash (Charikar 2002): sign of the weighted sum of
    token-hash bit vectors, vectorized per doc.

    ``hash_fn="fast"`` (default) uses pandas' vectorized hash;
    ``hash_fn="md5"`` uses the little-endian first 8 md5 bytes per
    token — bit-for-bit reproducible in DuckDB as
    ``md5_number_upper(token)``, which is what makes q26's brute-force
    SQL oracle possible."""

    def __init__(self, text_col: str = "text", output: str = "simhash",
                 hash_fn: str = "fast"):
        self.text_col = text_col
        self.output = output
        self.hash_fn = hash_fn

    def _token_hashes(self, toks: list[str]) -> np.ndarray:
        if self.hash_fn == "md5":
            import hashlib

            return np.array(
                [
                    int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
                    for w in toks
                ],
                dtype=np.uint64,
            )
        return pd.util.hash_array(np.array(toks, dtype=object), hash_key=_HASH_KEY)

    def _doc(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        h = self._token_hashes(toks)
        # explicit (h >> b) & 1 bit order — matches the SQL oracle
        bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        score = bits.astype(np.int64).sum(axis=0) * 2 - len(h)  # ±1 vote per bit
        with np.errstate(over="ignore"):
            val = (
                (score > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)
            ).sum(dtype=np.uint64)
        return int(val)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized batch path: all docs' tokens hashed in one pass,
        # per-bit ±1 votes summed per doc with one add.reduceat —
        # bit-identical to the per-doc _doc() path
        texts = batch[self.text_col].tolist()
        toks_all: list[str] = []
        offsets = np.empty(len(texts), dtype=np.int64)
        counts = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            offsets[i] = len(toks_all)
            toks = t.split()
            counts[i] = len(toks)
            toks_all.extend(toks)
        if not toks_all:
            batch[self.output] = np.zeros(len(texts), dtype=np.int64)
            return batch
        h = self._token_hashes(toks_all)
        bits = (
            (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        ).astype(np.int64)
        # empty docs have offset == len(h); a zero sentinel row keeps
        # every offset a valid reduceat index WITHOUT clamping into the
        # preceding doc's slice (clamping dropped that doc's final
        # token row — trailing-empty-doc batches hashed wrong)
        bits = np.vstack([bits, np.zeros((1, 64), dtype=np.int64)])
        sums = np.add.reduceat(bits, offsets, axis=0)
        # reduceat with duplicate offsets (consecutive empty docs)
        # returns the single row at that offset — masked below
        score = sums * 2 - counts[:, None]
        with np.errstate(over="ignore"):
            vals = (
                (score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
            ).sum(axis=1, dtype=np.uint64)
        vals[counts == 0] = np.uint64(0)
        batch[self.output] = vals.astype(np.int64)
        return batch


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount: uint8 view → unpackbits → row sum."""
    return np.unpackbits(x.astype(np.uint64).view(np.uint8).reshape(len(x), 8), axis=1).sum(
        axis=1
    )


def simhash_near_dupes(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bucket_cap: int = 512,
    n_buckets: int = 32,
    hash_fn: str = "fast",
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: band the 64 bits into 4×16-bit keys
    (any pair within Hamming ≤3 of each other shares ≥1 exact band),
    one bucketed shuffle over (band, key), then fully vectorized
    verification: C-level self-merge pair expansion (bucket size capped
    at ``bucket_cap``), XOR, and an unpackbits popcount — no per-pair
    Python loop. Returns a DATASET of (a, b, hamming), deduped across
    bands by one more bucketed shuffle — pair sets are unbounded on
    duplicate-heavy corpora, so nothing here gathers to the driver."""
    from .bucketed import bucketed_apply

    hashed = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"hash_fn": hash_fn},
        batch_format="pandas",
        concurrency=(1, 8),
    )

    def bands(b: pd.DataFrame) -> pd.DataFrame:
        h = b["simhash"].to_numpy().astype(np.uint64)
        out = []
        for i in range(4):
            key = ((h >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(
                pd.DataFrame({"band": i, "key": key, id_col: b[id_col], "simhash": b["simhash"]})
            )
        return pd.concat(out, ignore_index=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        pairs = _pairs_from_buckets(g, ["band", "key"], id_col, cap=bucket_cap)
        if not len(pairs):
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in ("a", "b", "hamming")})
        sh = g.drop_duplicates(id_col).set_index(id_col)["simhash"]
        ha = sh.loc[pairs["a"]].to_numpy().astype(np.uint64)
        hb = sh.loc[pairs["b"]].to_numpy().astype(np.uint64)
        d = _popcount64(ha ^ hb)
        keep = d <= max_hamming
        return pd.DataFrame(
            {
                "a": pairs["a"].to_numpy()[keep],
                "b": pairs["b"].to_numpy()[keep],
                "hamming": d[keep].astype(np.int64),
            }
        )

    pairs = bucketed_apply(
        hashed.map_batches(bands, batch_format="pandas"),
        ["band", "key"],
        verify,
        n_buckets=n_buckets,
    )
    # the same pair can surface from multiple bands — dedup stays
    # distributed (hash-bucketed on the pair key), mirroring the
    # MinHash path instead of a driver-side drop_duplicates
    return bucketed_apply(
        pairs,
        ["a", "b"],
        lambda g: g.drop_duplicates(["a", "b"]),
        n_buckets=n_buckets,
    )


# ----------------------------------------------------- n-gram Jaccard
def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_cap: int = 2048,
) -> ray.data.Dataset:
    """Exact word-n-gram Jaccard similarity for all pairs WITHIN a
    blocking key (e.g. language) — the exact counterpart MinHash
    approximates; quadratic per block by construction. Blocks larger
    than ``block_cap`` are NOT expanded all-pairs (one
    block-is-all-English-docs call would be O(n²) in a single task):
    they fall back to two half-shifted chunkings of ``block_cap``
    consecutive ids (bounded ~n·cap pair cost) — every pair at
    sorted-id distance ≤ cap/2 is compared in some chunk, so adjacent
    ids always get their exact Jaccard and connectivity never depends
    on a single boundary element — with a loud warning counting the
    dropped farther comparisons. Use MinHash (the documented default)
    when blocks can be unbounded. Returns a DATASET of
    (a, b, jaccard)."""

    def block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)  # canonical a < b pair order
        chunks: list[pd.DataFrame]
        if len(g) > block_cap:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: block of %d rows exceeds block_cap=%d; "
                "all pairs within sorted-id distance <= cap/2 (and some up "
                "to cap) are compared via two half-shifted chunk passes "
                "(exact all-pairs needs bounded blocks — use MinHash instead)",
                len(g),
                block_cap,
            )
            chunks = [
                g.iloc[s : s + block_cap]
                for s in range(0, len(g) - 1, block_cap)
            ] + [
                g.iloc[s : s + block_cap]
                for s in range(block_cap // 2, len(g) - 1, block_cap)
            ]
        else:
            chunks = [g]
        xa, xb, js = [], [], []
        for ch in chunks:
            texts = ch[text_col].tolist()
            ids = ch[id_col].to_numpy()
            sets = []
            for t in texts:
                toks = t.split()
                sets.append(
                    {" ".join(toks[i : i + n]) for i in range(max(1, len(toks) - n + 1))}
                )
            for i in range(len(sets)):
                for j in range(i + 1, len(sets)):
                    inter = len(sets[i] & sets[j])
                    if not inter:
                        continue
                    jac = inter / len(sets[i] | sets[j])
                    if jac >= threshold:
                        xa.append(ids[i]), xb.append(ids[j]), js.append(round(jac, 4))
        out = pd.DataFrame({"a": xa, "b": xb, "jaccard": js})
        return out.drop_duplicates(["a", "b"])  # chunk-overlap rows repeat

    return ds.groupby(block_col).map_groups(block, batch_format="pandas")


# ------------------------------------------------- embedding near-dup
def _lsh_banding(threshold: float, target_recall: float = 0.999) -> tuple[int, int]:
    """Pick (planes_per_band r, num_bands B) for random-hyperplane LSH
    so a pair at exactly ``threshold`` cosine co-buckets in ≥1 band
    with probability ≥ target_recall. p = 1 - θ/π per plane; r sized
    so p^r ≈ 0.3 (keeps buckets selective), B = OR-construction count."""
    p = 1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
    r = max(2, int(round(np.log(0.3) / np.log(p))))
    miss = 1.0 - p**r
    B = max(4, int(np.ceil(np.log(1.0 - target_recall) / np.log(miss))))
    return r, B


def embedding_near_dupes(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    num_planes: int | None = None,
    num_bands: int | None = None,
    seed: int = 13,
    bucket_cap: int = 512,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Cosine near-duplicate pairs via BANDED random-hyperplane LSH
    (OR-construction over ``num_bands`` bands of ``num_planes`` sign
    bits — auto-tuned from the threshold so recall at the threshold is
    ≥ 0.999, fixing the round-1 all-8-planes-must-agree recall
    collapse). Candidates are deduped distributed, joined back to their
    embeddings with shuffle_join, and verified with one vectorized
    cosine kernel per batch. Returns a Dataset of (a, b, cos)."""
    from .bucketed import bucketed_apply
    from .relational import shuffle_join

    if num_planes is None or num_bands is None:
        num_planes, num_bands = _lsh_banding(threshold)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes * num_bands))
    import ray as _ray

    ref = _ray.put(planes)
    # exact bit weights are only collision-free up to 63 planes —
    # (1 << 64) wraps to 0 in int64, silently zeroing every plane past
    # the 63rd (high-threshold bandings auto-tune to r > 63). Beyond
    # that, mix the packed sign bits into a 64-bit key: collisions are
    # ~2^-64 and only ADD candidates (exact verification filters them).
    weights = (
        (1 << np.arange(num_planes)).astype(np.int64)
        if num_planes <= 63
        else None
    )

    def _bits_key(chunk: np.ndarray) -> np.ndarray:
        packed = np.packbits(chunk, axis=1)
        pad = (-packed.shape[1]) % 8
        if pad:
            packed = np.pad(packed, ((0, 0), (0, pad)))
        words = packed.view(np.uint64).reshape(len(packed), -1)
        key = np.zeros(len(packed), dtype=np.uint64)
        for wcol in words.T:
            key = key * np.uint64(0x100000001B3) ^ wcol
        return key.astype(np.int64)

    def band_rows(b: pa.Table) -> pd.DataFrame:
        from .similarity import _to_matrix

        P = _ray.get(ref)
        emb = _to_matrix(b[emb_col], dim)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        signs = (emb @ P) > 0  # (n, r*B)
        ids = np.asarray(b[id_col])
        out = []
        for band in range(num_bands):
            chunk = signs[:, band * num_planes : (band + 1) * num_planes]
            key = chunk @ weights if weights is not None else _bits_key(chunk)
            out.append(pd.DataFrame({"band": band, "key": key, id_col: ids}))
        return pd.concat(out, ignore_index=True)

    cand = bucketed_apply(
        ds.map_batches(band_rows, batch_format="pyarrow"),
        ["band", "key"],
        lambda g: _pairs_from_buckets(g, ["band", "key"], id_col, cap=bucket_cap),
        n_buckets=n_buckets,
    )
    pairs = bucketed_apply(
        cand, ["a", "b"], lambda g: g.drop_duplicates(), n_buckets=n_buckets
    )

    # ship embeddings as raw float64 bytes: plain binary survives the
    # shuffle/merge machinery (tensor-extension columns do not)
    def to_bin(t: pa.Table) -> pa.Table:
        from .similarity import _to_matrix

        E = _to_matrix(t[emb_col], dim)
        return pa.table(
            {id_col: t[id_col], "_embbin": pa.array([e.tobytes() for e in E], type=pa.binary())}
        )

    embs = ds.map_batches(to_bin, batch_format="pyarrow")
    from .relational import shuffle_join_schema

    pairs_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    embs_schema = pa.schema([(id_col, pa.int64()), ("_embbin", pa.binary())])
    j1 = shuffle_join(
        pairs, embs, on=["a"], right_on=[id_col], suffix="_a",
        left_schema=pairs_schema, right_schema=embs_schema,
    )
    j1_schema = shuffle_join_schema(pairs_schema, embs_schema, ["a"], [id_col], "_a")
    j2 = shuffle_join(
        j1, embs, on=["b"], right_on=[id_col], suffix="_b",
        left_schema=j1_schema, right_schema=embs_schema,
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype="int64"),
                    "b": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        Ea = np.frombuffer(b"".join(batch["_embbin"]), dtype=np.float64).reshape(-1, dim)
        Eb = np.frombuffer(b"".join(batch["_embbin_b"]), dtype=np.float64).reshape(-1, dim)
        cos = (Ea * Eb).sum(axis=1) / (
            np.linalg.norm(Ea, axis=1) * np.linalg.norm(Eb, axis=1)
        )
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "a": batch["a"].to_numpy()[keep].astype(np.int64),
                "b": batch["b"].to_numpy()[keep].astype(np.int64),
                "cos": np.round(cos[keep], 4),
            }
        )

    return j2.map_batches(verify, batch_format="pandas")
