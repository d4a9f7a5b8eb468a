"""Bucketed grouped execution: the scale-and-speed pattern for keyed
operators with MANY small groups.

``groupby(key).map_groups(fn)`` invokes ``fn`` once per group — fine
for dozens of groups, pathological for millions (per-call pandas
overhead dominates). Instead: hash the key into ``n_buckets`` coarse
buckets, shuffle once on the bucket, and run ONE vectorized pandas
kernel over each bucket block (the kernel uses C-level
``DataFrame.groupby`` / ``duplicated`` internally). Bucket count is the
parallelism knob; key skew within a bucket is bounded by the hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

_HASH_KEY = "graftbucket-hash"


def key_hash(t, key_cols: list[str], hash_key: str = _HASH_KEY) -> np.ndarray:
    """Dtype-stable composite key hash (uint64 per row) — THE bucket
    hash kernel, shared by ``add_bucket`` and ``shuffle_join``. Hashes
    from the ARROW column type, never the raw pandas values: an int64
    column whose null-bearing blocks drift to float64 would otherwise
    hash ``5`` and ``5.0`` differently and split one key across
    buckets. Integers hash via a null sentinel (numeric fast path,
    ~40x cheaper than the object hash), floats normalize ``-0.0 →
    +0.0`` (equal keys, one bucket), everything else goes through the
    canonical string cast with a null sentinel. A null key's bucket is
    arbitrary-but-consistent — per-bucket kernels still compare exact
    keys, so a sentinel collision cannot create a false match."""
    import pyarrow as pa
    import pyarrow.compute as pc

    h = np.zeros(t.num_rows, dtype=np.uint64)
    for k in key_cols:
        colv = t[k]
        if pa.types.is_integer(colv.type):
            v = (
                pc.cast(colv, pa.int64())
                .fill_null(-(2**63) + 11)
                .to_numpy(zero_copy_only=False)
            )
            hk = pd.util.hash_array(v.astype(np.int64, copy=False),
                                    hash_key=hash_key)
        elif pa.types.is_floating(colv.type):
            v = pc.cast(colv, pa.float64()).to_numpy(zero_copy_only=False)
            hk = pd.util.hash_array(v + 0.0, hash_key=hash_key)
        else:
            s = pc.cast(colv, pa.string()).fill_null("\x00null").to_numpy(
                zero_copy_only=False
            )
            hk = pd.util.hash_array(s.astype(object), hash_key=hash_key)
        h ^= hk * np.uint64(0x9E3779B97F4A7C15)
    return h


def add_bucket(
    ds: ray.data.Dataset, keys: list[str], n_buckets: int, col: str = "_bucket"
) -> ray.data.Dataset:
    """Append ``hash(keys) % n_buckets``. The hash is computed from the
    ARROW column type (dtype-stable across blocks — same rule as
    shuffle_join's bucket hash): hashing the raw pandas numpy values
    would let an int64 column whose null-bearing BLOCKS drift to
    float64 hash ``5`` and ``5.0`` differently, splitting one key
    across buckets — every bucketed kernel then emits two partial
    rows per key, silently wrong."""
    import pyarrow as pa

    def bucketize(batch: pa.Table) -> pa.Table:
        h = key_hash(batch, keys)
        # Strip schema metadata (parquet readers attach b'pandas' blobs):
        # pa.Schema.__hash__ raises on metadata, so metadata-bearing
        # blocks defeat Ray's schema-dedup fast path in the groupby
        # reduce and spam "Failed to hash the schemas" warnings.
        return batch.replace_schema_metadata(None).append_column(
            col, pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    return ds.map_batches(bucketize, batch_format="pyarrow")


def bucketed_apply(
    ds: ray.data.Dataset,
    keys: list[str],
    kernel,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Shuffle once on ``hash(keys) % n_buckets`` and run ``kernel``
    (vectorized pandas: bucket block in → result block out) per bucket.
    ``kernel`` must be correct for any subset of whole key groups."""
    bucketed = add_bucket(ds, keys, n_buckets)

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return kernel(g.drop(columns=["_bucket"]))

    return bucketed.groupby("_bucket").map_groups(run, batch_format="pandas")
