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


def add_bucket(
    ds: ray.data.Dataset, keys: list[str], n_buckets: int, col: str = "_bucket"
) -> ray.data.Dataset:
    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(batch), dtype=np.uint64)
        for k in keys:
            h ^= pd.util.hash_array(
                batch[k].to_numpy(), hash_key=_HASH_KEY
            ) * np.uint64(0x9E3779B97F4A7C15)
        batch[col] = (h % np.uint64(n_buckets)).astype(np.int64)
        return batch

    return ds.map_batches(bucketize, batch_format="pandas")


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
