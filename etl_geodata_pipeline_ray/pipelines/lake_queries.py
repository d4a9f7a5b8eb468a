"""Query/KPI layer over the transcript LAKE table (SURVEY §7 build-plan
step 8): the reference's per-district KPI pipeline (counts, shares,
entropy, weighted composite scores from ``kpi_weights.yaml``) mapped
onto per-conversation analytics over the committed lake — proving the
aggregate/sort/join operator set against the engine's own output.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Mean, Sum

from ..cdc.replay import read_lake
from ..stages.aggregates import shannon_entropy
from ..stages.relational import broadcast_join, topk
from ..stages.text import token_count_batch

# analog of config/kpi_weights.yaml (reference weights PT .4/walk .35/
# green .25 → role weights here), loadable from configs/role_weights.yaml
DEFAULT_ROLE_WEIGHTS = {"system": 0.1, "user": 1.0, "assistant": 1.5, "tool": 0.5}


def conv_turn_counts(lake_dir: str | Path) -> pd.DataFrame:
    """Turns + token totals per conversation (A1/A2 over the lake)."""
    ds = read_lake(lake_dir, columns=["conv_id", "text"])

    def add_tokens(t: pa.Table) -> pa.Table:
        n = token_count_batch(t["text"])
        return pa.table(
            {"conv_id": t["conv_id"], "n_tokens": pa.compute.cast(n, pa.int64())}
        )

    return (
        ds.map_batches(add_tokens, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Count(alias_name="n_turns"), Sum("n_tokens", alias_name="total_tokens"))
        .to_pandas()
    )


def role_histogram(lake_dir: str | Path) -> pd.DataFrame:
    """Role distribution across the lake (A4)."""
    ds = read_lake(lake_dir, columns=["role"])
    return ds.groupby("role").aggregate(Count(alias_name="n")).to_pandas()


def conv_role_entropy(lake_dir: str | Path) -> pd.DataFrame:
    """Per-conversation Shannon entropy of roles (A5)."""
    ds = read_lake(lake_dir, columns=["conv_id", "role"])
    return shannon_entropy(ds, "conv_id", "role", output="role_entropy").to_pandas()


def longest_conversations(
    lake_dir: str | Path, k: int = 10, counts: pd.DataFrame | None = None
) -> pd.DataFrame:
    """Top-k conversations by turn count (O2). Pass a precomputed
    ``conv_turn_counts`` frame to avoid a second full lake scan."""
    if counts is None:
        counts = conv_turn_counts(lake_dir)
    return (
        counts.sort_values(["n_turns", "conv_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def conv_engagement_score(
    lake_dir: str | Path, role_weights: dict | None = None
) -> pd.DataFrame:
    """A12 composite weighted score: per conversation,
    Σ weight(role) × tokens(role) normalized to [0,1] — the
    kpi_weights.yaml shape with the weights broadcast into the
    per-batch join (J3/ST3)."""
    w = role_weights or DEFAULT_ROLE_WEIGHTS
    weights = pa.table(
        {"role": list(w.keys()), "weight": pa.array(list(w.values()), pa.float64())}
    )
    ds = read_lake(lake_dir, columns=["conv_id", "role", "text"])

    def add_tokens(t: pa.Table) -> pa.Table:
        n = token_count_batch(t["text"])
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "role": t["role"],
                "n_tokens": pa.compute.cast(n, pa.float64()),
            }
        )

    tok = ds.map_batches(add_tokens, batch_format="pyarrow")
    joined = broadcast_join(tok, weights, keys=["role"], join_type="left")

    def weighted(t: pa.Table) -> pa.Table:
        wt = pa.compute.multiply(
            pa.compute.fill_null(t["weight"], 0.0), t["n_tokens"]
        )
        return pa.table({"conv_id": t["conv_id"], "wtok": wt})

    per = (
        joined.map_batches(weighted, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Sum("wtok", alias_name="raw"))
        .to_pandas()
    )
    lo, hi = per["raw"].min(), per["raw"].max()
    per["engagement"] = ((per["raw"] - lo) / ((hi - lo) or 1.0) + 0.0).round(6)
    return per[["conv_id", "engagement"]]


def lake_kpis(lake_dir: str | Path) -> dict[str, pd.DataFrame]:
    """The full KPI bundle (reference ``compute_kpis`` analog)."""
    counts = conv_turn_counts(lake_dir)
    return {
        "turn_counts": counts,
        "role_histogram": role_histogram(lake_dir),
        "role_entropy": conv_role_entropy(lake_dir),
        "longest": longest_conversations(lake_dir, counts=counts),
        "engagement": conv_engagement_score(lake_dir),
    }
