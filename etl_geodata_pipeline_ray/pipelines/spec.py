"""Config-driven pipeline construction — the reference's strongest
idea (YAML rules + city configs drive everything:
``scripts/utils.py:44-51`` ``load_yaml``, rules format documented in
``docs/data_layers.md:272-308``, city template ``cities/_template/``)
re-expressed as a declarative step registry over Ray Data.

A pipeline spec is a YAML/dict document:

    name: categorize_parts
    steps:
      - op: read_parquet
        path: "{sf_dir}/part.parquet"
        columns: [p_partkey, p_type, p_name]
      - op: rule_categorize
        column: p_type
        rules: {budget: [ECONOMY, SMALL], premium: [PROMO, LARGE]}
      - op: groupby_agg
        keys: [category]
        aggs: [{fn: count, alias: n}]

``build(spec, **params)`` resolves ``{param}`` templates, chains the
registered step builders, and returns the lazy Dataset. New operators
plug in via ``@register_step`` — the user-extension surface (SURVEY
§2.10; reference's abstract ``BaseCityAnalysis.run_city_analysis``
hook, ``core/base_analysis.py:109-120``).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

STEP_REGISTRY: dict[str, Callable] = {}


def register_step(name: str):
    def deco(fn):
        STEP_REGISTRY[name] = fn
        return fn

    return deco


def _resolve(obj: Any, params: dict) -> Any:
    if isinstance(obj, str):
        # targeted placeholder substitution, NOT str.format: spec
        # values legitimately carry literal braces (regex patterns
        # like '[0-9]{4}'), which .format would crash on. ONE regex
        # pass, not sequential str.replace: a param VALUE containing
        # another param's '{name}' text must come out literal, never
        # double-substituted by a later iteration.
        if not params:
            return obj
        pat = re.compile(
            "\\{(" + "|".join(re.escape(k) for k in params) + ")(:[^{}]*)?\\}"
        )

        def sub(m: "re.Match[str]") -> str:
            if m.group(2):
                # '{k:03d}'-style format specs were silently passed
                # through verbatim before; refuse loudly instead
                raise ValueError(
                    f"format spec {m.group(0)!r} is not supported in "
                    f"pipeline specs — pre-format the value in params"
                )
            return str(params[m.group(1)])

        return pat.sub(sub, obj)
    if isinstance(obj, dict):
        return {k: _resolve(v, params) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_resolve(v, params) for v in obj]
    return obj


def load_spec(path: str | Path) -> dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def build(spec: dict, **params) -> ray.data.Dataset:
    """Construct the lazy Dataset pipeline described by ``spec``."""
    ds: ray.data.Dataset | None = None
    for raw_step in spec["steps"]:
        step = _resolve(dict(raw_step), params)
        op = step.pop("op")
        if op not in STEP_REGISTRY:
            raise ValueError(
                f"unknown pipeline op {op!r}; registered: {sorted(STEP_REGISTRY)}"
            )
        ds = STEP_REGISTRY[op](ds, **step)
    return ds


def run_file(path: str | Path, **params) -> ray.data.Dataset:
    return build(load_spec(path), **params)


# ----------------------------------------------------------- steps --
@register_step("read_parquet")
def _read_parquet(ds, path: str, columns: list[str] | None = None):
    assert ds is None, "read_parquet must be the first step"
    from ..io import read_parquet_clean

    return read_parquet_clean(path, columns=columns)


@register_step("filter_expr")
def _filter_expr(ds, column: str, op: str, value):
    """Vectorized predicate filter (M4/M5). ``op`` ∈ ==, !=, <, <=, >, >=, in, contains."""
    fns = {
        "==": pc.equal, "!=": pc.not_equal, "<": pc.less, "<=": pc.less_equal,
        ">": pc.greater, ">=": pc.greater_equal,
    }

    def flt(t: pa.Table) -> pa.Table:
        col = t[column]
        if op == "in":
            mask = pc.is_in(col, value_set=pa.array(value))
        elif op == "contains":
            mask = pc.match_substring(pc.fill_null(col, ""), value)
        else:
            mask = fns[op](col, pa.scalar(value))
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(flt, batch_format="pyarrow")


@register_step("rule_categorize")
def _rule_categorize(ds, column: str, rules: dict, default: str = "other",
                     output: str = "category"):
    from ..stages.categorize import rule_categorize

    return rule_categorize(ds, column, rules, default=default, output=output)


@register_step("cascade_categorize")
def _cascade_categorize(ds, cascade: list, default: str = "other",
                        output: str = "category"):
    from ..stages.categorize import cascade_categorize

    return cascade_categorize(
        ds, [(c["category"], c["column"], c["contains"]) for c in cascade],
        default=default, output=output,
    )


@register_step("regex_extract")
def _regex_extract(ds, column: str, pattern: str, output: str):
    from ..stages.categorize import regex_extract

    return regex_extract(ds, column, pattern, output)


@register_step("derive")
def _derive(ds, output: str, expr: dict):
    """Arithmetic derived column (M12): {fn: multiply|divide|add|subtract,
    args: [colname or {lit: x}, ...]}."""

    def ev(t: pa.Table, node):
        if isinstance(node, dict) and "lit" in node:
            return pa.scalar(node["lit"])
        if isinstance(node, dict):
            fn = getattr(pc, node["fn"])
            return fn(*[ev(t, a) for a in node["args"]])
        return t[node]

    def add(t: pa.Table) -> pa.Table:
        return t.append_column(output, ev(t, expr))

    return ds.map_batches(add, batch_format="pyarrow")


@register_step("select")
def _select(ds, columns: list[str]):
    return ds.select_columns(columns)


@register_step("stamp")
def _stamp(ds, **values):
    from ..stages.categorize import stamp_metadata

    return stamp_metadata(ds, **values)


@register_step("groupby_agg")
def _groupby_agg(ds, keys: list[str], aggs: list[dict]):
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    fns = {"count": Count, "sum": Sum, "mean": Mean, "min": Min, "max": Max}
    built = []
    for a in aggs:
        cls = fns[a["fn"]]
        if a["fn"] == "count":
            built.append(cls(alias_name=a.get("alias", "count")))
        else:
            built.append(cls(a["column"], alias_name=a.get("alias", a["column"])))
    return ds.groupby(keys).aggregate(*built)


@register_step("sort_limit")
def _sort_limit(ds, by: list[str], descending: bool = True, limit: int | None = None):
    ds = ds.sort(by, descending=descending)
    return ds.limit(limit) if limit is not None else ds


@register_step("broadcast_join")
def _broadcast_join(ds, path: str, keys: list[str], right_keys: list[str] | None = None,
                    columns: list[str] | None = None, join_type: str = "inner"):
    import pyarrow.parquet as pq

    from ..stages.relational import broadcast_join

    small = pq.read_table(path, columns=columns)
    return broadcast_join(ds, small, keys, join_type=join_type, right_keys=right_keys)


@register_step("write_parquet")
def _write_parquet(ds, path: str, partition_cols: list[str] | None = None):
    ds.write_parquet(path, partition_cols=partition_cols)
    return ds


@register_step("shuffle_join")
def _shuffle_join(ds, path: str, on: list[str], right_on: list[str] | None = None,
                  columns: list[str] | None = None, join_type: str = "inner",
                  n_buckets: int = 32):
    """Large-large bucketed shuffle join against another parquet table
    (the non-broadcast path; see stages/relational.shuffle_join)."""
    from ..stages.relational import shuffle_join

    from ..io import read_parquet_clean

    right = read_parquet_clean(path, columns=columns)
    return shuffle_join(ds, right, on=on, right_on=right_on,
                        join_type=join_type, n_buckets=n_buckets)


@register_step("exact_dedup")
def _exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    from ..stages.dedup import exact_dedup

    return exact_dedup(ds, text_col, id_col)


@register_step("latest_per_key")
def _latest_per_key(ds, keys: list[str], order_by: list[str], n_buckets: int = 32):
    from ..stages.relational import latest_per_key

    return latest_per_key(ds, keys, order_by, n_buckets=n_buckets)
