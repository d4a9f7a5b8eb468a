"""Rule-based categorization + scalar extraction stages.

Re-expresses the reference's two categorizers as vectorized Arrow
passes:

* ``rule_categorize`` — YAML-style value-set rules, ``category =
  'other'`` then per-rule ``isin`` overwrite (M1; reference
  ``scripts/process_layers.py:302-321``).
* ``cascade_categorize`` — priority cascade over several columns with
  substring matching, FIRST match wins (M2; reference per-row
  ``intelligent_pt_categorize`` ``process_layers.py:130-204`` — a
  ``df.apply(axis=1)`` there, a mask cascade here).
* ``regex_extract`` — regex field extraction (M8; reference year
  extraction ``population_pipeline_stuttgart.py:47-49``).
* ``stamp_metadata`` — lineage column stamping (M14; reference
  ``process_layers.py:286-291``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def categorize_batch(
    batch: pa.Table,
    column: str,
    rules: dict[str, list[str]],
    default: str = "other",
    output: str = "category",
) -> pa.Table:
    """Pure-batch form of rule categorization (usable inside any stage)."""
    cat = pa.array([default] * batch.num_rows, type=pa.string())
    col = batch[column]
    for category, values in rules.items():
        mask = pc.is_in(col, value_set=pa.array(values, type=pa.string()))
        mask = pc.fill_null(mask, False)
        cat = pc.if_else(mask, pa.scalar(category, type=pa.string()), cat)
    return batch.append_column(output, cat)


def rule_categorize(
    ds: ray.data.Dataset,
    column: str,
    rules: dict[str, list[str]],
    default: str = "other",
    output: str = "category",
) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: categorize_batch(b, column, rules, default, output),
        batch_format="pyarrow",
    )


def cascade_categorize(
    ds: ray.data.Dataset,
    cascade: list[tuple[str, str, list[str]]],
    default: str = "other",
    output: str = "category",
) -> ray.data.Dataset:
    """``cascade`` = ordered [(category, column, substrings)]; the first
    rule whose column contains any of its substrings wins — order-
    sensitive semantics preserved from the reference by assigning in
    REVERSE priority so earlier rules overwrite later ones."""

    for category, _column, needles in cascade:
        if not needles:
            # pc.if_else(None, ...) would silently null the ENTIRE
            # category column — refuse the malformed rule loudly
            raise ValueError(f"cascade rule {category!r} has no substrings")

    def apply(batch: pa.Table) -> pa.Table:
        cat = pa.array([default] * batch.num_rows, type=pa.string())
        for category, column, needles in reversed(cascade):
            col = pc.fill_null(batch[column], "")
            mask = None
            for needle in needles:
                m = pc.match_substring(col, needle)
                mask = m if mask is None else pc.or_(mask, m)
            cat = pc.if_else(mask, pa.scalar(category, type=pa.string()), cat)
        return batch.append_column(output, cat)

    return ds.map_batches(apply, batch_format="pyarrow")


def regex_extract(
    ds: ray.data.Dataset, column: str, pattern: str, output: str
) -> ray.data.Dataset:
    """Extract the first regex group into a new column. ``pattern`` must
    contain one named group ``(?P<x>...)``."""

    def extract(batch: pa.Table) -> pa.Table:
        st = pc.extract_regex(pc.fill_null(batch[column], ""), pattern)
        return batch.append_column(output, pc.struct_field(st, [0]))

    return ds.map_batches(extract, batch_format="pyarrow")


def stamp_metadata(ds: ray.data.Dataset, **values) -> ray.data.Dataset:
    """Append constant lineage columns (source name, run id, ...)."""

    def stamp(batch: pa.Table) -> pa.Table:
        for k, v in values.items():
            # explicit type from the VALUE: an empty batch would
            # otherwise infer a null-typed column that conflicts with
            # the type non-empty blocks infer (schema-unification or
            # parquet-write failure downstream)
            typ = pa.scalar(v).type
            batch = batch.append_column(
                k, pa.array([v] * batch.num_rows, type=typ)
            )
        return batch

    return ds.map_batches(stamp, batch_format="pyarrow")
