"""Arrow schemas for the transcript CDC workload + schema reconciliation.

The target table shape comes from BASELINE.json ``input_hint``:
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp[us])``.

Schema reconciliation reproduces the reference's defensive schema
probing (reference ``scripts/process_layers.py:260-273`` — pick the
first tag column that exists; ``population_pipeline_stuttgart.py:36-45``
— repair a CSV whose columns arrived joined) as a principled Arrow
pass: ``pa.unify_schemas`` over every input fragment + the lake
schema, then cast-and-null-fill each batch to the unified schema
before any blocks mix.
"""

from __future__ import annotations

import pyarrow as pa

# Final lake-table payload schema (FIXTURES.md F1).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.large_string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# CDC change-event envelope (FIXTURES.md F2). ``tool`` is physically
# absent from segments written before the schema-change offset.
EVENT_SCHEMA = pa.schema(
    [
        pa.field("op", pa.string()),
        pa.field("op_seq", pa.int64()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.large_string()),
        pa.field("tool", pa.string()),
    ]
)

EVENT_SCHEMA_V0 = pa.schema([f for f in EVENT_SCHEMA if f.name != "tool"])

# Lake files keep the full event envelope of the *winning* revision per
# key, including ``op`` (rows with op == 'D' are tombstones, filtered on
# read) and ``op_seq`` (LWW tiebreaker + lineage).
LAKE_SCHEMA = EVENT_SCHEMA

MERGE_KEY = ["conv_id", "turn_idx"]
LWW_ORDER = ["ts", "op_seq"]


def unify(schemas: list[pa.Schema]) -> pa.Schema:
    """Unify fragment schemas, widening types and unioning columns.

    ``promote_options="permissive"`` lets ``string`` widen to
    ``large_string`` etc.; column order follows first appearance.
    Metadata is stripped: a schema carrying the pandas metadata dict is
    unhashable, which disables Ray Data's block-schema dedup (one
    warning per task) everywhere downstream.
    """
    return pa.unify_schemas(
        list(schemas), promote_options="permissive"
    ).remove_metadata()


def conform(batch: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast ``batch`` to ``target``: add missing columns as typed nulls,
    reorder, and cast mismatched types. Zero-copy where possible."""
    n = batch.num_rows
    cols = []
    for field in target:
        if field.name in batch.column_names:
            col = batch.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
        else:
            col = pa.nulls(n, type=field.type)
        cols.append(col)
    return pa.table(cols, schema=target)
