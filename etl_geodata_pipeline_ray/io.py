"""Parquet read hygiene shared by every pipeline.

Parquet files written from pandas carry a ``pandas`` metadata blob (a
Python dict) on their Arrow schema, and a ``pyarrow.Schema`` holding
metadata is UNHASHABLE (``hash(schema)`` raises ``unhashable type:
'dict'``). Ray Data deduplicates block schemas by hashing them; when
that fails it logs one ``Failed to hash the schemas (for
deduplication)`` warning per read/reduce task AND falls back to a full
pairwise unify — so the metadata costs both noise and work on every
exchange downstream of the read. Declaring a metadata-free schema at
the read keeps every downstream block schema hashable for the price of
one driver-side footer probe (metadata only, no data I/O).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def clean_read_schema(path, columns: list[str] | None = None) -> pa.Schema | None:
    """Metadata-free schema for ``read_parquet(path, columns=...)``:
    the footer schema subset to ``columns`` (in column order, matching
    the reader's output order) with schema- and field-level metadata
    stripped. ``None`` when the footer can't be probed (directory /
    remote glob) or a requested column is absent — callers then fall
    back to a plain read."""
    try:
        if isinstance(path, (str, Path)):
            full = pq.read_schema(path)
        else:
            # multi-file input: probing only file[0] would DECLARE that
            # file's schema for the whole read and silently drop
            # late-added columns from schema-evolved files. Unify every
            # footer (metadata-only) when the list is small; otherwise
            # fall back to a plain read (Ray unifies lazily itself).
            if len(path) > 64:
                return None
            schemas = [pq.read_schema(p) for p in path]
            full = pa.unify_schemas(
                [s.remove_metadata() for s in schemas],
                promote_options="permissive",
            )
        names = columns if columns is not None else full.names
        return pa.schema([full.field(n).remove_metadata() for n in names])
    except (OSError, KeyError, pa.ArrowInvalid, pa.ArrowTypeError):
        return None


def read_parquet_clean(path, columns: list[str] | None = None, **kw) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with the pandas metadata stripped from
    the declared schema (see module docstring). Signature-compatible
    with ``read_parquet``; a caller-supplied ``schema=`` wins. Note a
    declared schema restricts ``filter=`` to projected columns — pass
    ``schema=None`` explicitly to keep the full footer schema when a
    predicate must reference non-projected columns."""
    if "schema" not in kw:
        kw["schema"] = clean_read_schema(path, columns)
    elif kw["schema"] is None:
        del kw["schema"]
    return ray.data.read_parquet(path, columns=columns, **kw)
