"""Schema hygiene: metadata-free reads keep Ray's block-schema dedup
working (r3 verdict #6 — bench tail must be free of 'Failed to hash
the schemas' / 'RefBundle with a different schema' warnings)."""

import logging

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_clean_read_schema_strips_pandas_metadata(ray_session, tmp_path):
    from etl_geodata_pipeline_ray.io import clean_read_schema, read_parquet_clean

    # the footer carries pandas metadata (written from pandas) → the
    # raw schema is unhashable, the cleaned one hashes fine
    p = tmp_path / "t.parquet"
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})), p)
    raw = pq.read_schema(p)
    assert raw.metadata  # premise: pandas blob present
    cleaned = clean_read_schema(p, ["b", "a"])
    hash(cleaned)  # must not raise
    assert cleaned.names == ["b", "a"]  # column order preserved
    assert cleaned.metadata is None

    ds = read_parquet_clean(str(p), columns=["b", "a"])
    out = ds.to_pandas()
    assert list(out.columns) == ["b", "a"] and len(out) == 2
    # blocks downstream carry the hashable schema
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        assert base.metadata is None

    # directory input (no single footer): graceful fallback, no raise
    d = tmp_path / "dir"
    d.mkdir()
    pq.write_table(pa.table({"a": [1]}), d / "x.parquet")
    assert clean_read_schema(d) is None
    assert read_parquet_clean(str(d)).count() == 1


def test_empty_new_schema_filter_keeps_real_divergence():
    """The logging filter drops ONLY the benign empty-new-schema
    rendering of Ray's RefBundle warning; real schema drift (both
    schemas non-empty) must still pass through."""
    from etl_geodata_pipeline_ray import _EmptyNewSchemaFilter

    f = _EmptyNewSchemaFilter()

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, "f", 1, msg, (), None)

    benign_arrow = (
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64, new schema: . "
        "This may lead to unexpected behavior."
    )
    benign_none = benign_arrow.replace("new schema: .", "new schema: None.")
    benign_pandas = benign_arrow.replace(
        "new schema: .", "new schema: PandasBlockSchema(names=[], types=[])."
    )
    real = benign_arrow.replace("new schema: .", "new schema: a: float64.")
    assert not f.filter(rec(benign_arrow))
    assert not f.filter(rec(benign_none))
    assert not f.filter(rec(benign_pandas))
    assert f.filter(rec(real))
    assert f.filter(rec("some unrelated warning"))
