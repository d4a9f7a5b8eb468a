"""Operator-conformance: every SQL-expressible queries() entry must
match its DuckDB oracle on the driver's testdata (same check the
driver runs at sf0.01; here at sf0.001 for speed)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.oracle_check import compare, duck_con  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _entry():
    import __ray_entry__ as entrymod

    return entrymod


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


def _query_names():
    em = _entry()
    return sorted(em.oracle_sql().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(ray_session, con, name):
    em = _entry()
    ok, msg = compare(em.queries()[name](SF_DIR), em.oracle_sql()[name], con)
    assert ok, f"{name}: {msg}"


def test_rows_only_queries_run(ray_session):
    em = _entry()
    oracles = em.oracle_sql()
    for name, fn in em.queries().items():
        if name in oracles:
            continue
        res = fn(SF_DIR)
        from tests.oracle_check import to_pandas

        assert len(to_pandas(res)) >= 0


def test_entry_smoke(ray_session):
    em = _entry()
    ds = em.entry()
    assert ds.count() > 0
    assert "conv_id" in ds.schema().names
