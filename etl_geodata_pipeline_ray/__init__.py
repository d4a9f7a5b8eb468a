"""Ray-Data-native CDC / data-processing engine (see SURVEY.md)."""

import logging as _logging
import re as _re


class _EmptyNewSchemaFilter(_logging.Filter):
    """Drop ONE benign Ray Data warning: the streaming executor warns
    whenever an operator's RefBundle schema differs from the previous
    bundle's, but its empty-schema guard is asymmetric — an empty OLD
    schema is skipped while an empty NEW schema still warns. Sort-based
    exchanges (groupby / map_groups) legitimately emit zero-row,
    schema-less partitions whenever distinct keys < partition count
    (duplicate sampled quantile boundaries), so bucketed joins log a
    scary-looking line per run that carries no information: an empty
    bundle has no rows and no types to drift. REAL schema divergence —
    both schemas non-empty — still warns; only the empty-new-schema
    rendering is dropped."""

    _EMPTY_NEW = _re.compile(
        r"new schema: (None|PandasBlockSchema\(names=\[\], types=\[\]\))?\."
        r" This may lead"
    )

    def filter(self, record: _logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not (
            "RefBundle with a different schema" in msg
            and self._EMPTY_NEW.search(msg)
        )


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptyNewSchemaFilter())


def _shim_fsspec_http() -> None:
    """Make Ray Data thread-safe in aiohttp-less environments.

    Ray's path resolution probes ``from fsspec.implementations.http
    import HTTPFileSystem`` on EVERY read/write and handles only
    ``ModuleNotFoundError`` (absent aiohttp). A FAILED import is not
    cached, so two threads racing the probe can interleave: the loser
    observes the winner's partially-initialized module in sys.modules
    and gets a plain ``ImportError`` ("cannot import name ...") that
    Ray does not catch — killing whichever caller thread lost the
    race. Pre-seeding a stub module with a never-instantiated
    HTTPFileSystem class makes the probe succeed deterministically;
    Ray only uses the name for isinstance checks, which are False for
    every filesystem this engine touches — exactly the behavior Ray's
    own ModuleNotFoundError branch intends."""
    import sys as _sys

    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        import types as _types

        class _HTTPFileSystemUnavailable:  # pragma: no cover - marker type
            def __init__(self, *a, **kw):
                raise ModuleNotFoundError(
                    "fsspec HTTP filesystem needs aiohttp, which is not "
                    "installed"
                )

        mod = _types.ModuleType("fsspec.implementations.http")
        mod.HTTPFileSystem = _HTTPFileSystemUnavailable
        _sys.modules["fsspec.implementations.http"] = mod
    except ImportError:
        pass  # partially importable some other way: leave it alone


_shim_fsspec_http()
