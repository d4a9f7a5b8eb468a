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
