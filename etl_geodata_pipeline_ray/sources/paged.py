"""Custom Datasource for paged REST/feature-server style APIs.

Reference S6: the ArcGIS FeatureServer client pages through
``resultOffset``/``resultRecordCount`` windows with a ``where=`` filter
passthrough (``cities/curitiba/spatial_analysis/geo_curitiba_client.py:
69-158``). Ray-native shape: one read task per page so pages download
and parse in parallel under streaming backpressure.

No network exists in this sandbox, so the page fetcher is an injected
callable (``fetch_page(page_idx) -> pyarrow.Table``); the HTTP call is
the one-line integration point inside a real fetcher. Everything else
— task-per-page parallelism, schema, backpressure — is real and
tested.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import ray.data
from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask


class PagedSourceDatasource(Datasource):
    def __init__(
        self,
        fetch_page: Callable[[int], pa.Table],
        num_pages: int,
        schema: pa.Schema | None = None,
    ):
        self._fetch_page = fetch_page
        self._num_pages = num_pages
        self._schema = schema

    def estimate_inmemory_data_size(self) -> int | None:
        return None

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        fetch = self._fetch_page
        tasks = []
        for page in range(self._num_pages):
            # num_rows in read-task metadata must be EXACT or None:
            # Ray's Dataset.count() short-circuits on the metadata sum
            # without executing, so a per-page "hint" (wrong for the
            # last partial page) would make count() lie
            meta = BlockMetadata(
                num_rows=None,
                size_bytes=None,
                input_files=None,
                exec_stats=None,
            )

            def make(page_idx: int):
                def read() -> list[pa.Table]:
                    return [fetch(page_idx)]

                return read

            tasks.append(ReadTask(make(page), meta, schema=self._schema))
        return tasks


def read_paged(
    fetch_page: Callable[[int], pa.Table],
    num_pages: int,
    schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    return ray.data.read_datasource(
        PagedSourceDatasource(fetch_page, num_pages, schema=schema)
    )
