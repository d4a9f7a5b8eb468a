"""Property tests for the HLL sketch and the paged custom Datasource."""

import numpy as np
import pandas as pd


def test_hll_accuracy_vs_exact(ray_session):
    import ray.data

    from etl_geodata_pipeline_ray.stages.sketches import HyperLogLog, approx_distinct

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b", "c"], 40_000),
            "v": np.concatenate(
                [
                    rng.integers(0, 5_000, 40_000),      # ~5000 distinct
                    rng.integers(0, 20_000, 40_000),     # ~17k distinct
                    rng.integers(0, 200, 40_000),        # 200 distinct
                ]
            ),
        }
    )
    exact = df.groupby("g")["v"].nunique()
    out = approx_distinct(ray.data.from_pandas(df), "g", "v", p=12)
    for _, row in out.iterrows():
        e = exact[row["g"]]
        assert abs(row["approx_distinct"] - e) / e < 0.05, (row["g"], row["approx_distinct"], e)

    # registers merge associatively (retry/re-partition safety)
    hll = HyperLogLog(p=10)
    a = hll.registers(rng.integers(0, 1000, 5000))
    b = hll.registers(rng.integers(500, 1500, 5000))
    assert (HyperLogLog.merge(a, b) == HyperLogLog.merge(b, a)).all()


def test_paged_datasource_parallel_pages(ray_session):
    import pyarrow as pa

    from etl_geodata_pipeline_ray.sources.paged import read_paged

    def fetch(i: int) -> pa.Table:
        return pa.table({"page": [i] * 10, "x": list(range(10))})

    ds = read_paged(fetch, num_pages=7)
    assert ds.count() == 70
    pages = set(r["page"] for r in ds.take_all())
    assert pages == set(range(7))
