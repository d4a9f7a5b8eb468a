"""Lake KPI layer vs a pandas recomputation on the oracle state."""

import numpy as np
import pandas as pd
import pytest

from etl_geodata_pipeline_ray.cdc.generator import WalSpec, write_wal
from etl_geodata_pipeline_ray.cdc.oracle import oracle_final_state
from etl_geodata_pipeline_ray.cdc.replay import replay
from etl_geodata_pipeline_ray.pipelines import lake_queries as LQ


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lakekpi")
    spec = WalSpec(
        n_convs=150, seed=44, dup_rate=0.1, shuffle_window=200, schema_change_frac=0.5
    )
    write_wal(spec, tmp / "wal", overwrite=True)
    replay(tmp / "wal", tmp / "lake", num_shards=8)
    oracle = oracle_final_state(tmp / "wal").to_pandas()
    return tmp / "lake", oracle


def test_turn_counts_match_oracle(lake):
    lake_dir, oracle = lake
    got = LQ.conv_turn_counts(lake_dir).sort_values("conv_id").reset_index(drop=True)
    want = (
        oracle.assign(n_tokens=oracle["text"].str.split().str.len())
        .groupby("conv_id", as_index=False)
        .agg(n_turns=("turn_idx", "size"), total_tokens=("n_tokens", "sum"))
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_role_histogram(lake):
    lake_dir, oracle = lake
    got = dict(zip(*LQ.role_histogram(lake_dir)[["role", "n"]].T.values))
    want = oracle["role"].value_counts().to_dict()
    assert got == want


def test_role_entropy(lake):
    lake_dir, oracle = lake
    got = LQ.conv_role_entropy(lake_dir).set_index("conv_id")["role_entropy"]

    def ent(s):
        p = s.value_counts(normalize=True).to_numpy()
        return round(float(-(p * np.log(p)).sum() + 0.0), 4)

    want = oracle.groupby("conv_id")["role"].apply(ent)
    assert (got.sort_index() == want.sort_index()).all()


def test_longest_and_engagement(lake):
    lake_dir, oracle = lake
    top = LQ.longest_conversations(lake_dir, k=5)
    want_top = (
        oracle.groupby("conv_id").size().sort_values(ascending=False).head(5)
    )
    assert top["n_turns"].iloc[0] == want_top.iloc[0]

    eng = LQ.conv_engagement_score(lake_dir)
    assert eng["engagement"].between(0, 1).all()
    assert eng["engagement"].max() == 1.0 and eng["engagement"].min() == 0.0
    bundle = LQ.lake_kpis(lake_dir)
    assert set(bundle) == {"turn_counts", "role_histogram", "role_entropy", "longest", "engagement"}


def test_hopping_window_expansion(ray_session):
    """Each event lands in exactly size/hop windows, and the windows
    cover the event's timestamp."""
    import numpy as np
    import pandas as pd

    import ray.data
    from etl_geodata_pipeline_ray.stages.windows import hopping_window

    ts = pd.to_datetime(
        ["2024-01-01 00:10:00", "2024-01-01 00:59:59", "2024-01-01 03:00:00"]
    )
    ds = ray.data.from_pandas(pd.DataFrame({"ts": ts, "k": [1, 2, 3]}))
    out = hopping_window(ds, "ts", size_s=7200, hop_s=3600).to_pandas()
    assert len(out) == 6  # 2 windows per event
    for _, r in out.iterrows():
        w = r["window_start"]
        assert w <= r["ts"] < w + pd.Timedelta(seconds=7200)
    assert (out.groupby("k").size() == 2).all()
