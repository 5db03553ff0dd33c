"""asof_join: bucketed merge_asof composition (pipelines/joins.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(ray_session):
    import ray.data as rd

    left = rd.from_arrow(pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "ts": pa.array(
                pd.to_datetime(
                    ["2024-01-01 00:10", "2024-01-01 00:20",
                     "2024-01-01 00:10", "2024-01-01 00:05",
                     "2024-01-01 00:30"]
                )
            ),
        }
    ))
    right = rd.from_arrow(pa.table(
        {
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "ts": pa.array(
                pd.to_datetime(
                    ["2024-01-01 00:08", "2024-01-01 00:15",
                     "2024-01-01 00:10"]
                )
            ),
            "tag": pa.array(["a", "b", "c"]),
        }
    ))
    return left, right


def test_asof_backward_with_nulls(ray_session):
    from web_based_search_engine_ray.pipelines.joins import asof_join

    left, right = _mk(ray_session)
    out = (
        asof_join(left, right, on="ts", by="user_id")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # event 0 (u1 @10) -> a(@08); 1 (u1 @20) -> b(@15);
    # 2 (u2 @10) -> c(@10, exact); 3 (u2 @05) -> null; 4 (u3) -> null
    assert out["tag_r"].tolist() == ["a", "b", "c", None, None]
    assert len(out) == 5


def test_asof_forward_and_no_exact(ray_session):
    from web_based_search_engine_ray.pipelines.joins import asof_join

    left, right = _mk(ray_session)
    fwd = (
        asof_join(left, right, on="ts", by="user_id", direction="forward")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert fwd["tag_r"].tolist() == ["b", None, "c", "c", None]
    noex = (
        asof_join(left, right, on="ts", by="user_id",
                  allow_exact_matches=False)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # event 2's exact @10 match is excluded -> null (no earlier view)
    assert noex["tag_r"].tolist() == ["a", "b", None, None, None]


def test_asof_matches_pandas_reference(ray_session):
    """Random data: bucketed distributed result == single merge_asof."""
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.joins import asof_join

    rng = np.random.default_rng(5)
    nl, nr = 400, 300
    lt = pd.DataFrame(
        {
            "event_id": np.arange(nl),
            "user_id": rng.integers(0, 20, nl),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, nl), unit="s"),
        }
    )
    rt = pd.DataFrame(
        {
            "user_id": rng.integers(0, 20, nr),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, nr), unit="s"),
            "val": rng.normal(size=nr),
        }
    ).drop_duplicates(["user_id", "ts"])
    want = pd.merge_asof(
        lt.sort_values(["ts", "user_id"], kind="stable"),
        rt.sort_values(["ts", "user_id"], kind="stable")
        .rename(columns={"val": "val_r"}),
        on="ts", by="user_id",
    ).sort_values("event_id").reset_index(drop=True)
    got = (
        asof_join(rd.from_pandas(lt), rd.from_pandas(rt),
                  on="ts", by="user_id", num_buckets=7)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert np.allclose(
        got["val_r"].to_numpy(), want["val_r"].to_numpy(), equal_nan=True
    )


def test_asof_guard_and_validation(ray_session):
    import ray

    from web_based_search_engine_ray.pipelines.joins import asof_join

    left, right = _mk(ray_session)
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, on="ts", by="user_id", direction="nearest")
    with pytest.raises(ValueError, match="must exist"):
        asof_join(left, right, on="nope", by="user_id")
    with pytest.raises(ray.exceptions.RayTaskError, match="asof_join"):
        asof_join(left, right, on="ts", by="user_id",
                  num_buckets=1, max_group_rows=3).materialize()


def test_broadcast_range_join(ray_session):
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.joins import (
        broadcast_range_join,
    )

    ds = rd.from_arrow(pa.table(
        {
            "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "v": pa.array([-1.0, 0.0, 4.99, 5.0, 100.0]),
        }
    ))
    ranges = pd.DataFrame(
        [{"lo": 0.0, "hi": 5.0, "band": "a"},
         {"lo": 5.0, "hi": 10.0, "band": "b"}]
    )
    out = (
        broadcast_range_join(ds, ranges, on="v")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # half-open [lo, hi): -1 and 100 fall outside every interval
    assert out["band_r"].tolist() == [None, "a", "a", "b", None]
    with pytest.raises(ValueError, match="overlap"):
        bad = pd.DataFrame(
            [{"lo": 0.0, "hi": 6.0, "band": "a"},
             {"lo": 5.0, "hi": 10.0, "band": "b"}]
        )
        broadcast_range_join(ds, bad, on="v")


def test_top_k_per_group(ray_session):
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.events import top_k_per_group

    rng = np.random.default_rng(9)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.integers(0, 25, n),
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )
    got = (
        top_k_per_group(rd.from_pandas(df), k=3, num_buckets=7)
        .to_pandas().sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["value", "event_id"], ascending=[False, True])
        .groupby("user_id").head(3)
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    )
    assert got["event_id"].tolist() == want["event_id"].tolist()
