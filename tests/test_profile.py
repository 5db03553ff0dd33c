"""Profiling compositions: top terms per group, dup rates, centroids."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from web_based_search_engine_ray.pipelines.profile import (
    dup_rate_by_group,
    label_centroids,
    top_terms_per_group,
)


def test_top_terms_per_group(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "en", "fr"], type=pa.string()),
                "text": pa.array(
                    ["aa bb aa", "bb cc", "xx yy xx"], type=pa.string()
                ),
            }
        )
    )
    out = (
        top_terms_per_group(ds, group_col="lang", k=2)
        .to_pandas()
        .sort_values(["lang", "n", "term"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    en = out[out["lang"] == "en"]
    assert list(zip(en["term"], en["n"])) == [("aa", 2), ("bb", 2)]
    fr = out[out["lang"] == "fr"]
    assert list(zip(fr["term"], fr["n"])) == [("xx", 2), ("yy", 1)]


def test_dup_rate_by_group(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "source": pa.array(["a"] * 4 + ["b"] * 2, type=pa.string()),
                "text": pa.array(
                    ["t1", "t1", "t2", "t1", "u1", "u2"], type=pa.string()
                ),
            }
        )
    )
    out = (
        dup_rate_by_group(ds)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert out["n_docs"].tolist() == [4, 2]
    assert out["n_unique"].tolist() == [2, 2]
    assert abs(out.loc[0, "dup_rate"] - 0.5) < 1e-12
    assert out.loc[1, "dup_rate"] == 0.0


def test_label_centroids(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "label": pa.array([0, 0, 1], type=pa.int32()),
                "embedding": pa.array(
                    [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
    )
    out = (
        label_centroids(ds)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    assert out["centroid"].tolist() == [2.0, 3.0, 5.0, 6.0]
    assert out["label"].tolist() == [0, 0, 1, 1]
