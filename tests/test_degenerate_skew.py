"""Degenerate / maximally-skewed inputs through the wide pipelines:
every row landing on ONE key (one user, one event type, one hour, one
quantile value, one graph sink, an all-duplicate chunk corpus) forces
the other shuffle partitions EMPTY — the shape that exposed the
schema-less zero-row-block hazard in the dedup tier — while the hot
partition exercises the single-reducer path.  Each probe asserts the
exact expected values, not just absence of a crash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _events(n: int, *, users=1, types=1, hours=1):
    import ray.data as rd

    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + (np.arange(n) % (hours * 60)).astype(
        "timedelta64[m]"
    ).astype("timedelta64[us]")
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(np.arange(n) % users, pa.int64()),
                "event_type": pa.array(
                    [f"t{i % types}" for i in range(n)], pa.string()
                ),
                "value": pa.array(np.ones(n), pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        )
    )


def test_sessionize_single_user(ray_session):
    """All events belong to ONE user: 63 of 64 user-hash buckets are
    empty; the hot bucket holds the whole corpus.  120 events 1 min
    apart with a 30-min gap threshold = exactly one session."""
    from web_based_search_engine_ray.pipelines.events import sessionize

    out = sessionize(_events(120, hours=2)).to_pandas()
    assert len(out) == 1
    assert out["n_events"].iloc[0] == 120
    assert out["sum_value"].iloc[0] == 120.0


def test_hourly_window_single_key(ray_session):
    from web_based_search_engine_ray.pipelines.events import (
        hourly_window_agg,
    )

    out = hourly_window_agg(_events(60)).to_pandas()
    assert len(out) == 1  # one type x one hour
    assert out["n_events"].iloc[0] == 60 if "n_events" in out.columns \
        else out.select_dtypes("number").iloc[0].max() == 60


def test_top_k_per_group_single_group(ray_session):
    from web_based_search_engine_ray.pipelines.events import (
        top_k_per_group,
    )

    out = top_k_per_group(_events(50), k=5).to_pandas()
    assert len(out) == 5
    assert (out["user_id"] == 0).all()


def test_pagerank_star_sink(ray_session):
    """Every edge points at node 0 (one hot dst bucket).  With no
    outlinks from 0, its mass redistributes as dangling mass; ranks
    must sum to 1 and node 0 must dominate."""
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.graph import pagerank

    n = 30
    edges = rd.from_arrow(
        pa.table(
            {
                "src_url": pa.array([f"u{i}" for i in range(1, n)]),
                "dst_url": pa.array(["u0"] * (n - 1)),
            }
        )
    )
    out = pagerank(edges, iters=20).to_pandas()
    assert len(out) == n
    s = out["pagerank"].sum()
    assert abs(s - 1.0) < 1e-9
    top = out.sort_values("pagerank", ascending=False).iloc[0]
    assert top["url"] == "u0"
    # all non-sink nodes are symmetric: identical rank
    rest = out[out["url"] != "u0"]["pagerank"]
    assert rest.max() - rest.min() < 1e-12


def test_pagerank_single_edge(ray_session):
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.graph import pagerank

    edges = rd.from_arrow(
        pa.table({"src_url": pa.array(["a"]), "dst_url": pa.array(["b"])})
    )
    out = pagerank(edges, iters=10).to_pandas()
    assert sorted(out["url"]) == ["a", "b"]
    assert abs(out["pagerank"].sum() - 1.0) < 1e-9
    r = dict(zip(out["url"], out["pagerank"]))
    assert r["b"] > r["a"]


def test_chunk_dedup_all_identical_docs(ray_session):
    """Every doc is the same text: every chunk after doc 0's is a
    duplicate — one hot chunk-hash bucket per distinct chunk."""
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.chunk_dedup import (
        chunk_dedup,
    )

    text = " ".join(f"w{i}" for i in range(64))  # 4 chunks of 16 tokens
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(20), pa.int64()),
                "text": pa.array([text] * 20, pa.string()),
            }
        )
    )
    out = chunk_dedup(docs).to_pandas().sort_values("doc_id")
    assert len(out) == 20
    first = out.iloc[0]
    assert first["n_kept"] == first["n_chunks"] == 4
    assert (out.iloc[1:]["n_kept"] == 0).all()
    assert (out.iloc[1:]["text_clean"] == "").all()


def test_exact_quantiles_single_value(ray_session):
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.stats import exact_quantiles

    ds = rd.from_arrow(
        pa.table({"v": pa.array([5.0] * 1000, pa.float64())})
    )
    out = exact_quantiles(ds, "v", [0.01, 0.5, 0.99, 1.0])
    vals = (out["value"] if "value" in getattr(out, "columns", [])
            else out)
    vals = list(vals.to_pandas()["value"]) if hasattr(out, "to_pandas") \
        else list(out["value"])
    assert all(v == 5.0 for v in vals)


def test_grouped_quantiles_single_group(ray_session):
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.stats import (
        grouped_quantiles,
    )

    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array(["en"] * 500, pa.string()),
                "v": pa.array(
                    np.arange(500, dtype=np.float64), pa.float64()
                ),
            }
        )
    )
    out = grouped_quantiles(ds, "v", "g", [0.5])
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(df) == 1
