"""exact_quantiles / corpus_stats / stratified_sample."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from web_based_search_engine_ray.pipelines.sampling import (
    sample_fraction,
    stratified_sample,
)
from web_based_search_engine_ray.pipelines.stats import (
    corpus_stats,
    exact_quantiles,
)


def _vals(values):
    return rd.from_arrow(
        pa.table({"v": pa.array(values, type=pa.int64())})
    )


def test_quantiles_exact_ranks(ray_session):
    # 1..100: rank ceil(q*100)
    out = exact_quantiles(_vals(list(range(1, 101))), "v", [0.5, 0.9, 0.99, 1.0])
    assert out["value"].tolist() == [50, 90, 99, 100]
    assert (out["n_rows"] == 100).all()


def test_quantiles_with_ties(ray_session):
    # 10 copies each of 1, 2, 3: median = 2, P99 = 3, tiny q = 1
    vals = [1] * 10 + [2] * 10 + [3] * 10
    out = exact_quantiles(_vals(vals), "v", [0.01, 0.5, 0.99])
    assert out["value"].tolist() == [1, 2, 3]


def test_quantiles_guards(ray_session):
    with pytest.raises(ValueError, match="quantile must be"):
        exact_quantiles(_vals([1]), "v", [0.0])
    with pytest.raises(ValueError, match="max_distinct"):
        exact_quantiles(_vals(list(range(100))), "v", [0.5], max_distinct=10)


def test_corpus_stats_small(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "en", "fr"], type=pa.string()),
                "source": pa.array(["s", "s", "s"], type=pa.string()),
                "n_chars": pa.array([10, 20, 7], type=pa.int64()),
            }
        )
    )
    out = (
        corpus_stats(ds)
        .to_pandas()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    assert out["n_docs"].tolist() == [2, 1]
    assert out["total_chars"].tolist() == [30, 7]
    assert out["avg_chars"].tolist() == [15.0, 7.0]


def _docs_tbl(n=2000):
    langs = ["en", "fr", "zh", "de"]
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "lang": pa.array(
                    [langs[i % 4] for i in range(n)], type=pa.string()
                ),
            }
        )
    )


def test_stratified_rates_and_determinism(ray_session):
    fr = {"en": 0.1, "fr": 0.5, "zh": 1.0}
    a = (
        stratified_sample(_docs_tbl(), fr, strata_col="lang", default=0.25)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        stratified_sample(_docs_tbl(), fr, strata_col="lang", default=0.25)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    got = a.groupby("lang")["doc_id"].count()
    # 500 per stratum; hash-gate rates within generous binomial bounds
    assert got["zh"] == 500
    assert 20 <= got["en"] <= 90
    assert 200 <= got["fr"] <= 300
    assert 80 <= got["de"] <= 170  # default 0.25


def test_stratified_nests_with_sample_fraction(ray_session):
    """A stratum sampled at frac f must equal sample_fraction(f) on
    that stratum — same gate, so mixes stay consistent corpus-wide."""
    ds = _docs_tbl()
    strat = stratified_sample(
        ds, {"en": 0.3}, strata_col="lang", default=0.0
    ).to_pandas()
    en_only = ds.filter(expr="lang == 'en'")
    plain = sample_fraction(en_only, 0.3).to_pandas()
    assert sorted(strat["doc_id"]) == sorted(plain["doc_id"])


def test_stratified_guards(ray_session):
    with pytest.raises(ValueError, match="stratum"):
        stratified_sample(_docs_tbl(), {"en": 1.5}, strata_col="lang")


def test_grouped_quantiles_matches_per_group_exact(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.stats import (
        exact_quantiles,
        grouped_quantiles,
    )

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=600),
            "v": rng.integers(0, 40, size=600),
        }
    )
    qs = [0.5, 0.9, 0.99]
    got = grouped_quantiles(
        rd.from_pandas(df), "v", "g", qs
    ).sort_values(["group", "q"]).reset_index(drop=True)
    for g in ("a", "b", "c"):
        sub = rd.from_pandas(df[df["g"] == g].reset_index(drop=True))
        want = exact_quantiles(sub, "v", qs)
        mine = got[got["group"] == g].reset_index(drop=True)
        assert mine["value"].tolist() == want["value"].tolist()
        assert mine["n_rows"].tolist() == want["n_rows"].tolist()

    with pytest.raises(ValueError, match="max_distinct"):
        grouped_quantiles(rd.from_pandas(df), "v", "g", qs, max_distinct=5)


def test_histogram_quantiles_sketch(ray_session):
    """Fixed-grid sketch: within one bucket width of exact, and
    parallelism-independent."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from web_based_search_engine_ray.pipelines.stats import (
        histogram_quantiles,
    )

    rng = np.random.default_rng(21)
    v = rng.gamma(2.0, 50.0, size=5000)  # continuous, skewed
    qs = [0.5, 0.9, 0.99]
    got = histogram_quantiles(
        rd.from_pandas(pd.DataFrame({"v": v}), override_num_blocks=8),
        "v", qs, bins=2048,
    )
    width = (v.max() - v.min()) / 2048
    for q, val in zip(qs, got["value"]):
        exact = np.quantile(v, q, method="inverted_cdf")
        assert abs(val - exact) <= 2 * width + 1e-9, (q, val, exact)
    # parallelism independence: different block count, same values
    got2 = histogram_quantiles(
        rd.from_pandas(pd.DataFrame({"v": v}), override_num_blocks=3),
        "v", qs, bins=2048,
    )
    assert got["value"].tolist() == got2["value"].tolist()
    # constant column: width falls back to 1.0, all quantiles = max+? edge
    gotc = histogram_quantiles(
        rd.from_pandas(pd.DataFrame({"v": [5.0] * 50})), "v", [0.5]
    )
    assert len(gotc) == 1 and gotc["n_rows"][0] == 50
