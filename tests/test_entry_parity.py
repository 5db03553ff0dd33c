"""Mirror of the driver's correctness gate: run every ``queries()``
entry and compare against ``oracle_sql()`` via DuckDB (row count, column
names, order-insensitive values) at sf0.001."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
# corpus-parameterized oracles (stemmed vocabulary map, inlined IVF
# centroids) must be built for the SAME sf dir the queries run on
os.environ["WBSE_ORACLE_SF_DIR"] = SF_DIR
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(np.float64), 9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _oracle_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, con, ray_session):
    import __ray_entry__ as e

    ray_df = _canon(_to_pandas(e.queries()[name](SF_DIR)))
    sql_df = _canon(con.execute(e.oracle_sql()[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), (
        f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    )
    pd.testing.assert_frame_equal(
        ray_df, sql_df, check_dtype=False, check_exact=False, atol=1e-9,
        obj=name,
    )


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as e

    q = e.queries()
    oracles = set(e.oracle_sql())
    for name, fn in q.items():
        if name in oracles:
            continue
        df = _to_pandas(fn(SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = _to_pandas(e.entry())
    assert len(res) > 0
    assert {"query_id", "rank", "doc_id", "score"} <= set(res.columns)


def test_ivf_oracle_refuses_mismatched_corpus(con):
    """The ivf_ann oracle inlines centroids trained on its sf dir; run
    against a DIFFERENT corpus it must fail self-describingly (in-SQL
    fingerprint guard), not as an opaque hash mismatch."""
    from web_based_search_engine_ray.registry import _ivf_ann_sql

    sql = _ivf_ann_sql("/root/testdata/sf0.01")  # views are sf0.001
    with pytest.raises(duckdb.Error, match="different embeddings table"):
        con.execute(sql).fetchdf()
