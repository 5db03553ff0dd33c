"""Driver-mimic correctness check: run each registry query AND its
DuckDB oracle over the same sf dir, canonicalize (columns sorted by
name, rows sorted by all columns), and compare values exactly.

Usage:
    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        obj = obj.to_pandas()
    elif isinstance(obj, pa.Table):
        obj = obj.to_pandas()
    df = obj[sorted(obj.columns)].copy()
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, eng: pd.DataFrame, orc: pd.DataFrame) -> bool:
    ok = True
    if len(eng) != len(orc):
        print(f"  ROWS MISMATCH: engine {len(eng)} vs oracle {len(orc)}")
        return False
    if list(eng.columns) != list(orc.columns):
        print(f"  SCHEMA MISMATCH: {list(eng.columns)} vs {list(orc.columns)}")
        return False
    for c in eng.columns:
        a, b = eng[c], orc[c]
        if a.dtype.kind != b.dtype.kind:
            print(f"  DTYPE kind differs on {c}: {a.dtype} vs {b.dtype}")
            ok = False
        if a.dtype.kind == "f":
            av, bv = a.to_numpy(), b.to_numpy(dtype=a.dtype)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not eq.all():
                i = int(np.argmin(eq))
                print(
                    f"  VALUE differs on {c}: {np.count_nonzero(~eq)} rows, "
                    f"first at {i}: {av[i]!r} vs {bv[i]!r}"
                )
                ok = False
        else:
            eq = a.astype(str).to_numpy() == b.astype(str).to_numpy()
            if not eq.all():
                i = int(np.argmin(eq))
                print(
                    f"  VALUE differs on {c}: {np.count_nonzero(~eq)} rows, "
                    f"first at {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"
                )
                ok = False
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    # stemmed SQL oracles inline the corpus vocabulary of this sf dir
    os.environ["WBSE_ORACLE_SF_DIR"] = args.sf

    from web_based_search_engine_ray.registry import (
        oracle_sql,
        queries,
        self_verified,
    )

    qs, sqls, selfv = queries(), oracle_sql(), self_verified()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    n_ok = n_fail = n_selfv = 0
    record = {}
    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN")
            continue
        if name not in sqls:
            # a self-verified query RAISES if its in-process assertion
            # fails, so a returned result IS a passed check
            try:
                eng = canon(qs[name](args.sf))
            except Exception as e:  # noqa: BLE001 — ANY failure of a
                # self-verified query (assertion, Ray worker error,
                # convergence RuntimeError, ...) must be RECORDED as a
                # fail, not abort the whole run and leave the record
                # stale
                print(f"{name}: SELF-CHECK FAIL: {type(e).__name__}: {e}")
                record[name] = {
                    "self_verified": False,
                    "err": f"{type(e).__name__}: {e}",
                }
                n_fail += 1
                continue
            desc = selfv.get(name, "no declared assertion")
            print(f"{name}: SELF-VERIFIED ({len(eng)} rows) — {desc}")
            record[name] = {
                "self_verified": True,
                "rows": int(len(eng)),
                "assertion": desc,
            }
            n_selfv += 1
            continue
        eng = canon(qs[name](args.sf))
        orc = canon(con.execute(sqls[name]).fetchdf())
        good = compare(name, eng, orc)
        print(f"{name}: {'OK' if good else 'FAIL'} ({len(eng)} rows)")
        record[name] = {
            "oracle_match": bool(good), "rows": int(len(eng)),
        }
        n_ok += good
        n_fail += not good
    print(f"\n{n_ok} ok, {n_fail} fail, {n_selfv} self-verified")
    if not args.names:  # full runs refresh the committed record
        import json

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "SELFCHECK.json"), "w") as f:
            json.dump(
                {"sf": args.sf, "results": record,
                 "ok": n_ok, "fail": n_fail, "self_verified": n_selfv},
                f, indent=1,
            )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
