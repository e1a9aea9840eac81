"""Local stand-in for the driver's CORRECTNESS gate.

Runs ``queries()[k](sf_dir)`` and ``oracle_sql()[k]`` (DuckDB, with the
testdata parquet registered as views) side by side and compares
row count, column names, and values (columns sorted by name, rows
sorted by all columns, floats compared to 1e-9 rel).

Usage:
    python scripts/check_parity.py [key ...]        # default: all oracled
    GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/check_parity.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    try:
        df = df.to_pandas()  # Dataset / pa.Table
    except AttributeError:
        pass
    df = df[sorted(df.columns)].reset_index(drop=True)
    if len(df):
        df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def _compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if list(a.columns) != list(b.columns):
        return f"schema {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(x).dtype, np.floating) or np.issubdtype(
            np.asarray(y).dtype, np.floating
        ):
            if not np.allclose(
                x.astype(np.float64), y.astype(np.float64), rtol=1e-9, atol=1e-9
            ):
                i = int(
                    np.argmax(
                        ~np.isclose(
                            x.astype(np.float64), y.astype(np.float64),
                            rtol=1e-9, atol=1e-9,
                        )
                    )
                )
                return f"col {c} differs at row {i}: {x[i]} vs {y[i]}"
        else:
            xa = np.asarray(x, dtype=object)
            ya = np.asarray(y, dtype=object)
            neq = xa != ya
            if neq.any():
                i = int(np.argmax(neq))
                return f"col {c} differs at row {i}: {x[i]!r} vs {y[i]!r}"
    return None


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True,
        )
    import __ray_entry__ as E

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs, osql = E.queries(), E.oracle_sql()
    keys = sys.argv[1:] or [k for k in qs if k in osql]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    failed = []
    for k in keys:
        t0 = time.time()
        try:
            mine = _canon(qs[k](sf_dir))
            if k not in osql:
                print(f"  {k}: rows-only ({len(mine)} rows, {time.time()-t0:.1f}s)")
                continue
            theirs = _canon(con.execute(osql[k]).df())
            err = _compare(mine, theirs)
        except Exception as e:  # noqa: BLE001 - report and keep going
            err = f"EXC {type(e).__name__}: {e}"
        if err:
            failed.append(k)
            print(f"  {k}: FAIL — {err}")
        else:
            print(f"  {k}: ok ({len(mine)} rows, {time.time()-t0:.1f}s)")
    print(f"{len(keys) - len(failed)}/{len(keys)} green")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
