"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.001 and compare SQL-backed ones against DuckDB
(row count + schema + order-insensitive values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.unsignedinteger):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(name, ray_df, sql_df):
    a, b = _norm(ray_df), _norm(sql_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            assert np.allclose(av.astype(float), bv.astype(float), atol=1e-6), f"{name}.{c}"
        else:
            assert (av == bv).all(), f"{name}.{c}: first diff {av[av != bv][:3]} vs {bv[av != bv][:3]}"


SQL_BACKED = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_BACKED)
def test_sql_parity(name, con, ray_session):
    q = entrymod.queries()[name]
    ray_df = q(SF_DIR)
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    sql_df = con.execute(entrymod.oracle_sql()[name]).df()
    _compare(name, ray_df, sql_df)


ROWS_ONLY = sorted(set(entrymod.queries().keys()) - set(SQL_BACKED))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, ray_session):
    q = entrymod.queries()[name]
    df = q(SF_DIR)
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    assert df is not None
    assert df.shape[1] >= 1
    # determinism: rerun → identical
    df2 = q(SF_DIR)
    if not isinstance(df2, pd.DataFrame):
        df2 = df2.to_pandas()
    pd.testing.assert_frame_equal(df.reset_index(drop=True), df2.reset_index(drop=True))


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    assert len(out) > 0
    assert "url" in out.columns
