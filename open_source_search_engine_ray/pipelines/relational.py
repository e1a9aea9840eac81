"""SQL-checkable relational pipelines over the driver test tables.

Each function takes ``sf_dir`` and returns a small result (pandas /
Arrow) whose column names match the oracle SQL in __ray_entry__ exactly.
Patterns demonstrated (SURVEY §2 mapped onto the relational tables):

- pruned parquet reads (``columns=[...]``)
- vectorized map_batches (pyarrow compute / pandas) — no per-row Python
- partial aggregation inside map_batches before the (small) groupby
  shuffle
- broadcast hash joins: the small side is ``ray.put`` once and merged
  per batch (never re-shipped per row, never a full shuffle)
- sort / top-k / distinct
- windowed/sessionized processing via groupby().map_groups over
  time-sorted groups

Floats that feed the value-hash comparison are rounded identically on
both sides (ROUND(x, N) in SQL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _read(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _partial_group_sum(ds, keys: list, sums: dict, count_col: str | None = None):
    """map_batches partial aggregation → tiny groupby shuffle.
    ``sums``: {out_col: in_col}; optional count column."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        agg = {out: (src, "sum") for out, src in sums.items()}
        g = df.groupby(keys, as_index=False).agg(**agg)
        if count_col:
            cnt = df.groupby(keys, as_index=False).size().rename(columns={"size": count_col})
            g = g.merge(cnt, on=keys)
        return g

    part = ds.map_batches(partial, batch_format="pandas", batch_size=64 * 1024)
    aggs = [Sum(c, alias_name=c) for c in sums]
    if count_col:
        aggs.append(Sum(count_col, alias_name=count_col))
    return part.groupby(keys).aggregate(*aggs)


# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: filter + wide aggregate over lineitem."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= pd.Timestamp("1998-09-02")]
        df = df.assign(
            disc_price=df["l_extendedprice"] * (1 - df["l_discount"]),
            charge=df["l_extendedprice"] * (1 - df["l_discount"]) * (1 + df["l_tax"]),
        )
        return df

    ds = ds.map_batches(prep, batch_format="pandas", batch_size=128 * 1024)
    out = _partial_group_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": "l_quantity",
            "sum_base_price": "l_extendedprice",
            "sum_disc_price": "disc_price",
            "sum_charge": "charge",
            "sum_disc": "l_discount",
        },
        count_col="count_order",
    )
    df = out.to_pandas()
    df["avg_qty"] = (df["sum_qty"] / df["count_order"]).round(4)
    df["avg_price"] = (df["sum_base_price"] / df["count_order"]).round(4)
    df["avg_disc"] = (df["sum_disc"] / df["count_order"]).round(4)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        df[c] = df[c].round(2)
    df = df.drop(columns=["sum_disc"])
    return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q6_revenue_delta(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: tight filter + single sum (pruned read, pyarrow
    compute filter)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "lineitem", columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def rev(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
                pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1997-01-01"))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.03)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        f = t.filter(m)
        val = pc.sum(pc.multiply(f["l_extendedprice"], f["l_discount"]))
        return pa.table({"partial": pa.array([val.as_py() or 0.0], pa.float64())})

    parts = ds.map_batches(rev, batch_format="pyarrow", batch_size=256 * 1024)
    total = sum(b["partial"][0].as_py() for b in parts.iter_batches(batch_format="pyarrow"))
    return pd.DataFrame({"revenue": [round(total, 2)]})


def q3_top_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape: broadcast join (filtered orders ⋈ customer
    segment) + grouped revenue + top-k."""
    import ray

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keep_cust = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
    cutoff = pd.Timestamp("1997-01-01")
    orders = orders[(orders["o_custkey"].isin(keep_cust)) & (orders["o_orderdate"] < cutoff)]
    odate = dict(zip(orders["o_orderkey"], orders["o_orderdate"]))
    ref = ray.put(odate)

    def join_rev(df: pd.DataFrame) -> pd.DataFrame:
        om = ray.get(ref)
        df = df[df["l_orderkey"].isin(om.keys()) & (df["l_shipdate"] > cutoff)]
        if df.empty:
            return pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"), "revenue": pd.Series([], dtype="float64")})
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        out = df.assign(revenue=rev).groupby("l_orderkey", as_index=False)["revenue"].sum()
        return out

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    ds = ds.map_batches(join_rev, batch_format="pandas", batch_size=128 * 1024)
    from ray.data.aggregate import Sum

    agg = ds.groupby("l_orderkey").aggregate(Sum("revenue", alias_name="revenue")).to_pandas()
    agg["revenue"] = agg["revenue"].round(2)
    agg = agg.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return agg.reset_index(drop=True)


def q5_region_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape: dimension chain region→nation→customer broadcast,
    revenue by nation."""
    import ray

    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).to_pandas()
    dims = (
        cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    )
    cust_nation = dict(zip(dims["c_custkey"], dims["n_name"]))
    order_cust = dict(zip(orders["o_orderkey"], orders["o_custkey"]))
    ref = ray.put((order_cust, cust_nation))

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        oc, cn = ray.get(ref)
        nat = df["l_orderkey"].map(oc).map(cn)
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        out = pd.DataFrame({"n_name": nat, "revenue": rev}).dropna()
        return out.groupby("n_name", as_index=False)["revenue"].sum()

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    ds = ds.map_batches(rev, batch_format="pandas", batch_size=128 * 1024)
    from ray.data.aggregate import Sum

    out = ds.groupby("n_name").aggregate(Sum("revenue", alias_name="revenue")).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values("n_name").reset_index(drop=True)


def q_top_customers(sf_dir: str) -> pd.DataFrame:
    """orders groupby custkey → top-20 by spend, joined to names
    (broadcast dimension join)."""
    import ray
    from ray.data.aggregate import Count, Sum

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    agg = (
        ds.groupby("o_custkey")
        .aggregate(Sum("o_totalprice", alias_name="total_spent"), Count(alias_name="n_orders"))
        .to_pandas()
    )
    agg["total_spent"] = agg["total_spent"].round(2)
    agg = agg.sort_values(["total_spent", "o_custkey"], ascending=[False, True]).head(20)
    names = ray.get(ref)
    agg["c_name"] = agg["o_custkey"].map(names)
    return agg.reset_index(drop=True)


def q_orders_by_priority(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    out = (
        ds.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="total"))
        .to_pandas()
    )
    out["total"] = out["total"].round(2)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_distinct_segments(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "customer", columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": vals})


def q_events_by_type(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = (
        ds.groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["avg_value"] = (out["sum_value"] / out["n"]).round(4)
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_daily(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def day(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].dt.strftime("%Y-%m-%d")
        return (
            df.assign(day=d)
            .groupby("day", as_index=False)
            .agg(n=("value", "size"), sum_value=("value", "sum"))
        )

    part = ds.map_batches(day, batch_format="pandas", batch_size=128 * 1024)
    from ray.data.aggregate import Sum

    out = (
        part.groupby("day")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("day").reset_index(drop=True)


def q_user_sessions(sf_dir: str) -> pd.DataFrame:
    """Sessionization (streaming-shaped): per user, a new session starts
    after a >30-minute gap; returns per-user session count + event count.
    Ray: groupby(user).map_groups over ts-sorted groups; SQL: window
    lag/sum."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gaps = g["ts"].diff().dt.total_seconds().fillna(1e9)
        n_sessions = int((gaps > 1800).sum())
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_sessions": [n_sessions], "n_events": [len(g)]}
        )

    out = ds.groupby("user_id").map_groups(sessions, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_part_type_stats(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Max, Sum

    ds = _read(sf_dir, "part", columns=["p_brand", "p_retailprice", "p_size"])
    out = (
        ds.groupby("p_brand")
        .aggregate(
            Count(alias_name="n"),
            Sum("p_retailprice", alias_name="sum_price"),
            Max("p_size", alias_name="max_size"),
        )
        .to_pandas()
    )
    out["sum_price"] = out["sum_price"].round(2)
    return out.sort_values("p_brand").reset_index(drop=True)


def q_supplier_nation(sf_dir: str) -> pd.DataFrame:
    """supplier ⋈ nation broadcast join + grouped account balance."""
    import ray

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def join(df: pd.DataFrame) -> pd.DataFrame:
        nm = ray.get(ref)
        return df.assign(n_name=df["s_nationkey"].map(nm))

    ds = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
    ds = ds.map_batches(join, batch_format="pandas")
    from ray.data.aggregate import Count, Sum

    out = (
        ds.groupby("n_name")
        .aggregate(Count(alias_name="n_suppliers"), Sum("s_acctbal", alias_name="sum_acctbal"))
        .to_pandas()
    )
    out["sum_acctbal"] = out["sum_acctbal"].round(2)
    return out.sort_values("n_name").reset_index(drop=True)
