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


# ray.get deserializes non-zero-copy objects (dicts!) on EVERY call; a
# broadcast side looked up per batch must be fetched once per worker
# process.  Keyed by object-ref hex.
_BCAST_CACHE: dict = {}


def bget(ref):
    key = ref.hex()
    if key not in _BCAST_CACHE:
        import ray

        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def np_lookup(keys: np.ndarray, sorted_keys: np.ndarray, values: np.ndarray, default):
    """Vectorized hash-join substitute: binary-search ``keys`` against a
    broadcast (sorted_keys, values) pair; misses get ``default``."""
    if sorted_keys.size == 0:
        miss = np.zeros(len(keys), dtype=bool)
        return np.full(len(keys), default), miss
    idx = np.searchsorted(sorted_keys, keys)
    idx = np.clip(idx, 0, len(sorted_keys) - 1)
    hit = sorted_keys[idx] == keys
    out = np.where(hit, values[idx], default)
    return out, hit


#: partial-aggregate outputs at or under this many rows are combined on
#: the driver (one vectorized pandas groupby over a few-MB frame) instead
#: of paying a sort shuffle.  The partial row count is bounded by
#: (blocks x groups-per-block), NOT by input rows, so this is a cheap
#: materialize-and-count decision, Spark-AQE-style; at 100 TB with
#: high-cardinality keys the partials measure big and take the sort path.
GROUP_AGG_DRIVER_COMBINE_MAX_ROWS = 1_000_000


def _agg_fns(keys: list, aggs: dict, count_col: str | None):
    """Build the (partial, combine) pandas kernels shared by
    :func:`group_agg` and :func:`group_agg_ds`."""
    spec = {out: (src, how) for out, (src, how) in aggs.items()}
    for out, (_src, how) in spec.items():
        if how not in ("sum", "min", "max"):
            raise ValueError(f"group_agg: unsupported how={how!r} for {out}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            **{out: (src, how) for out, (src, how) in spec.items()}
        )
        if count_col:
            cnt = (
                df.groupby(keys, as_index=False)
                .size()
                .rename(columns={"size": count_col})
            )
            g = g.merge(cnt, on=keys)
        return g

    # combining partials: sums/counts add, mins/maxes re-min/re-max
    comb_spec = {out: (out, how) for out, (_src, how) in spec.items()}
    if count_col:
        comb_spec[count_col] = (count_col, "sum")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).agg(
            **{o: (c, h) for o, (c, h) in comb_spec.items()}
        )

    return partial, combine


def group_agg(
    ds, keys: list, aggs: dict, count_col: str | None = None
) -> pd.DataFrame:
    """Distributed group-by aggregate that stays fast at HIGH key
    cardinality.  ``aggs``: {out_col: (in_col, how)} with how in
    {sum, min, max}; optional count column.

    Ray Data's built-in ``groupby().aggregate()`` falls into a sort +
    per-group Python reduce on plain map_batches pipelines (measured
    ~2-4 ms per GROUP — 9k groups cost ~20-35 s regardless of row
    count), only switching to vectorized hash aggregation when the plan
    already contains a hash shuffle (e.g. after ``Dataset.join``).
    This helper never depends on the planner: vectorized per-block
    partial aggregation (one partial row per (block, group)), then —
    size-adaptively — either a driver-side pandas combine when the
    measured partial output is small, or a sort shuffle of the partials
    + vectorized per-block combine + an O(result) driver merge for
    groups that straddle sorted-block edges.  The driver holds only
    result-sized data — which the caller returns as a DataFrame anyway.
    RESULT-sized is corpus-sized for dedup shapes: those callers should
    use :func:`group_agg_ds` and keep the output distributed.
    """
    partial, combine = _agg_fns(keys, aggs, count_col)
    part = ds.map_batches(
        partial, batch_format="pandas", batch_size=64 * 1024
    ).materialize()
    if part.count() <= GROUP_AGG_DRIVER_COMBINE_MAX_ROWS:
        return combine(part.to_pandas())
    comb = part.sort(keys).map_batches(
        combine, batch_format="pandas", batch_size=64 * 1024
    )
    return combine(comb.to_pandas())


def group_agg_ds(
    ds, keys: list, aggs: dict, count_col: str | None = None,
    num_buckets: int = 64,
):
    """:func:`group_agg` that returns a **Dataset** (one row per group)
    and never lands the combined frame on the driver — the write-back
    path for result≈corpus shapes (exact dedup, per-document rollups).

    Shuffle shape: vectorized per-block partials, then a bounded
    ``num_buckets``-way hash shuffle on the group key (the same shape
    as minhash_lsh_dedup's bucket shuffle — invariant-7-safe because
    ``groupby(_gb)`` sees ``num_buckets`` groups, not one per key) and
    one vectorized pandas combine per bucket.  Same-key rows always
    hash to the same bucket, so the combine is exact with no
    straddle-merge pass.  At cluster scale set ``num_buckets`` ≈ 2-4×
    total cores."""
    partial, combine = _agg_fns(keys, aggs, count_col)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = partial(df)
        # hash_pandas_object is vectorized and process-stable (fixed
        # siphash key), combining multi-key rows column-wise
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df["_gb"] = (h % num_buckets).astype("int64")
        return df

    def combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return combine(df.drop(columns=["_gb"]))

    part = ds.map_batches(add_bucket, batch_format="pandas", batch_size=64 * 1024)
    return part.groupby("_gb").map_groups(combine_bucket, batch_format="pandas")


def group_sum(
    ds, keys: list, sums: dict, count_col: str | None = None
) -> pd.DataFrame:
    """``group_agg`` with every column summed (``sums``: {out: in})."""
    return group_agg(
        ds, keys, {out: (src, "sum") for out, src in sums.items()}, count_col
    )


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

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cutoff = pa.scalar(pd.Timestamp("1998-09-02")).cast(t["l_shipdate"].type)
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        dp = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        ch = pc.multiply(dp, pc.add(pa.scalar(1.0), t["l_tax"]))
        return t.append_column("disc_price", dp).append_column("charge", ch)

    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=128 * 1024)
    df = group_sum(
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


#: shuffle-join partition count for the fact-side hash joins below;
#: at larger SF this scales with cluster size, not data size per worker
JOIN_PARTS = 8

#: build sides at or under this MEASURED size are broadcast; larger go
#: through the distributed hash join.  Spark-AQE-style adaptive switch:
#: at bench scale the filtered build sides are a few MB and the fixed
#: HashShuffleAggregator actor startup (~3-5 s) dominates, while at
#: 100 TB the same code measures a too-big side and shuffles.
BROADCAST_JOIN_MAX_BYTES = 256 << 20


def sized_inner_join(left, right, left_key: str, right_key: str, join_parts: int = JOIN_PARTS):
    """Inner join with a size-adaptive strategy.

    The build (right) side is computed distributedly and materialized;
    if its measured size fits ``BROADCAST_JOIN_MAX_BYTES`` it is
    broadcast (``ray.put`` once, vectorized searchsorted probe per
    batch — no shuffle), else the materialized side feeds
    ``Dataset.join`` (distributed hash join).  The decision always uses
    the *filtered/projected* side, never a raw fact table.

    Contract: right-side keys are unique (dimension or pre-aggregated
    sides); broadcast-path output columns are the left columns plus the
    right's non-key columns, so callers must not rely on the right key
    column appearing.
    """
    import ray

    mat = right.materialize()
    if mat.size_bytes() > BROADCAST_JOIN_MAX_BYTES:
        return left.join(mat, "inner", join_parts, on=(left_key,), right_on=(right_key,))
    pdf = mat.to_pandas()
    keys = pdf[right_key].to_numpy()
    order = np.argsort(keys, kind="stable")
    val_cols = [c for c in pdf.columns if c != right_key]
    side = {"keys": keys[order]}
    for c in val_cols:
        side[c] = pdf[c].to_numpy()[order]
    ref = ray.put(side)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        s = bget(ref)
        sk = s["keys"]
        if sk.size == 0:
            out = df.iloc[0:0]
            return out.assign(**{c: s[c][:0] for c in val_cols})
        lk = df[left_key].to_numpy()
        idx = np.clip(np.searchsorted(sk, lk), 0, sk.size - 1)
        hit = sk[idx] == lk
        out = df.loc[hit]
        taken = idx[hit]
        return out.assign(**{c: s[c][taken] for c in val_cols})

    return left.map_batches(probe, batch_format="pandas", batch_size=128 * 1024)


def q3_top_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape: the FACT side (orders⋈lineitem) goes through the
    size-adaptive join — broadcast only when the filtered orders side
    MEASURES small, distributed hash join otherwise.  The
    segment-filtered customer KEYS are always broadcast (a filtered
    dimension fits in memory; raw orders/lineitem never touch the
    driver)."""
    import ray

    cutoff = pd.Timestamp("1997-01-01")
    ckeys = np.sort(
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(
                pa.compute.equal(t["c_mktsegment"], "BUILDING")
            ).select(["c_custkey"]),
            batch_format="pyarrow",
        )
        .to_pandas()["c_custkey"]
        .to_numpy()
    )
    ref = ray.put(ckeys)

    def filt_orders(df: pd.DataFrame) -> pd.DataFrame:
        ck = bget(ref)
        _, hit = np_lookup(df["o_custkey"].to_numpy(), ck, ck, -1)
        keep = hit & (df["o_orderdate"] < cutoff).to_numpy()
        return df.loc[keep, ["o_orderkey"]]

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(filt_orders, batch_format="pandas", batch_size=128 * 1024)

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > cutoff]
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        return df.assign(revenue=rev).groupby("l_orderkey", as_index=False)[
            "revenue"
        ].sum()

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_partial, batch_format="pandas", batch_size=128 * 1024)

    j = sized_inner_join(li, orders, "l_orderkey", "o_orderkey")
    agg = group_sum(j, ["l_orderkey"], {"revenue": "revenue"})
    agg["revenue"] = agg["revenue"].round(2)
    agg = agg.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return agg.reset_index(drop=True)


def q5_region_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape: orders⋈customer and lineitem⋈orders through the
    size-adaptive join (measured-small sides broadcast, big sides
    shuffle); only the tiny nation table is unconditionally broadcast.
    No raw fact table is ever materialized on the driver."""
    import ray

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def cust_nation(df: pd.DataFrame) -> pd.DataFrame:
        nm = bget(nref)
        return pd.DataFrame(
            {"c_custkey": df["c_custkey"], "n_name": df["c_nationkey"].map(nm)}
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        cust_nation, batch_format="pandas"
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    ords = sized_inner_join(orders, cust, "o_custkey", "c_custkey").select_columns(
        ["o_orderkey", "n_name"]
    )

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        return df.assign(revenue=rev).groupby("l_orderkey", as_index=False)[
            "revenue"
        ].sum()

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_partial, batch_format="pandas", batch_size=128 * 1024)
    j = sized_inner_join(li, ords, "l_orderkey", "o_orderkey")
    out = group_sum(j, ["n_name"], {"revenue": "revenue"})
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values("n_name").reset_index(drop=True)


def q8_market_share(
    sf_dir: str, region: str = "ASIA", nation: str = "NATION_2"
) -> pd.DataFrame:
    """TPC-H Q8 shape (national market share): among orders placed by
    customers of one REGION, the share of lineitem revenue supplied by
    one NATION, per order year.  The conditional-ratio-after-join-chain
    shape: supplier membership rides the lineitem partial as a
    conditional sum (never a join — supplier is a broadcast dict),
    customer region membership filters through the size-adaptive join
    like q5, and the final year rollup is low-cardinality."""
    import ray

    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    region_nations = set(nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"].astype(int))
    target_nkey = int(nat.loc[nat["n_name"] == nation, "n_nationkey"].iloc[0])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    target_supps = set(
        supp.loc[supp["s_nationkey"] == target_nkey, "s_suppkey"].astype(int)
    )
    rn_ref = ray.put(region_nations)
    ts_ref = ray.put(target_supps)

    def cust_in_region(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["c_nationkey"].isin(bget(rn_ref))
        return df.loc[keep, ["c_custkey"]]

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        cust_in_region, batch_format="pandas"
    )

    def order_year(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"],
                "o_custkey": df["o_custkey"],
                "o_year": df["o_orderdate"].dt.year.astype("int64"),
            }
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(order_year, batch_format="pandas", batch_size=128 * 1024)
    ords = sized_inner_join(orders, cust, "o_custkey", "c_custkey").select_columns(
        ["o_orderkey", "o_year"]
    )

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        tgt = df["l_suppkey"].isin(bget(ts_ref)).to_numpy()
        return (
            pd.DataFrame(
                {
                    "l_orderkey": df["l_orderkey"],
                    "rev": rev,
                    "rev_t": np.where(tgt, rev, 0.0),
                }
            )
            .groupby("l_orderkey", as_index=False)
            .sum()
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pandas", batch_size=128 * 1024)
    j = sized_inner_join(li, ords, "l_orderkey", "o_orderkey")
    out = group_sum(j, ["o_year"], {"rev": "rev", "rev_t": "rev_t"})
    out["mkt_share"] = (out["rev_t"] / out["rev"]).round(6)
    out["rev"] = out["rev"].round(2)
    out = out.drop(columns=["rev_t"]).rename(columns={"rev": "total_rev"})
    out["o_year"] = out["o_year"].astype("int64")
    return out.sort_values("o_year").reset_index(drop=True)


def q_top_customers(sf_dir: str) -> pd.DataFrame:
    """orders groupby custkey → top-20 by spend, joined to names
    (broadcast dimension join)."""
    import ray

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    agg = group_sum(
        ds, ["o_custkey"], {"total_spent": "o_totalprice"}, count_col="n_orders"
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


#: bounded partition count for per-user windowed ops: millions of users
#: must NOT become millions of map_groups pandas frames (~2-4 ms each);
#: instead users are hashed into WINDOW_BUCKETS groups and each bucket
#: runs ONE vectorized pandas pass over all its users.
WINDOW_BUCKETS = 32


def _user_buckets(ds, user_col: str = "user_id"):
    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df["upart"] = (
            (df[user_col].to_numpy().astype(np.uint64) * 2654435761)
            % WINDOW_BUCKETS
        ).astype("int64")
        return df

    return ds.map_batches(add_part, batch_format="pandas").groupby("upart")


def q_user_sessions(sf_dir: str) -> pd.DataFrame:
    """Sessionization (streaming-shaped): per user, a new session starts
    after a >30-minute gap; returns per-user session count + event count.
    Ray: bounded hash(user)-bucket shuffle, one vectorized pandas pass
    per bucket (groupby(user).diff + boolean sum — never one frame per
    user); SQL: window lag/sum."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        gaps = g.groupby("user_id")["ts"].diff().dt.total_seconds().fillna(1e9)
        out = (
            g.assign(new_sess=(gaps > 1800).to_numpy())
            .groupby("user_id", as_index=False)
            .agg(n_sessions=("new_sess", "sum"), n_events=("new_sess", "size"))
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    out = (
        _user_buckets(ds)
        .map_groups(sessions, batch_format="pandas")
        .to_pandas()
    )
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


def q_asof_join(sf_dir: str) -> pd.DataFrame:
    """As-of (latest-timestamp) join — the reference's
    siteNumInlinks-refresh pattern (SpiderColl.cpp:2850-2862): for each
    'purchase' event, the user's most recent prior 'login' event time.
    Ray: per-user merge_asof inside map_groups over ts-sorted groups."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        # one merge_asof(by=user) per BUCKET of users, not per user
        purchases = g.loc[
            g["event_type"] == "purchase", ["event_id", "user_id", "ts"]
        ].sort_values("ts", kind="stable")
        logins = (
            g.loc[g["event_type"] == "login", ["user_id", "ts"]]
            .rename(columns={"ts": "login_ts"})
            .sort_values("login_ts", kind="stable")
        )
        if purchases.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "last_login": pd.Series([], dtype="str"),
                }
            )
        m = pd.merge_asof(
            purchases,
            logins,
            left_on="ts",
            right_on="login_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "user_id": m["user_id"].astype("int64"),
                "last_login": m["login_ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f").fillna(""),
            }
        )

    out = _user_buckets(ds).map_groups(asof, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_range_join(sf_dir: str) -> pd.DataFrame:
    """Range join: bucket event values against a small band table
    (broadcast small side + vectorized pd.cut per batch — no shuffle)."""
    from ray.data.aggregate import Count, Sum

    edges = [-1e18, 50.0, 100.0, 150.0, 200.0, 1e18]
    labels = ["b_lt50", "b50_100", "b100_150", "b150_200", "b200_inf"]

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["band"] = pd.cut(df["value"], bins=edges, labels=labels, right=False).astype(str)
        return df[["band", "value"]]

    ds = _read(sf_dir, "events", columns=["value"]).map_batches(bucket, batch_format="pandas")
    out = (
        ds.groupby("band")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("band").reset_index(drop=True)


def q_window_running(sf_dir: str) -> pd.DataFrame:
    """Windowed running aggregate: per-user cumulative event count and
    running value sum in ts order (groupby(user).map_groups cumsum ↔ SQL
    window SUM() OVER (PARTITION BY ... ORDER BY ts))."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per bucket: sort by (ts, event_id) — within each
        # user the relative order equals the per-user sort — then
        # grouped cumcount/cumsum, which respect row order
        g = g.sort_values(["ts", "event_id"], kind="stable")
        grp = g.groupby("user_id")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": g["user_id"].astype("int64"),
                "running_n": (grp.cumcount() + 1).astype("int64"),
                "running_value": grp["value"].cumsum().round(2),
            }
        )

    out = _user_buckets(ds).map_groups(running, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_cust_without_orders(sf_dir: str, min_total: float = 300_000.0) -> pd.DataFrame:
    """Anti-join: customers per market segment with NO order above
    ``min_total`` (NOT EXISTS).  Scale shape: a distributed LEFT OUTER
    hash join (Dataset.join shuffle) of the customer table against the
    FILTERED orders fact side, then a vectorized null-probe count —
    unmatched customers surface exactly once with a null join key, so
    no distinct pass over the fact side is needed.  (The crawl engine's
    doledb/lock-table anti-joins are the stateful sibling of this
    shape, state/frontier.py.)"""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def mark(t: pa.Table) -> pa.Table:
        # the join drops the right-side key column, so matches carry an
        # explicit marker; unmatched left rows get a null here
        return t.select(["o_custkey"]).append_column(
            "hit", pa.array(np.ones(t.num_rows, dtype=np.int8))
        )

    big = orders.filter(expr=f"o_totalprice > {min_total}").map_batches(
        mark, batch_format="pyarrow"
    )
    j = cust.join(big, "left_outer", JOIN_PARTS, on=("c_custkey",), right_on=("o_custkey",))

    def count_anti(df: pd.DataFrame) -> pd.DataFrame:
        anti = df[df["hit"].isna()]  # unmatched: exactly one row per cust
        g = anti.groupby("c_mktsegment", sort=False).size()
        return pd.DataFrame({"c_mktsegment": g.index, "n": g.to_numpy()})

    parts = j.map_batches(count_anti, batch_format="pandas").to_pandas()
    out = (
        parts.groupby("c_mktsegment", as_index=False)["n"]
        .sum()
        .rename(columns={"n": "n_cust"})
    )
    out["n_cust"] = out["n_cust"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def q13_cust_order_dist(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape (custdist): distribution of customers by order
    count, zero-order customers included.  Scale shape: the orders fact
    pre-aggregates to one (custkey, c_count) row via group_agg_ds
    (bounded hash shuffle, output stays a Dataset — never a driver
    frame), customer LEFT-OUTER joins that result (Dataset.join hash
    shuffle; unmatched customers surface exactly once with a null
    count), and the final distribution is a low-cardinality rollup.
    The filter stands in for Q13's o_comment NOT LIKE (this schema has
    no comment column): urgent orders are excluded."""
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    filt = orders.filter(expr="o_orderpriority != '1-URGENT'")
    counts = group_agg_ds(
        filt, ["o_custkey"], {"_k": ("o_custkey", "min")}, count_col="c_count"
    ).map_batches(
        lambda df: df[["o_custkey", "c_count"]], batch_format="pandas"
    )
    j = cust.join(
        counts, "left_outer", JOIN_PARTS, on=("c_custkey",), right_on=("o_custkey",)
    )

    def dist(df: pd.DataFrame) -> pd.DataFrame:
        cc = df["c_count"].fillna(0).astype("int64")
        g = cc.value_counts()
        return pd.DataFrame(
            {"c_count": g.index.to_numpy(), "n": g.to_numpy()}
        )

    parts = j.map_batches(dist, batch_format="pandas").to_pandas()
    out = (
        parts.groupby("c_count", as_index=False)["n"]
        .sum()
        .rename(columns={"n": "custdist"})
    )
    out["custdist"] = out["custdist"].astype("int64")
    return out.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


def q22_global_sales_opportunity(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape: per-nation count + balance of above-average
    customers with no orders.  Scale shapes: the scalar subquery (avg
    positive balance) is a two-pass broadcast — tiny per-block partial
    (sum, n) rows, one driver scalar, pushed back down as a filter
    constant; the NOT EXISTS is the q_cust_without_orders LEFT-OUTER
    null-probe (unmatched rows appear exactly once).  Groups by
    c_nationkey (this schema has no phone country code)."""
    cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    cust = _read(sf_dir, "customer", columns=cols)

    def bal_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = t.filter(pc.greater(t["c_acctbal"], pa.scalar(0.0)))
        s = pc.sum(f["c_acctbal"]).as_py() or 0.0
        return pa.table(
            {"s": pa.array([s], pa.float64()), "n": pa.array([f.num_rows], pa.int64())}
        )

    parts = cust.map_batches(
        bal_partial, batch_format="pyarrow", batch_size=128 * 1024
    ).to_pandas()
    avg = float(parts["s"].sum()) / max(int(parts["n"].sum()), 1)

    rich = cust.filter(expr=f"c_acctbal > {avg!r}")
    # anti side: urgent orders only (every customer in this schema has
    # SOME order, so the classic "no orders at all" Q22 predicate is
    # degenerate — empty at every sf)
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def mark(t: pa.Table) -> pa.Table:
        return t.select(["o_custkey"]).append_column(
            "hit", pa.array(np.ones(t.num_rows, dtype=np.int8))
        )

    urgent = orders.filter(expr="o_orderpriority == '1-URGENT'").map_batches(
        mark, batch_format="pyarrow"
    )
    j = rich.join(
        urgent,
        "left_outer",
        JOIN_PARTS,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        anti = df[df["hit"].isna()]
        return anti.groupby("c_nationkey", as_index=False).agg(
            numcust=("c_custkey", "size"), totacctbal=("c_acctbal", "sum")
        )

    parts2 = j.map_batches(roll, batch_format="pandas").to_pandas()
    if parts2.empty:  # zero-row datasets lose their schema in to_pandas
        parts2 = pd.DataFrame(
            {"c_nationkey": pd.Series([], dtype="int64"),
             "numcust": pd.Series([], dtype="int64"),
             "totacctbal": pd.Series([], dtype="float64")}
        )
    out = parts2.groupby("c_nationkey", as_index=False).agg(
        numcust=("numcust", "sum"), totacctbal=("totacctbal", "sum")
    )
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = out["totacctbal"].round(2)
    return out.sort_values("c_nationkey").reset_index(drop=True)


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape (top supplier): per-supplier revenue over one
    quarter, then the supplier(s) hitting the global max.  Scale shape:
    Arrow-native filter+project, supplier-cardinality group_sum
    (partial agg per block; suppliers are a dimension, so the combined
    frame is dimension-sized), a driver scalar max, and a broadcast
    dimension probe for the names — no shuffle anywhere."""
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lo = pa.scalar(pd.Timestamp("1996-01-01")).cast(t["l_shipdate"].type)
        hi = pa.scalar(pd.Timestamp("1996-04-01")).cast(t["l_shipdate"].type)
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)
            )
        )
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table({"l_suppkey": t["l_suppkey"], "rev": rev})

    ds = li.map_batches(prep, batch_format="pyarrow", batch_size=128 * 1024)
    per = group_sum(ds, ["l_suppkey"], {"total_revenue": "rev"})
    per["total_revenue"] = per["total_revenue"].round(2)
    top = per[per["total_revenue"] == per["total_revenue"].max()]
    supp = (
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
        .to_pandas()
    )
    out = top.merge(supp, left_on="l_suppkey", right_on="s_suppkey")[
        ["s_suppkey", "s_name", "total_revenue"]
    ]
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return out.sort_values("s_suppkey").reset_index(drop=True)


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#23") -> pd.DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): average yearly
    revenue lost if small-quantity orders of one brand's parts went
    unfilled.  The correlated scalar subquery (per-part avg quantity)
    decorrelates into two passes over the brand's lineitems: a
    dimension probe broadcasts the brand's partkeys (ray.put once),
    pass 1 builds per-part (sum, n) quantity partials (brand-sized
    rollup), the driver folds them into a per-part 0.2*avg threshold
    map which broadcasts back for pass 2's filtered revenue partial.
    Zero shuffles; everything that moves is brand-dimension-sized."""
    import ray

    pk = (
        _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
        .filter(expr=f"p_brand == {brand!r}")
        .to_pandas()["p_partkey"]
        .to_numpy()
    )
    pk_ref = ray.put(set(int(k) for k in pk))
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = bget(pk_ref)
        sub = df[df["l_partkey"].isin(keys)]
        g = sub.groupby("l_partkey", as_index=False).agg(
            s=("l_quantity", "sum"), n=("l_quantity", "size")
        )
        return g

    parts = li.map_batches(qty_partial, batch_format="pandas", batch_size=128 * 1024).to_pandas()
    if parts.empty:
        return pd.DataFrame({"avg_yearly": [None]})
    per = parts.groupby("l_partkey", as_index=False).agg(s=("s", "sum"), n=("n", "sum"))
    thresh = dict(zip(per["l_partkey"], 0.2 * per["s"] / per["n"]))
    th_ref = ray.put(thresh)

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        th = bget(th_ref)
        lim = df["l_partkey"].map(th)
        keep = df["l_quantity"] < lim.fillna(-1.0)
        return pd.DataFrame({"s": [float(df.loc[keep, "l_extendedprice"].sum())]})

    tot = (
        li.map_batches(rev_partial, batch_format="pandas", batch_size=128 * 1024)
        .to_pandas()["s"]
        .sum()
    )
    return pd.DataFrame({"avg_yearly": [round(tot / 7.0, 2)]})


def q16_supplier_variety(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape (grouped COUNT DISTINCT): distinct suppliers
    shipping big-quantity lines of large parts, per (brand, size).
    Scale shape: the part dimension broadcasts ONCE as dense numpy
    arrays indexed by partkey (ray.put; partkeys are dense small
    ints), each lineitem batch maps to (brand, size, suppkey) with a
    per-block dedup, the global dedup is the bounded bucket-hash
    shuffle of group_agg_ds, and the final distinct-count is a
    dimension-sized rollup — the canonical two-level distinct."""
    import ray

    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]
    ).to_pandas()
    npk = int(part["p_partkey"].max()) + 1
    brands = np.zeros(npk, dtype=object)
    brands[part["p_partkey"].to_numpy()] = part["p_brand"].to_numpy()
    sizes = np.zeros(npk, dtype=np.int32)
    sizes[part["p_partkey"].to_numpy()] = part["p_size"].to_numpy()
    dim_ref = ray.put((brands, sizes))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity"])

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        b, s = bget(dim_ref)
        pk = df["l_partkey"].to_numpy()
        keep = (s[pk] >= 42) & (df["l_quantity"].to_numpy() >= 30)
        sub = pd.DataFrame(
            {
                "p_brand": b[pk[keep]],
                "p_size": s[pk[keep]].astype("int64"),
                "l_suppkey": df["l_suppkey"].to_numpy()[keep],
            }
        )
        return sub.drop_duplicates()

    pairs = li.map_batches(probe, batch_format="pandas", batch_size=128 * 1024)
    dedup = group_agg_ds(
        pairs,
        ["p_brand", "p_size", "l_suppkey"],
        {"_one": ("l_suppkey", "min")},
    )

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["p_brand", "p_size"], as_index=False).size()
        return g.rename(columns={"size": "supplier_cnt"})

    parts = dedup.map_batches(cnt, batch_format="pandas").to_pandas()
    # group_agg_ds buckets by the FULL key, so one (brand, size) can
    # straddle buckets: re-sum the per-bucket counts
    out = parts.groupby(["p_brand", "p_size"], as_index=False)["supplier_cnt"].sum()
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return out.sort_values(["p_brand", "p_size"]).reset_index(drop=True)


def q19_discounted_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape (disjunctive predicate probe): revenue over an
    OR of (brand, size-range, quantity-range) conjunctions.  Scale
    shape: part attrs broadcast once as dense partkey-indexed numpy
    arrays; each batch evaluates the whole disjunction as three
    vectorized masks — zero shuffle, zero join."""
    import ray

    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]
    ).to_pandas()
    npk = int(part["p_partkey"].max()) + 1
    brands = np.zeros(npk, dtype=object)
    brands[part["p_partkey"].to_numpy()] = part["p_brand"].to_numpy()
    sizes = np.zeros(npk, dtype=np.int32)
    sizes[part["p_partkey"].to_numpy()] = part["p_size"].to_numpy()
    dim_ref = ray.put((brands, sizes))

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def rev(df: pd.DataFrame) -> pd.DataFrame:
        b, s = bget(dim_ref)
        pk = df["l_partkey"].to_numpy()
        qty = df["l_quantity"].to_numpy()
        bb, ss = b[pk], s[pk]
        m = (
            ((bb == "Brand#12") & (ss >= 1) & (ss <= 5) & (qty >= 1) & (qty <= 11))
            | ((bb == "Brand#23") & (ss >= 1) & (ss <= 10) & (qty >= 10) & (qty <= 20))
            | ((bb == "Brand#34") & (ss >= 1) & (ss <= 15) & (qty >= 20) & (qty <= 30))
        )
        v = (
            df["l_extendedprice"].to_numpy()[m]
            * (1.0 - df["l_discount"].to_numpy()[m])
        ).sum()
        return pd.DataFrame({"s": [float(v)]})

    tot = (
        li.map_batches(rev, batch_format="pandas", batch_size=128 * 1024)
        .to_pandas()["s"]
        .sum()
    )
    return pd.DataFrame({"revenue": [round(tot, 2)]})


def q21_sole_returned_supplier(sf_dir: str, topn: int = 20) -> pd.DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): count, per
    supplier, the multi-supplier orders where THAT supplier returned a
    line (l_returnflag = 'R') and no other supplier on the order did —
    the fact-table self-semi-join + self-anti-join shape (the schema
    has no commit/receipt dates; returnflag stands in for lateness).
    Scale shape: one pass dedups lineitem to (orderkey, suppkey,
    returned) partials, a bounded bucket-hash shuffle on orderkey
    colocates each order (same invariant-7-safe shape as group_agg_ds
    — the groupby sees num_buckets groups, not one per order), the
    per-order semi/anti logic is a vectorized pandas reduction, and
    the per-supplier counts that leave the shuffle are
    dimension-sized."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"])
    nbuckets = 64

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(ret=(df["l_returnflag"] == "R"))
        g = df.groupby(["l_orderkey", "l_suppkey"], as_index=False).agg(
            ret=("ret", "max")
        )
        g["_gb"] = (g["l_orderkey"] % nbuckets).astype("int64")
        return g

    part = li.map_batches(pairs, batch_format="pandas", batch_size=128 * 1024)

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        # blocks may each have seen the same (order, supplier): re-dedup
        g = df.groupby(["l_orderkey", "l_suppkey"], as_index=False).agg(
            ret=("ret", "max")
        )
        st = g.groupby("l_orderkey").agg(
            n_supp=("l_suppkey", "size"), n_ret=("ret", "sum")
        )
        ok = st[(st["n_supp"] >= 2) & (st["n_ret"] == 1)].index
        win = g[g["ret"] & g["l_orderkey"].isin(ok)]
        c = win.groupby("l_suppkey", as_index=False).size()
        return c.rename(columns={"size": "numwait"})

    parts = part.groupby("_gb").map_groups(per_order, batch_format="pandas").to_pandas()
    out = parts.groupby("l_suppkey", as_index=False)["numwait"].sum()
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    out = out.merge(supp, left_on="l_suppkey", right_on="s_suppkey")[
        ["s_suppkey", "s_name", "numwait"]
    ]
    out["numwait"] = out["numwait"].astype("int64")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out = out.sort_values(
        ["numwait", "s_suppkey"], ascending=[False, True]
    ).head(topn)
    return out.reset_index(drop=True)


def q_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic hash-based sampling (seeded sampling at scale must
    be content-derived, not RNG-per-row, so reruns and the oracle
    agree): keep orders where hash-ish of o_orderkey lands in 1/16."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def samp(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["o_orderkey"] * 2654435761) % 16 == 0
        return df[keep]

    out = ds.map_batches(samp, batch_format="pandas").to_pandas()
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_union_distinct(sf_dir: str) -> pd.DataFrame:
    """Union + distinct: customer nations ∪ supplier nations."""
    import ray.data as rd

    c = _read(sf_dir, "customer", columns=["c_nationkey"]).map_batches(
        lambda df: df.rename(columns={"c_nationkey": "nationkey"}),
        batch_format="pandas",
    )
    s = _read(sf_dir, "supplier", columns=["s_nationkey"]).map_batches(
        lambda df: df.rename(columns={"s_nationkey": "nationkey"}),
        batch_format="pandas",
    )
    u = c.union(s)
    vals = sorted(int(v) for v in u.unique("nationkey"))
    return pd.DataFrame({"nationkey": pd.Series(vals, dtype="int64")})


def q_supplier_nation(sf_dir: str) -> pd.DataFrame:
    """supplier ⋈ nation broadcast join + grouped account balance."""
    import ray

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def join(df: pd.DataFrame) -> pd.DataFrame:
        nm = bget(ref)  # once per worker; ray.get re-deserializes dicts
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


def q10_returned_items(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer.

    Scale plan: lineitem partial-aggregates revenue per orderkey inside
    map_batches (only 'R' rows survive the batch); the quarter-filtered
    orders side is measured by ``sized_inner_join`` (broadcast when
    small, distributed hash join otherwise); the customer/nation name
    joins run on the TOP-20 rows only — dimension tables are probed
    with a 20-key mask, never materialized wholesale."""
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1997-07-01")

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_returnflag"] == "R"]
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        return df.assign(revenue=rev).groupby("l_orderkey", as_index=False)[
            "revenue"
        ].sum()

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(li_partial, batch_format="pandas", batch_size=128 * 1024)

    def filt_orders(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)
        return df.loc[keep, ["o_orderkey", "o_custkey"]]

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(filt_orders, batch_format="pandas", batch_size=128 * 1024)

    j = sized_inner_join(li, orders, "l_orderkey", "o_orderkey")
    agg = group_sum(j, ["o_custkey"], {"revenue": "revenue"})
    agg["revenue"] = agg["revenue"].round(2)
    top = (
        agg.sort_values(["revenue", "o_custkey"], ascending=[False, True])
        .head(20)
        .rename(columns={"o_custkey": "c_custkey"})
    )

    karr = np.sort(top["c_custkey"].to_numpy())

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        _, hit = np_lookup(df["c_custkey"].to_numpy(), karr, karr, -1)
        return df.loc[hit]

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
        .map_batches(pick, batch_format="pandas", batch_size=128 * 1024)
        .to_pandas()
    )
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(cust, on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )[["c_custkey", "c_name", "n_name", "revenue"]]
    return out.sort_values(
        ["revenue", "c_custkey"], ascending=[False, True]
    ).reset_index(drop=True)


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.

    Scale plan: the two nation-filtered dimension sides (supplier keys
    -> nation, customer keys -> nation via orders) are broadcast as
    sorted key arrays (each is a nation-filtered slice, not the whole
    dimension); lineitem partial-aggregates (orderkey, supp_nation,
    year) inside map_batches; the orders->cust_nation side goes through
    the size-adaptive join; the final (nation, nation, year) rollup has
    bounded cardinality."""
    import ray

    n1, n2 = "NATION_3", "NATION_8"
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nk = nation.set_index("n_name")["n_nationkey"]
    keys = {int(nk[n1]), int(nk[n2])}
    names = {int(nk[n1]): n1, int(nk[n2]): n2}

    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup["s_nationkey"].isin(keys)]
    s_sorted = np.sort(sup["s_suppkey"].to_numpy())
    s_nat = sup.set_index("s_suppkey").loc[s_sorted, "s_nationkey"].to_numpy()
    sref = ray.put({"keys": s_sorted, "nat": s_nat})

    cus = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    cus = cus[cus["c_nationkey"].isin(keys)]
    c_sorted = np.sort(cus["c_custkey"].to_numpy())
    c_nat = cus.set_index("c_custkey").loc[c_sorted, "c_nationkey"].to_numpy()
    cref = ray.put({"keys": c_sorted, "nat": c_nat})

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = bget(sref)
        nat, hit = np_lookup(df["l_suppkey"].to_numpy(), s["keys"], s["nat"], -1)
        df = df.loc[hit].assign(supp_nat=nat[hit])
        rev = df["l_extendedprice"] * (1 - df["l_discount"])
        df = df.assign(
            revenue=rev, l_year=df["l_shipdate"].dt.year.astype("int64")
        )
        return df.groupby(
            ["l_orderkey", "supp_nat", "l_year"], as_index=False
        )["revenue"].sum()

    li = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    ).map_batches(li_partial, batch_format="pandas", batch_size=128 * 1024)

    def ord_side(df: pd.DataFrame) -> pd.DataFrame:
        c = bget(cref)
        nat, hit = np_lookup(df["o_custkey"].to_numpy(), c["keys"], c["nat"], -1)
        return df.loc[hit, ["o_orderkey"]].assign(cust_nat=nat[hit])

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        ord_side, batch_format="pandas", batch_size=128 * 1024
    )

    j = sized_inner_join(li, orders, "l_orderkey", "o_orderkey")

    def cross_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["supp_nat"] != df["cust_nat"]]

    j = j.map_batches(cross_only, batch_format="pandas", batch_size=128 * 1024)
    agg = group_sum(j, ["supp_nat", "cust_nat", "l_year"], {"revenue": "revenue"})
    agg["revenue"] = agg["revenue"].round(2)
    agg["supp_nation"] = agg["supp_nat"].map(names)
    agg["cust_nation"] = agg["cust_nat"].map(names)
    out = agg[["supp_nation", "cust_nation", "l_year", "revenue"]]
    return out.sort_values(
        ["supp_nation", "cust_nation", "l_year"]
    ).reset_index(drop=True)


def q4_priority_checking(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape: orders per priority with at least one late-shipped
    line (EXISTS semi-join; the reduced schema has no commitdate, so the
    existence predicate is l_shipdate >= the cutoff).

    Scale plan: lineitem is filtered + per-batch-deduped inside
    map_batches, globally deduped by ``group_agg`` (partial dedup per
    block → size-adaptive combine), and the distinct-orderkey side then
    goes through ``sized_inner_join`` — broadcast when it measures
    small, distributed hash join otherwise — so the EXISTS never
    double-counts and the fact table is never re-scanned."""
    import ray.data as rd

    cut = pd.Timestamp("1997-09-01")

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["l_shipdate"] >= cut, ["l_orderkey"]].drop_duplicates()

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]).map_batches(
        filt, batch_format="pandas", batch_size=128 * 1024
    )
    distinct = group_agg(li, ["l_orderkey"], {"_m": ("l_orderkey", "min")})[
        ["l_orderkey"]
    ]
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    j = sized_inner_join(
        orders, rd.from_pandas(distinct), "o_orderkey", "l_orderkey"
    )
    out = group_agg(
        j,
        ["o_orderpriority"],
        {"_m": ("o_orderkey", "min")},
        count_col="order_count",
    )[["o_orderpriority", "order_count"]]
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q12_priority_lines(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape: high/low order-priority line counts per
    l_linestatus for a one-year shipdate window (the reduced schema has
    no l_shipmode; linestatus takes its place as the class column).

    Scale plan: the priority class is a 2-bit derivation joined from
    the orders side; ``sized_inner_join`` picks broadcast vs hash
    shuffle from the measured build side, and the per-class counts
    partial-aggregate inside map_batches before a 2-row combine."""
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
        return df.loc[keep, ["l_orderkey", "l_linestatus"]]

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus", "l_shipdate"]
    ).map_batches(filt, batch_format="pandas", batch_size=128 * 1024)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    j = sized_inner_join(li, orders, "l_orderkey", "o_orderkey")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        high = df["o_orderpriority"].isin(("1-URGENT", "2-HIGH"))
        return pd.DataFrame(
            {
                "l_linestatus": df["l_linestatus"],
                "high_line_count": high.astype("int64"),
                "low_line_count": (~high).astype("int64"),
            }
        )

    classed = j.map_batches(classify, batch_format="pandas", batch_size=128 * 1024)
    out = group_sum(
        classed,
        ["l_linestatus"],
        {"high_line_count": "high_line_count", "low_line_count": "low_line_count"},
    )
    out["high_line_count"] = out["high_line_count"].astype("int64")
    out["low_line_count"] = out["low_line_count"].astype("int64")
    return out.sort_values("l_linestatus").reset_index(drop=True)


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: percentage of revenue from one part type in a
    one-month shipdate window (p_type = 'ECONOMY' stands in for the
    PROMO%% prefix — the reduced schema's types are single words).

    Scale plan: the part side is (p_partkey → is-economy), a
    dimension-sized broadcast probed per batch with ``np_lookup``; the
    two revenue sums partial-aggregate per batch and combine on the
    driver as two scalars — no shuffle at all."""
    import ray

    lo, hi = pd.Timestamp("1997-03-01"), pd.Timestamp("1997-04-01")
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    keys = part["p_partkey"].to_numpy()
    order = np.argsort(keys)
    pref = ray.put(
        {
            "keys": keys[order],
            "eco": (part["p_type"].to_numpy() == "ECONOMY")[order].astype(
                np.float64
            ),
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
        df = df.loc[keep]
        p = bget(pref)
        eco, hit = np_lookup(df["l_partkey"].to_numpy(), p["keys"], p["eco"], 0.0)
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        rev = np.where(hit, rev, 0.0)  # inner-join semantics on misses
        return pd.DataFrame(
            {"eco_rev": [float((rev * eco).sum())], "tot_rev": [float(rev.sum())]}
        )

    parts = (
        _read(
            sf_dir,
            "lineitem",
            columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pandas", batch_size=128 * 1024)
        .to_pandas()
    )
    pct = 100.0 * parts["eco_rev"].sum() / parts["tot_rev"].sum()
    return pd.DataFrame({"promo_revenue_pct": [round(pct, 4)]})


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape: customers with any order whose total quantity
    exceeds the threshold (GROUP BY + HAVING on the fact table, then
    dimension probes).

    Scale plan: per-order quantity sums via ``group_agg`` (vectorized
    partials, size-adaptive combine); the HAVING filter leaves a tiny
    key set, so orders and customer are probed with that set per batch
    (q10's top-K dimension-probe pattern) — dimension tables are never
    joined wholesale."""
    qty_min = 150.0
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    per_order = group_agg(li, ["l_orderkey"], {"total_qty": ("l_quantity", "sum")})
    big = per_order[per_order["total_qty"] > qty_min]
    karr = np.sort(big["l_orderkey"].to_numpy())

    def pick_orders(df: pd.DataFrame) -> pd.DataFrame:
        _, hit = np_lookup(df["o_orderkey"].to_numpy(), karr, karr, -1)
        return df.loc[hit]

    orders = (
        _read(
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
        )
        .map_batches(pick_orders, batch_format="pandas", batch_size=128 * 1024)
        .to_pandas()
    )
    carr = np.sort(orders["o_custkey"].unique())

    def pick_cust(df: pd.DataFrame) -> pd.DataFrame:
        _, hit = np_lookup(df["c_custkey"].to_numpy(), carr, carr, -1)
        return df.loc[hit]

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(pick_cust, batch_format="pandas", batch_size=128 * 1024)
        .to_pandas()
    )
    out = (
        orders.merge(big, left_on="o_orderkey", right_on="l_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")[
            ["c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"]
        ]
    )
    out["total_qty"] = out["total_qty"].round(2)
    return out.sort_values(
        ["o_totalprice", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True],
    ).reset_index(drop=True)
