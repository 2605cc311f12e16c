"""Relational operator library over the test star schema.

The reference engine has no relational layer (SURVEY.md §2.4-§2.6: index
lookups, one fan-in, status-list sort/paginate). A general Ray-Data
engine needs the full set, so each query here demonstrates one physical
pattern, scale-first:

- partial (combiner) aggregation inside ``map_batches`` before the
  ``groupby`` shuffle — the pre-aggregate pattern;
- broadcast hash join for small dimensions (``ray.put`` once, probe in
  every batch) — never a shuffle for dim tables;
- native hash-partitioned ``Dataset.join`` for fact⋈fact;
- sort + limit top-k with deterministic tie-breaks;
- sessionization via ``groupby(key).map_groups`` over ts-sorted groups
  (the streaming-window shape).

Every function takes ``sf_dir`` and returns a Dataset / pandas DataFrame;
column names match the DuckDB oracle SQL in ``__ray_entry__.oracle_sql``.
Float aggregates are rounded (2–6 dp) on BOTH sides so value-hash
comparison is stable.
"""
from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .util import round_half_up, scaled_int

_SHIP_CUTOFF = dt.datetime(1998, 9, 2)


# ---------------------------------------------------------------- Q1-style
def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Grouped aggregate with per-batch partial aggregation (combiner)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(_SHIP_CUTOFF)))
        df = t.to_pandas()
        # exact decimal accumulation: per-row fixed-point ints (util.scaled_int)
        df["qty_c"] = scaled_int(df["l_quantity"], 2)
        df["base_c"] = scaled_int(df["l_extendedprice"], 2)
        df["disc_c"] = scaled_int(df["l_extendedprice"] * (1 - df["l_discount"]), 6)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            qty_c=("qty_c", "sum"),
            base_c=("base_c", "sum"),
            disc_c=("disc_c", "sum"),
            count_order=("qty_c", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_c", alias_name="qty_c"),
        Sum("base_c", alias_name="base_c"),
        Sum("disc_c", alias_name="disc_c"),
        Sum("count_order", alias_name="count_order"))
    df = out.to_pandas()
    df["sum_qty"] = df["qty_c"] / 100.0
    df["sum_base_price"] = df["base_c"] / 100.0
    df["sum_disc_price"] = round_half_up(df["disc_c"] / 1e6, 2)
    df["avg_qty"] = round_half_up(df["sum_qty"] / df["count_order"], 4)
    df["avg_price"] = round_half_up(df["sum_base_price"] / df["count_order"], 4)
    return df[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
               "sum_disc_price", "avg_qty", "avg_price", "count_order"]]


# ------------------------------------------------------- broadcast join
def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer ⋈ nation with BROADCAST dimension tables:
    the small side is shipped once via ray.put and probed per batch —
    no shuffle (ray_guide 'Joins and lookups')."""
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey",
                     right_on="n_nationkey")[["c_custkey", "n_name"]]
    dim_ref = ray.put(dict(zip(dim["c_custkey"].to_numpy(),
                               dim["n_name"].to_numpy())))

    class JoinAgg:
        def __init__(self):
            self.lookup = ray.get(dim_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df["n_name"] = df["o_custkey"].map(self.lookup)
            df["price_c"] = scaled_int(df["o_totalprice"], 2)
            g = df.groupby("n_name", as_index=False).agg(
                price_c=("price_c", "sum"),
                n_orders=("price_c", "size"))
            return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])
    partials = ds.map_batches(JoinAgg, batch_format="pyarrow",
                              concurrency=(1, 4))
    out = partials.groupby("n_name").aggregate(
        Sum("price_c", alias_name="price_c"),
        Sum("n_orders", alias_name="n_orders")).to_pandas()
    out["revenue"] = out["price_c"] / 100.0
    return out[["n_name", "revenue", "n_orders"]]


# ------------------------------------------------------ fact ⋈ fact join
def lineitem_orders_join(sf_dir: str) -> pd.DataFrame:
    """Hash-partitioned join of the two fact tables (Dataset.join), with
    pre-projection on the read and post-join partial aggregation."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, join_type="inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["rev_c"] = scaled_int(df["l_extendedprice"] * (1 - df["l_discount"]), 6)
        g = df.groupby("o_orderpriority", as_index=False).agg(
            rev_c=("rev_c", "sum"), n_items=("rev_c", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority").aggregate(
            Sum("rev_c", alias_name="rev_c"),
            Sum("n_items", alias_name="n_items")).to_pandas()
    out["revenue"] = round_half_up(out["rev_c"] / 1e6, 2)
    return out[["o_orderpriority", "revenue", "n_items"]]


# ----------------------------------------------------------- top-k / sort
def top_orders(sf_dir: str) -> pd.DataFrame:
    """Global sort + limit with a deterministic tie-break key."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    top = ds.sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(20)
    df = top.to_pandas()
    df["o_totalprice"] = round_half_up(df["o_totalprice"], 2)
    return df


# ------------------------------------------------------ filter / project
def filter_high_discount(sf_dir: str) -> pd.DataFrame:
    """Vectorized Arrow filter + computed projection (no pandas)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_discount", "l_shipdate"])

    def fn(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.08)),
                    pc.less(t["l_shipdate"], pa.scalar(dt.datetime(1996, 1, 1))))
        t = t.filter(m)
        rev = pc.round(pc.multiply(t["l_extendedprice"],
                                   pc.subtract(pa.scalar(1.0), t["l_discount"])),
                       ndigits=2, round_mode="half_towards_infinity")
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linenumber": t["l_linenumber"],
                         "revenue": rev})

    return ds.map_batches(fn, batch_format="pyarrow").to_pandas()


# -------------------------------------------------------- window / events
def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type (partial agg + groupby)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        df["val_c"] = scaled_int(df["value"], 6)
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("val_c", "size"), val_c=("val_c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hour"]).aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("val_c", alias_name="val_c")).to_pandas()
    out["sum_value"] = round_half_up(out["val_c"] / 1e6, 2)
    return out[["event_type", "hour", "n_events", "sum_value"]]


def events_sessionize(sf_dir: str) -> pd.DataFrame:
    """Session windows (30-min gap) per user: groupby(user).map_groups
    over ts-sorted groups — the streaming-window shape on a batch engine
    (ray_guide 'Streaming-shaped workloads')."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "ts", "value"])

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        g["session_id"] = gap.cumsum().astype("int64")
        g["val_c"] = scaled_int(g["value"], 6)
        out = g.groupby("session_id", as_index=False).agg(
            n_events=("event_id", "size"), start_ts=("ts", "min"),
            end_ts=("ts", "max"), val_c=("val_c", "sum"))
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["sum_value"] = round_half_up(out["val_c"] / 1e6, 2)
        return out.drop(columns=["val_c"])

    return ds.groupby("user_id").map_groups(
        sess, batch_format="pandas").to_pandas()


# ------------------------------------------------------------- distincts
def segment_counts(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_mktsegment"])
    return ds.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_customers")).to_pandas()
