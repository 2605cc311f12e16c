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


def _probe_sorted(keys: np.ndarray, codes: np.ndarray,
                  probe: np.ndarray) -> tuple:
    """Missing-key-safe broadcast-join probe (ADVICE r2): look up each
    ``probe`` key in the sorted ``keys`` array, returning ``(code, ok)``
    where ``ok`` masks probes actually present on the build side.

    A bare ``codes[searchsorted(keys, p)]`` silently reads the wrong
    slot for an absent key (and raises for p > max(keys)); inner-join
    semantics require dropping those rows, which only held before by
    TPC-H referential integrity. Callers filter on ``ok``."""
    idx = np.searchsorted(keys, probe)
    idx_c = np.minimum(idx, len(keys) - 1) if len(keys) else idx
    ok = (idx < len(keys)) & (keys[idx_c] == probe) if len(keys) \
        else np.zeros(len(probe), bool)
    return codes[idx_c], ok


def _sorted_build(keys: np.ndarray, codes: np.ndarray):
    """Sort a broadcast-join build side and flag duplicate keys.

    Duplicate-build-key guard (VERDICT r3 item 4): ``_probe_sorted``
    returns ONE match per probe key — exactly inner-join semantics only
    when the build side is a primary key. A duplicated key silently
    yields one-row-per-probe where SQL gives one-to-many, so every
    broadcast plan checks ``dup`` and falls back to the native
    hash-partitioned ``Dataset.join`` plan when keys aren't unique.
    Returns (sorted_keys, aligned_codes, dup)."""
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    dup = bool((ks[1:] == ks[:-1]).any()) if len(ks) > 1 else False
    return ks, codes[order], dup


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
# customer→nation broadcast is only safe while the mapping fits worker
# heaps comfortably; past this the plan switches to a shuffle join.
BROADCAST_CUST_LIMIT = 5_000_000


def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer ⋈ nation. The genuinely small dim is ``nation``
    (25 rows); ``customer`` is fact-sized, so its custkey→nationkey map
    broadcasts only under a size guard — as two parallel numpy arrays
    (sorted int64 keys + int8 nation codes, ~9 B/customer; r01 shipped a
    dict of customer keys → nation *strings*, a scale-killer flagged in
    VERDICT). Probe = ``np.searchsorted`` per batch, fully vectorized.
    Above the guard the plan degrades to the hash-partitioned
    ``Dataset.join`` on custkey of the pre-aggregated orders side."""
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    n_names = nation.sort_values("n_nationkey")["n_name"].to_numpy()

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])

    use_broadcast = cust.num_rows <= BROADCAST_CUST_LIMIT
    if use_broadcast:
        keys, codes, dup = _sorted_build(
            cust["c_custkey"].to_numpy(),
            cust["c_nationkey"].to_numpy().astype(np.int8))
        use_broadcast = not dup     # duplicate custkey → one-to-many
    if use_broadcast:
        dim_ref = ray.put((keys, codes))

        class JoinAgg:
            def __init__(self):
                self.keys, self.codes = ray.get(dim_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ck = t["o_custkey"].to_numpy()
                nk, ok = _probe_sorted(self.keys, self.codes, ck)
                nk = nk[ok]
                price_c = scaled_int(t["o_totalprice"].to_numpy()[ok], 2)
                g = pd.DataFrame({"nk": nk, "price_c": price_c}) \
                    .groupby("nk", as_index=False) \
                    .agg(price_c=("price_c", "sum"),
                         n_orders=("price_c", "size"))
                return pa.Table.from_pandas(g, preserve_index=False)

        partials = ds.map_batches(JoinAgg, batch_format="pyarrow",
                                  concurrency=(1, 4))
    else:  # shuffle path: pre-aggregate orders by custkey, then join
        def pre(t: pa.Table) -> pa.Table:
            g = pd.DataFrame({
                "o_custkey": t["o_custkey"].to_numpy(),
                "price_c": scaled_int(t["o_totalprice"].to_numpy(), 2)}) \
                .groupby("o_custkey", as_index=False) \
                .agg(price_c=("price_c", "sum"), n_orders=("price_c", "size"))
            return pa.Table.from_pandas(g, preserve_index=False)

        per_cust = ds.map_batches(pre, batch_format="pyarrow") \
            .groupby("o_custkey").aggregate(
                Sum("price_c", alias_name="price_c"),
                Sum("n_orders", alias_name="n_orders"))
        cust_ds = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"])
        joined = per_cust.join(cust_ds, join_type="inner", num_partitions=16,
                               on=("o_custkey",), right_on=("c_custkey",))

        def to_code(t: pa.Table) -> pa.Table:
            return pa.table({"nk": pc.cast(t["c_nationkey"], pa.int8()),
                             "price_c": t["price_c"],
                             "n_orders": t["n_orders"]})

        partials = joined.map_batches(to_code, batch_format="pyarrow")

    out = partials.groupby("nk").aggregate(
        Sum("price_c", alias_name="price_c"),
        Sum("n_orders", alias_name="n_orders")).to_pandas()
    out["n_name"] = n_names[out["nk"].to_numpy()]
    out["revenue"] = out["price_c"] / 100.0
    return out[["n_name", "revenue", "n_orders"]].sort_values("n_name") \
        .reset_index(drop=True)


# ------------------------------------------------------ fact ⋈ fact join
# orderkey→priority broadcast guard: sorted int64 keys + int8 codes is
# 9 B/order; past this the native hash-partitioned join takes over.
BROADCAST_ORDERS_LIMIT = 50_000_000


def lineitem_orders_join(sf_dir: str) -> pd.DataFrame:
    """lineitem ⋈ orders → revenue by priority.

    Default plan: the join key's payload is just ``o_orderpriority`` (5
    distinct values), so the orders side compresses to sorted int64 keys
    + int8 priority codes and broadcasts under a size guard; each
    lineitem batch probes with ``np.searchsorted`` and pre-aggregates to
    5 rows — the whole query is one pass over lineitem with no shuffle
    (VERDICT r01 item 8). Above the guard (or with
    ``force_native=True`` via :func:`lineitem_orders_join_native`) the
    hash-partitioned ``Dataset.join`` runs instead."""
    import pyarrow.parquet as pq
    meta = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata
    if meta.num_rows > BROADCAST_ORDERS_LIMIT:
        return lineitem_orders_join_native(sf_dir)

    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderpriority"])
    prio = orders["o_orderpriority"].to_pandas()
    cats = np.asarray(sorted(prio.unique()))
    keys, codes, dup = _sorted_build(
        orders["o_orderkey"].to_numpy(),
        pd.Categorical(prio, categories=cats).codes.astype(np.int8))
    if dup:                     # duplicate orderkey → one-to-many join
        return lineitem_orders_join_native(sf_dir)
    side_ref = ray.put((keys, codes))

    class ProbeAgg:
        def __init__(self):
            self.keys, self.codes = ray.get(side_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            lk = t["l_orderkey"].to_numpy()
            code, ok = _probe_sorted(self.keys, self.codes, lk)
            code = code[ok]
            rev_c = scaled_int(
                t["l_extendedprice"].to_numpy()[ok]
                * (1.0 - t["l_discount"].to_numpy()[ok]), 6)
            g = pd.DataFrame({"code": code, "rev_c": rev_c}) \
                .groupby("code", as_index=False) \
                .agg(rev_c=("rev_c", "sum"), n_items=("rev_c", "size"))
            return pa.Table.from_pandas(g, preserve_index=False)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    out = li.map_batches(ProbeAgg, batch_format="pyarrow",
                         concurrency=(1, 4)) \
        .groupby("code").aggregate(
            Sum("rev_c", alias_name="rev_c"),
            Sum("n_items", alias_name="n_items")).to_pandas()
    out["o_orderpriority"] = cats[out["code"].to_numpy()]
    out["revenue"] = round_half_up(out["rev_c"] / 1e6, 2)
    return out[["o_orderpriority", "revenue", "n_items"]] \
        .sort_values("o_orderpriority").reset_index(drop=True)


def lineitem_orders_join_native(sf_dir: str) -> pd.DataFrame:
    """Hash-partitioned ``Dataset.join`` of the two fact tables — the
    at-scale plan (and the engine-capability demo of a true fact⋈fact
    shuffle join), with pre-projection on the read and post-join partial
    aggregation."""
    import pyarrow.parquet as pq
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    # partition count sized to the build side (~500k rows/partition):
    # fixed 16 partitions cost ~16 aggregator actors of overhead even on
    # tiny inputs; at scale the count grows with the data
    n_rows = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows
    n_parts = int(min(64, max(2, n_rows // 500_000 + 2)))
    joined = li.join(orders, join_type="inner", num_partitions=n_parts,
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


def events_sessionize(sf_dir: str,
                      bucket_hours: int = 24) -> pd.DataFrame:
    """Session windows (30-min gap) per user — skew-robust two-level
    plan (VERDICT r2 item 10).

    A single ``groupby(user).map_groups`` materializes one user's FULL
    history in one task — fine until a hot key owns millions of events.
    Instead: (1) group by ``(user_hash % P, time_bucket)`` — the
    largest group is bounded by one bucket's share of one hash
    partition, not a user's lifetime — and sessionize ALL users in the
    group with one vectorized pandas pass (per-group Python overhead is
    O(P·buckets), not O(users·buckets)); (2) per-bucket session
    summaries (orders of magnitude fewer rows than events) are stitched
    per hash partition, again vectorized across users — adjacent
    sessions whose boundary gap ≤ 30 min merge, exactly reproducing the
    single-pass result because sessionization is associative under
    time-ordered splits. The second shuffle moves only session
    summaries, never events."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "ts", "value"])
    bucket_ns = int(bucket_hours) * 3_600 * 10**9
    P = 64   # hash partitions: enough parallelism, few enough groups
    gap = pd.Timedelta(minutes=30)

    def add_keys(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.timestamp("ns"))
        b = pc.divide(ts.cast(pa.int64()), bucket_ns)
        t = t.append_column("bucket", pc.cast(b, pa.int64()))
        part = pc.cast(pc.bit_wise_and(t["user_id"], P - 1), pa.int32())
        return t.append_column("part", part)

    def sess_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new = (g["user_id"] != g["user_id"].shift()) | \
            (g["ts"].diff() > gap)
        sid = new.cumsum()
        g["val_c"] = scaled_int(g["value"], 6)
        out = g.groupby(sid.to_numpy(), as_index=False).agg(
            user_id=("user_id", "first"), part=("part", "first"),
            n_events=("event_id", "size"), start_ts=("ts", "min"),
            end_ts=("ts", "max"), val_c=("val_c", "sum"))
        return out

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "start_ts", "end_ts"])
        new = (g["user_id"] != g["user_id"].shift()) | \
            ((g["start_ts"] - g["end_ts"].shift()) > gap)
        sid = new.cumsum()
        out = g.groupby(sid.to_numpy(), as_index=False).agg(
            user_id=("user_id", "first"), n_events=("n_events", "sum"),
            start_ts=("start_ts", "min"), end_ts=("end_ts", "max"),
            val_c=("val_c", "sum"))
        out = out.sort_values(["user_id", "start_ts"])
        out["session_id"] = out.groupby("user_id").cumcount() \
            .astype("int64")
        out["sum_value"] = round_half_up(out["val_c"] / 1e6, 2)
        return out[["user_id", "session_id", "n_events", "start_ts",
                    "end_ts", "sum_value"]]

    partial = ds.map_batches(add_keys, batch_format="pyarrow") \
        .groupby(["part", "bucket"]) \
        .map_groups(sess_partial, batch_format="pandas")
    return partial.groupby("part").map_groups(
        stitch, batch_format="pandas").to_pandas()


# ------------------------------------------------------------- distincts
def segment_counts(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_mktsegment"])
    return ds.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_customers")).to_pandas()


# ---------------------------------------------------------- as-of join
def events_orders_asof(sf_dir: str) -> pd.DataFrame:
    """As-of join (custom operator — Ray Data has none): each event joins
    the most recent order of the same key with o_orderdate <= ts.

    Physical plan: both sides tagged + aligned → union → ``groupby(key)``
    co-partition → ``pd.merge_asof`` per group (ray_guide 'As-of / range
    join'). Ties on (key, date) are pre-reduced to max o_orderkey so the
    result is deterministic on both engines."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "ts", "value"])
    od = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def tag_events(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t["user_id"], "ts": t["ts"],
            "event_id": t["event_id"],
            "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
            "o_totalprice": pa.nulls(t.num_rows, pa.float64()),
            "side": pa.array([0] * t.num_rows, pa.int8())})

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.cast(t["o_custkey"], pa.int64()), "ts": t["o_orderdate"],
            "event_id": pa.nulls(t.num_rows, pa.int64()),
            "o_orderkey": t["o_orderkey"],
            "o_totalprice": t["o_totalprice"],
            "side": pa.array([1] * t.num_rows, pa.int8())})

    both = ev.map_batches(tag_events, batch_format="pyarrow").union(
        od.map_batches(tag_orders, batch_format="pyarrow"))

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0][["k", "ts", "event_id"]].sort_values(
            ["ts", "event_id"])
        right = g[g["side"] == 1][["ts", "o_orderkey", "o_totalprice"]] \
            .sort_values(["ts", "o_orderkey"]) \
            .drop_duplicates("ts", keep="last")
        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_totalprice": pd.Series([], dtype="float64")})
        if left.empty or right.empty:
            return empty
        m = pd.merge_asof(left, right, on="ts", direction="backward")
        m = m.dropna(subset=["o_orderkey"])
        if m.empty:
            return empty
        out = pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["k"].astype("int64"),
            "ts": m["ts"],
            "o_orderkey": m["o_orderkey"].astype("int64"),
            "o_totalprice": round_half_up(m["o_totalprice"], 2)})
        return out

    return both.groupby("k").map_groups(asof, batch_format="pandas") \
        .to_pandas()


# ------------------------------------------------------- semi / anti join
def customers_with_f_orders(sf_dir: str) -> pd.DataFrame:
    """Semi join via broadcast key set (ray_guide 'Semi / anti join'):
    the distinct filtered keys are bounded by the dimension size, so they
    broadcast instead of shuffling the fact table."""
    import pyarrow.parquet as pq
    keys = pq.read_table(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderstatus"])
    key_arr = pc.unique(pc.filter(
        keys["o_custkey"],
        pc.equal(keys["o_orderstatus"], pa.scalar("F"))))
    ref = ray.put(key_arr)

    class Semi:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            # one vectorized hash-probe kernel (pc.is_in), no Python loop
            return t.filter(pc.is_in(t["c_custkey"], value_set=self.keys))

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_name"])
    return ds.map_batches(Semi, batch_format="pyarrow",
                          concurrency=(1, 2)).to_pandas()


def customers_without_big_orders(sf_dir: str, threshold: float = 400000.0) -> pd.DataFrame:
    """Anti join via broadcast key set: customers with NO order above
    ``threshold``."""
    import pyarrow.parquet as pq
    keys = pq.read_table(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    key_arr = pc.unique(pc.filter(
        keys["o_custkey"],
        pc.greater(keys["o_totalprice"], pa.scalar(threshold))))
    ref = ray.put(key_arr)

    class Anti:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.filter(
                pc.invert(pc.is_in(t["c_custkey"], value_set=self.keys)))

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_name"])
    df = ds.map_batches(Anti, batch_format="pyarrow",
                        concurrency=(1, 2)).to_pandas()
    if df.empty:   # Ray drops the schema on an all-filtered dataset
        df = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                           "c_name": pd.Series([], dtype="object")})
    return df


# ---------------------------------------------------------------- set ops
def union_all_keys(sf_dir: str) -> pd.DataFrame:
    """Dataset.union with schema alignment (the reference has no set ops —
    SURVEY §2.6; this is engine capability)."""
    c = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"])
    s = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey"])

    def tag_c(t: pa.Table) -> pa.Table:
        return pa.table({"key": pc.cast(t["c_custkey"], pa.int64()),
                         "src": pa.array(["customer"] * t.num_rows)})

    def tag_s(t: pa.Table) -> pa.Table:
        return pa.table({"key": pc.cast(t["s_suppkey"], pa.int64()),
                         "src": pa.array(["supplier"] * t.num_rows)})

    return c.map_batches(tag_c, batch_format="pyarrow").union(
        s.map_batches(tag_s, batch_format="pyarrow")).to_pandas()


# ------------------------------------------------------ sliding windows
def events_sliding_window(sf_dir: str) -> pd.DataFrame:
    """Sliding 60-min windows every 15 min per event_type.

    No window/range-join primitive exists in Ray Data; each event is
    exploded to its ≤4 covering windows with vectorized int64 timestamp
    arithmetic inside ``map_batches`` (window starts anchored at the
    hour-truncated global min ts, matching the generate_series oracle),
    then partial-aggregated and reduced by ``groupby``."""
    import pyarrow.parquet as pq
    WINDOW_US = 60 * 60 * 1_000_000
    SLIDE_US = 15 * 60 * 1_000_000

    ts_col = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])["ts"]
    lo_us = pc.min(ts_col).cast(pa.int64()).as_py()
    lo_us -= lo_us % (60 * 60 * 1_000_000)      # date_trunc('hour', min ts)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def explode(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ts_us = df["ts"].astype("int64").to_numpy()
        val_c = scaled_int(df["value"], 6)
        etype = df["event_type"].to_numpy()
        base = lo_us + ((ts_us - lo_us) // SLIDE_US) * SLIDE_US
        frames = []
        for k in range(WINDOW_US // SLIDE_US):
            ws = base - k * SLIDE_US
            keep = (ws >= lo_us) & (ts_us < ws + WINDOW_US) & (ts_us >= ws)
            frames.append(pd.DataFrame({
                "event_type": etype[keep],
                "w_start": ws[keep],
                "n_events": 1,
                "val_c": val_c[keep]}))
        out = pd.concat(frames, ignore_index=True)
        g = out.groupby(["event_type", "w_start"], as_index=False).agg(
            n_events=("n_events", "sum"), val_c=("val_c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby(["event_type", "w_start"]).aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("val_c", alias_name="val_c")).to_pandas()
    out["sum_value"] = round_half_up(out["val_c"] / 1e6, 2)
    out["w_start"] = pd.to_datetime(out["w_start"], unit="us")
    return out[["event_type", "w_start", "n_events", "sum_value"]]


# ----------------------------------------------------- grouped quantiles
def order_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-group quantiles (p50/p90/p99 of o_totalprice by
    o_orderpriority) — the distributed-quantile shape that scales.

    A naive ``groupby(key).map_groups(np.quantile)`` ships every row of
    a group to one task (20% of the corpus per group here). Instead the
    value domain is exploited: per-batch (priority, price) value COUNTS
    pre-aggregate in ``map_batches``, the shuffle moves only distinct
    (priority, price, count) rows, and the exact order statistics (with
    linear interpolation, DuckDB ``quantile_cont`` semantics) are
    reconstructed from cumulative counts on the driver — exact answers,
    shuffle bytes proportional to the value-domain size, never the row
    count."""
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({
            "o_orderpriority": t["o_orderpriority"].to_pandas(),
            "price": t["o_totalprice"].to_numpy()}) \
            .groupby(["o_orderpriority", "price"], as_index=False) \
            .agg(cnt=("price", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["o_orderpriority", "price"]).aggregate(
            Sum("cnt", alias_name="cnt")).to_pandas()

    rows = []
    for prio, g in counts.groupby("o_orderpriority"):
        g = g.sort_values("price")
        v = g["price"].to_numpy(np.float64)
        c = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])

        def q_at(q: float) -> float:
            pos = q * (n - 1)
            lo = int(np.floor(pos))
            hi = int(np.ceil(pos))
            # order statistic k lives at the first cum index > k
            v_lo = v[np.searchsorted(cum, lo, side="right")]
            v_hi = v[np.searchsorted(cum, hi, side="right")]
            return float(v_lo + (pos - lo) * (v_hi - v_lo))

        rows.append((prio, round_half_up(q_at(0.5), 4),
                     round_half_up(q_at(0.9), 4),
                     round_half_up(q_at(0.99), 4)))
    return pd.DataFrame(rows, columns=["o_orderpriority", "p50", "p90",
                                       "p99"]) \
        .sort_values("o_orderpriority").reset_index(drop=True)


# ---------------------------------------------------- per-group top-k
def top_orders_per_segment(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k orders by totalprice per customer market segment: the
    broadcast dim join (custkey → int8 segment code) + per-batch
    partial top-k per group + tiny final reduce — no row-count-sized
    shuffle, ties broken by o_orderkey asc like the SQL window."""
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    seg = cust["c_mktsegment"].to_pandas()
    cats = np.asarray(sorted(seg.unique()))
    keys, codes, dup = _sorted_build(
        cust["c_custkey"].to_numpy(),
        pd.Categorical(seg, categories=cats).codes.astype(np.int8))
    if dup or cust.num_rows > BROADCAST_CUST_LIMIT:
        return _top_orders_per_segment_native(sf_dir, k)
    side_ref = ray.put((keys, codes))

    class SegTopK:
        def __init__(self):
            self.keys, self.codes = ray.get(side_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t["o_custkey"].to_numpy()
            code, ok = _probe_sorted(self.keys, self.codes, ck)
            code = code[ok]
            price = t["o_totalprice"].to_numpy()[ok]
            okey = t["o_orderkey"].to_numpy()[ok]
            outs = []
            for c in np.unique(code):
                m = code == c
                o = np.lexsort((okey[m], -price[m]))[:k]
                outs.append(pd.DataFrame({
                    "seg": c, "o_orderkey": okey[m][o],
                    "o_totalprice": price[m][o]}))
            g = pd.concat(outs, ignore_index=True) if outs else \
                pd.DataFrame({"seg": pd.Series([], dtype="int8"),
                              "o_orderkey": pd.Series([], dtype="int64"),
                              "o_totalprice": pd.Series([], dtype="float64")})
            return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    parts = ds.map_batches(SegTopK, batch_format="pyarrow",
                           concurrency=(1, 4)).to_pandas()
    outs = []
    for c, g in parts.groupby("seg"):
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]).head(k)
        outs.append(g)
    out = pd.concat(outs, ignore_index=True)
    out["c_mktsegment"] = cats[out["seg"].to_numpy()]
    return out[["c_mktsegment", "o_orderkey", "o_totalprice"]] \
        .sort_values(["c_mktsegment", "o_totalprice", "o_orderkey"],
                     ascending=[True, False, True]).reset_index(drop=True)


def _top_orders_per_segment_native(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Shuffle-path per-segment top-k (duplicate build keys / above the
    broadcast guard): native hash-partitioned join gives full
    one-to-many semantics, then per-batch partial top-k per segment and
    a tiny driver reduce — SQL window-equivalent on dirty data."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner", num_partitions=16,
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.sort_values(["o_totalprice", "o_orderkey"],
                           ascending=[False, True]) \
            .groupby("c_mktsegment", as_index=False).head(k)
        return pa.Table.from_pandas(
            g[["c_mktsegment", "o_orderkey", "o_totalprice"]],
            preserve_index=False)

    parts = joined.map_batches(partial_topk,
                               batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["o_totalprice", "o_orderkey"],
                            ascending=[False, True]) \
        .groupby("c_mktsegment", as_index=False).head(k)
    return out[["c_mktsegment", "o_orderkey", "o_totalprice"]] \
        .sort_values(["c_mktsegment", "o_totalprice", "o_orderkey"],
                     ascending=[True, False, True]).reset_index(drop=True)


# ------------------------------------------------------ outer joins
def orders_customer_left_join(sf_dir: str) -> pd.DataFrame:
    """Left-outer fact⋈dim join: every order survives; orders whose
    custkey has no customer row get a NULL segment bucketed as
    'UNMATCHED' — the dirty-data shape the missing-key-safe broadcast
    probe enables (``_probe_sorted`` ok-mask routes misses to the null
    bucket instead of dropping or mis-joining them). Aggregated to
    (segment, n_orders, revenue) so the result is compact at any scale;
    the native ``Dataset.join(join_type='left_outer')`` is the shuffle
    fallback above the broadcast guard."""
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    if cust.num_rows > BROADCAST_CUST_LIMIT:
        return _orders_customer_left_join_native(sf_dir)
    seg = cust["c_mktsegment"].to_pandas()
    cats = np.asarray(sorted(seg.unique()))
    keys, codes, dup = _sorted_build(
        cust["c_custkey"].to_numpy(),
        pd.Categorical(seg, categories=cats).codes.astype(np.int8))
    if dup:                     # duplicate custkey → one-to-many join
        return _orders_customer_left_join_native(sf_dir)
    side_ref = ray.put((keys, codes))

    class LeftAgg:
        def __init__(self):
            self.keys, self.codes = ray.get(side_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t["o_custkey"].to_numpy()
            code, ok = _probe_sorted(self.keys, self.codes, ck)
            code = np.where(ok, code.astype(np.int16), -1)  # -1 = miss
            price_c = scaled_int(t["o_totalprice"].to_numpy(), 2)
            g = pd.DataFrame({"code": code, "price_c": price_c}) \
                .groupby("code", as_index=False) \
                .agg(price_c=("price_c", "sum"),
                     n_orders=("price_c", "size"))
            return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])
    out = ds.map_batches(LeftAgg, batch_format="pyarrow",
                         concurrency=(1, 4)) \
        .groupby("code").aggregate(
            Sum("price_c", alias_name="price_c"),
            Sum("n_orders", alias_name="n_orders")).to_pandas()
    segs = np.where(out["code"].to_numpy() >= 0,
                    cats[np.maximum(out["code"].to_numpy(), 0)],
                    "UNMATCHED")
    out["c_mktsegment"] = segs
    out["revenue"] = round_half_up(out["price_c"] / 100.0, 2)
    return out[["c_mktsegment", "n_orders", "revenue"]] \
        .sort_values("c_mktsegment").reset_index(drop=True)


def _orders_customer_left_join_native(sf_dir: str) -> pd.DataFrame:
    """Shuffle-path left-outer join (above the broadcast guard)."""
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="left_outer", num_partitions=16,
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["c_mktsegment"] = df["c_mktsegment"].fillna("UNMATCHED")
        df["price_c"] = scaled_int(df["o_totalprice"], 2)
        g = df.groupby("c_mktsegment", as_index=False).agg(
            price_c=("price_c", "sum"), n_orders=("price_c", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_mktsegment").aggregate(
            Sum("price_c", alias_name="price_c"),
            Sum("n_orders", alias_name="n_orders")).to_pandas()
    out["revenue"] = round_half_up(out["price_c"] / 100.0, 2)
    return out[["c_mktsegment", "n_orders", "revenue"]] \
        .sort_values("c_mktsegment").reset_index(drop=True)


# --------------------------------------------------- window functions
def events_running_total(sf_dir: str) -> pd.DataFrame:
    """Per-user running total over time (SQL ``SUM(value) OVER
    (PARTITION BY user_id ORDER BY ts, event_id)``) plus the event's
    per-user sequence number — the windowed-aggregate custom operator
    (Ray Data has no window functions).

    Physical plan: hash-partition by ``user_id % 64`` (the sessionize
    pattern — O(P) groups, not O(users)); within a partition one
    vectorized pandas pass sorts by (user, ts, event_id) and computes
    grouped cumsum/cumcount for every user at once. Scaling note: a
    single user's full history lands in one group here because a
    running total is a sequential prefix; if one key outgrew a worker,
    the time-bucket + per-bucket-offset stitch used by
    ``events_sessionize`` applies the same way (carry = bucket sums)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_id", "ts", "value"])
    P = 64

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(pc.bit_wise_and(t["user_id"], P - 1), pa.int32())
        return t.append_column("part", part)

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        g["val_c"] = scaled_int(g["value"], 6)
        g["running_c"] = g.groupby("user_id")["val_c"].cumsum()
        g["seq"] = g.groupby("user_id").cumcount().astype("int64") + 1
        g["running_total"] = round_half_up(g["running_c"] / 1e6, 2)
        return g[["user_id", "event_id", "seq", "running_total"]]

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(window, batch_format="pandas") \
        .to_pandas().sort_values(["user_id", "seq"]).reset_index(drop=True)
