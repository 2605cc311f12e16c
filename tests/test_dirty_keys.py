"""Referential-integrity torture tests (VERDICT r2 item 4): broadcast
searchsorted join probes must DROP fact rows whose key is absent from
the build side (inner-join semantics) instead of silently reading a
wrong slot or raising IndexError. TPC-H data has perfect FK integrity,
so these tests plant orphans and compare against DuckDB on the same
dirty tables, via the exact oracle SQL the driver runs."""
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty")
    for t in TABLES:
        shutil.copy(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))

    # lineitem orphans: orderkeys far above AND below the orders range
    li = pq.read_table(str(d / "lineitem.parquet"))
    orphan = li.slice(0, 7).to_pandas()
    okeys = pq.read_table(str(d / "orders.parquet"),
                          columns=["o_orderkey"])["o_orderkey"].to_numpy()
    orphan["l_orderkey"] = np.array(
        [okeys.max() + 10, okeys.max() + 11, okeys.max() + 12,
         -5, -6, okeys.max() + 13, -7], dtype="int64")
    orphan["l_extendedprice"] = 1e6   # big enough to shift revenue if joined
    pq.write_table(
        pa.concat_tables([li, pa.Table.from_pandas(
            orphan, schema=li.schema, preserve_index=False)]),
        str(d / "lineitem.parquet"))

    # orders orphans: custkeys absent from customer
    orders = pq.read_table(str(d / "orders.parquet"))
    oo = orders.slice(0, 5).to_pandas()
    ckeys = pq.read_table(str(d / "customer.parquet"),
                          columns=["c_custkey"])["c_custkey"].to_numpy()
    oo["o_custkey"] = np.array(
        [ckeys.max() + 100, ckeys.max() + 101, -9, -10, ckeys.max() + 102],
        dtype="int64")
    # fresh orderkeys: keep the build side unique (these orphan the
    # customer FK, not the lineitem join)
    oo["o_orderkey"] = okeys.max() + np.arange(100, 105, dtype="int64")
    oo["o_totalprice"] = 9.9e6
    pq.write_table(
        pa.concat_tables([orders, pa.Table.from_pandas(
            oo, schema=orders.schema, preserve_index=False)]),
        str(d / "orders.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dirty_ddb(dirty_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{dirty_dir}/{t}.parquet'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", [
    "revenue_by_nation", "lineitem_orders_join", "lineitem_orders_join_native",
    "top_orders_per_segment", "orders_customer_left_join",
])
def test_orphan_keys_match_inner_join_oracle(ray_session, dirty_dir,
                                             dirty_ddb, name):
    import __ray_entry__
    got = __ray_entry__.queries()[name](dirty_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = dirty_ddb.execute(__ray_entry__.oracle_sql()[name]).fetchdf()
    pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                  check_dtype=False)


def test_left_join_unmatched_bucket(ray_session, dirty_dir, dirty_ddb):
    """Orphan custkeys land in the UNMATCHED bucket (left-outer
    semantics), in BOTH physical plans."""
    from text_extraction_system_ray.pipelines.relational import (
        _orders_customer_left_join_native, orders_customer_left_join)
    got = orders_customer_left_join(dirty_dir)
    assert "UNMATCHED" in set(got["c_mktsegment"])
    assert int(got.loc[got["c_mktsegment"] == "UNMATCHED",
                       "n_orders"].iloc[0]) == 5
    nat = _orders_customer_left_join_native(dirty_dir)
    pd.testing.assert_frame_equal(_norm(got), _norm(nat), check_dtype=False)


def test_sessionize_hot_key_bounded_groups(ray_session, tmp_path):
    """VERDICT r2 item 10: one user owning most of the events must not
    defeat sessionize — the (user, time-bucket) partial stage bounds any
    single group to one bucket's events, and the stitched result equals
    the single-pass oracle."""
    import datetime as dt
    from text_extraction_system_ray.pipelines.relational import (
        events_sessionize)
    rng = np.random.RandomState(3)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # hot user 1: 20k events over 12 days, mixed gaps
    t = base
    for i in range(20_000):
        t += dt.timedelta(seconds=int(rng.choice([20, 40, 2400])))
        rows.append((1, eid, t, float(i % 7))); eid += 1
    # normal users
    for u in range(2, 12):
        t = base
        for i in range(30):
            t += dt.timedelta(minutes=int(rng.randint(1, 90)))
            rows.append((u, eid, t, 1.5)); eid += 1
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    d = tmp_path / "hot"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))

    got = events_sessionize(str(d))
    import __ray_entry__
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{d}/events.parquet'")
    want = con.execute(__ray_entry__.oracle_sql()["events_sessionize"]) \
        .fetchdf()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if str(g[c].dtype).startswith("datetime"):
            g[c] = g[c].astype("datetime64[us]")
            w[c] = w[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(g, w, check_dtype=False)

    # the partial stage groups by (user, 24h bucket): the hot user's
    # largest group is one day's events, far below their 20k total
    day = df["ts"].astype("datetime64[ns]").astype("int64") // (24 * 3600 * 10**9)
    max_group = df.groupby([df["user_id"], day]).size().max()
    assert max_group < 20_000 / 4


def test_quantiles_singleton_and_duplicate_values(ray_session, tmp_path):
    """Quantile reconstruction edge cases: a group with one row (all
    quantiles = that value) and heavy duplicate values split across
    batches (counts must merge before the order statistics)."""
    from text_extraction_system_ray.pipelines.relational import (
        order_price_quantiles)
    rows = [("1-URGENT", 500.0)] + [("2-HIGH", 100.0)] * 40 + \
        [("2-HIGH", 200.0)] * 40 + [("2-HIGH", 300.0)] * 20
    df = pd.DataFrame(rows, columns=["o_orderpriority", "o_totalprice"])
    df["o_orderkey"] = np.arange(len(df))
    df["o_custkey"] = 1
    d = tmp_path / "q"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "orders.parquet"))
    got = order_price_quantiles(str(d))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet'")
    import __ray_entry__
    want = con.execute(__ray_entry__.oracle_sql()["order_price_quantiles"]) \
        .fetchdf()
    pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                  check_dtype=False)
    one = got[got["o_orderpriority"] == "1-URGENT"].iloc[0]
    assert one["p50"] == one["p90"] == one["p99"] == 500.0
