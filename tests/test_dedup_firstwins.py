"""Round-4 scale-path tests: first-wins dedup without per-group
``head(1)`` (VERDICT r3 item 3) and the duplicate-build-key guard on
broadcast joins (VERDICT r3 item 4 — one-to-many SQL semantics when the
build side is NOT a primary key)."""
import hashlib
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


# ------------------------------------------------ first-wins dedup
def _dedup_ground_truth(df: pd.DataFrame) -> pd.DataFrame:
    h = df["text"].map(lambda x: hashlib.md5(
        (x or "").encode()).hexdigest())
    keep = df.loc[df.assign(__h=h).groupby("__h")["doc_id"].idxmin()]
    return keep.sort_values("doc_id").reset_index(drop=True)


def _dup_corpus(n_rows: int = 30_000, n_distinct: int = 700) -> pd.DataFrame:
    rng = np.random.RandomState(7)
    ids = rng.permutation(n_rows).astype("int64")
    texts = [f"document body {i % n_distinct} with shared content"
             for i in range(n_rows)]
    return pd.DataFrame({"doc_id": ids, "text": texts})


def test_dedup_dataset_first_wins_broadcast(ray_session):
    from text_extraction_system_ray.pipelines.dedup import dedup_dataset
    df = _dup_corpus()
    out = dedup_dataset(
        ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .repartition(8)).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = _dedup_ground_truth(df)
    pd.testing.assert_frame_equal(out, want[out.columns.tolist()])
    assert len(out) == 700


def test_dedup_dataset_first_wins_join_fallback(ray_session, monkeypatch):
    from text_extraction_system_ray.pipelines import dedup
    monkeypatch.setattr(dedup, "DEDUP_WINNER_BROADCAST_LIMIT", 0)
    df = _dup_corpus(4_000, 111)
    out = dedup.dedup_dataset(
        ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .repartition(4)).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = _dedup_ground_truth(df)
    pd.testing.assert_frame_equal(out, want[out.columns.tolist()])
    assert len(out) == 111


def test_dedup_pages_keeps_earliest_crawl(ray_session):
    from text_extraction_system_ray.pipelines.extraction import dedup_pages
    base = pd.Timestamp("2024-01-01")
    rows = []
    for u in range(50):
        for crawl in range(1 + u % 3):
            rows.append((f"https://x.example/{u}",
                         base + pd.Timedelta(hours=10 * crawl + u),
                         b"<p>page</p>", "", "en"))
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                     "lang"])
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    t = pa.table({
        "url": pa.array(df["url"]),
        "warc_ts": pa.array(df["warc_ts"]).cast(pa.timestamp("us")),
        "html": pa.array(df["html"], pa.binary()),
        "text": pa.array(df["text"]), "lang": pa.array(df["lang"])})
    out = dedup_pages(ray.data.from_arrow(t).repartition(4)).to_pandas()
    assert len(out) == 50
    want = df.groupby("url", as_index=False)["warc_ts"].min()
    got = out[["url", "warc_ts"]].sort_values("url").reset_index(drop=True)
    want = want.sort_values("url").reset_index(drop=True)
    got["warc_ts"] = got["warc_ts"].astype("datetime64[us]")
    want["warc_ts"] = want["warc_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want)


# ------------------------------------------------ duplicate build keys
@pytest.fixture(scope="module")
def dupkey_dir(tmp_path_factory):
    """Tables where the broadcast-join BUILD sides carry duplicate keys:
    two orders rows share an orderkey (different priority), two customer
    rows share a custkey (different nation + segment)."""
    d = tmp_path_factory.mktemp("dupkeys")
    for t in TABLES:
        shutil.copy(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))

    orders = pq.read_table(str(d / "orders.parquet"))
    oo = orders.slice(0, 3).to_pandas()
    prios = sorted(set(orders["o_orderpriority"].to_pylist()))
    oo["o_orderpriority"] = [prios[-1], prios[0], prios[-1]]
    oo["o_totalprice"] = 8.8e6        # visible in top-k if mis-joined
    pq.write_table(
        pa.concat_tables([orders, pa.Table.from_pandas(
            oo, schema=orders.schema, preserve_index=False)]),
        str(d / "orders.parquet"))

    cust = pq.read_table(str(d / "customer.parquet"))
    cc = cust.slice(0, 3).to_pandas()
    cc["c_nationkey"] = (cc["c_nationkey"] + 1) % 25
    segs = sorted(set(cust["c_mktsegment"].to_pylist()))
    cc["c_mktsegment"] = [segs[-1], segs[0], segs[-1]]
    pq.write_table(
        pa.concat_tables([cust, pa.Table.from_pandas(
            cc, schema=cust.schema, preserve_index=False)]),
        str(d / "customer.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dupkey_ddb(dupkey_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{dupkey_dir}/{t}.parquet'")
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
    "revenue_by_nation", "lineitem_orders_join", "top_orders_per_segment",
    "orders_customer_left_join",
])
def test_duplicate_build_keys_one_to_many(ray_session, dupkey_dir,
                                          dupkey_ddb, name):
    """With duplicated build keys every broadcast plan must detect the
    non-PK build side and produce DuckDB's one-to-many join answer (the
    pre-guard behavior silently matched each probe to ONE build row)."""
    import __ray_entry__
    got = __ray_entry__.queries()[name](dupkey_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = dupkey_ddb.execute(__ray_entry__.oracle_sql()[name]).fetchdf()
    pd.testing.assert_frame_equal(_norm(got), _norm(want),
                                  check_dtype=False)
