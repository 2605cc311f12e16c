"""Driver-compare harness: every queries() entry runs; SQL-backed entries
match DuckDB exactly (row count, schema names, order-insensitive values) —
the same comparison the external driver performs at sf0.01."""
import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__
    return __ray_entry__


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()   # ray Dataset


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_all_queries_run(entrymod):
    qs = entrymod.queries()
    assert len(qs) >= 24
    for name, fn in qs.items():
        res = _to_df(fn(SF_DIR))
        assert isinstance(res, pd.DataFrame), name
        assert res.shape[1] >= 1, name


@pytest.mark.parametrize("name", [
    "q1_pricing_summary", "revenue_by_nation", "lineitem_orders_join",
    "lineitem_orders_join_native",
    "top_orders", "filter_high_discount", "events_hourly",
    "events_sessionize", "events_sliding_window", "segment_counts", "dedup_exact", "token_count",
    "doc_stats", "quality_score", "ann_cosine_topk", "embedding_neardups",
    "events_orders_asof", "customers_semi_join", "customers_anti_join",
    "union_all_keys",
    # r2 additions
    "dedup_minhash_candidates", "dedup_minhash_neardups",
    "dedup_ngram_jaccard", "realfont_roundtrip",
    "image_metadata_summary", "image_resize_summary",
    "video_frame_sample", "audio_metadata_summary", "curate_corpus",
    # r3 additions: simhash recomputed independently in SQL; ANN recall
    # gates (oracle = the constant bar per query)
    "dedup_simhash", "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_index_topk",
    "fingerprint", "bm25_topk", "stratified_sample",
    "order_price_quantiles", "top_orders_per_segment",
    "orders_customer_left_join", "events_running_total",
    "neardup_clusters",
    # r4 additions: the flagship extraction's CASE-expressible summary
    # and the planted-script language-ID gate
    "extract_pages_summary", "lang_id", "lang_id_planted", "repetition_signals",
    "decontaminate", "pii_redact", "video_metadata",
    "substring_dup_stats", "sequence_packing", "url_stats",
    "json_props_stats", "fix_mojibake", "snapshot_delta", "vocab_topk",
    "text_index_lookup", "lm_quality_score",
    # r4 late additions: training-data curation trio
    "paragraph_dedup", "token_budget_select", "c4_line_filter",
    "image_features_summary", "shard_shuffle", "source_stats",
    "mixture_sample", "curate_pretrain", "corpus_split", "pagerank_topk",
    # r4 web-graph / container / semantic additions
    "link_graph", "outlink_stats", "html_title_extract",
    "warc_source_counts", "semantic_dedup",
    "meta_extract", "anchor_text_stats", "charset_decode", "url_dedup",
    "robots_filter", "jsonld_extract", "crawl_frontier", "warc_http_status",
    "sitemap_census", "hll_distinct", "kmv_source_sketch",
    "kmv_source_overlap", "warc_extract_summary", "office_extract_summary",
    "office_odt_summary", "office_xlsx_summary",
    "cms_heavy_hitters", "gopher_filter", "link_components", "feed_census",
    "weighted_sample",
    "hash_sample_quantiles",
    "bloom_probe", "link_triangles",
])
def test_sql_backed_queries_match(entrymod, ddb, name):
    ray_df = _norm(_to_df(entrymod.queries()[name](SF_DIR)))
    sql_df = _norm(ddb.execute(entrymod.oracle_sql()[name]).fetch_df())
    assert list(ray_df.columns) == list(sql_df.columns), name
    assert len(ray_df) == len(sql_df), (name, len(ray_df), len(sql_df))
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_entry_smoke(entrymod):
    ds = entrymod.entry()
    df = _to_df(ds)
    assert len(df) > 0
    assert {"url", "status", "n_chars", "n_spans"} <= set(df.columns)
    ok = df[df["status"] == "ok"]
    assert (ok["n_chars"] == ok["n_spans"]).all()
