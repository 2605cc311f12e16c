"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes every implemented operator/pipeline from SURVEY.md §2
plus the training-data extensions; ``oracle_sql()`` gives the DuckDB
equivalent for each SQL-expressible one (same column names, same rounding
— see ``pipelines/util.round_half_up``).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa

import ray.data

from text_extraction_system_ray.pipelines import ann as _ann
from text_extraction_system_ray.pipelines import curate as _curate
from text_extraction_system_ray.pipelines import decontam as _dec
from text_extraction_system_ray.pipelines import pii as _pii
from text_extraction_system_ray.pipelines import fontcheck as _fontcheck
from text_extraction_system_ray.pipelines import jsonprops as _json
from text_extraction_system_ray.pipelines import lmscore as _lm
from text_extraction_system_ray.pipelines import dedup as _dedup
from text_extraction_system_ray.pipelines import mojibake as _moji
from text_extraction_system_ray.pipelines import budget as _budget
from text_extraction_system_ray.pipelines import linefilter as _lf
from text_extraction_system_ray.pipelines import paradedup as _para
from text_extraction_system_ray.pipelines import curatev2 as _cur2
from text_extraction_system_ray.pipelines import mixture as _mix
from text_extraction_system_ray.pipelines import multimodal as _mm
from text_extraction_system_ray.pipelines import relational as _rel
from text_extraction_system_ray.pipelines import retrieval as _ret
from text_extraction_system_ray.pipelines import shardshuffle as _shard
from text_extraction_system_ray.pipelines import snapshot as _snap
from text_extraction_system_ray.pipelines import sourcestats as _src
from text_extraction_system_ray.pipelines import split as _split
from text_extraction_system_ray.pipelines import pagerank as _pr
from text_extraction_system_ray.pipelines import packing as _pack
from text_extraction_system_ray.pipelines import substr as _substr
from text_extraction_system_ray.pipelines import textindex as _tix
from text_extraction_system_ray.pipelines import textstats as _ts
from text_extraction_system_ray.pipelines import urlstats as _url
from text_extraction_system_ray.pipelines import charset as _charset
from text_extraction_system_ray.pipelines import robots as _robots
from text_extraction_system_ray.pipelines import sketch as _sketch
from text_extraction_system_ray.pipelines import gopher as _gopher
from text_extraction_system_ray.pipelines import urldedup as _urldedup
from text_extraction_system_ray.pipelines import links as _links
from text_extraction_system_ray.pipelines import semdedup as _sem
from text_extraction_system_ray.pipelines.extraction import extract_dataset
from text_extraction_system_ray.sources.pages import synth_pages


# --------------------------------------------------------------- flagship
def _extract_summary(sf_dir: str) -> ray.data.Dataset:
    """Synthesize the Common-Crawl-style pages table from documents, run
    the full extraction pipeline, and summarize per-url (heavy span
    columns reduced to counts for the compare)."""
    ds = synth_pages(sf_dir)
    out = extract_dataset(ds)

    def summarize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "url": t["url"],
            "status": t["status"],
            "kind": t["kind"],
            "language": t["language"],
            "title": t["title"],
            "n_chars": pc.cast(pc.utf8_length(pc.cast(t["text"], pa.large_string())), pa.int64()),
            "n_spans": pc.cast(pc.list_value_length(t["char_spans"]), pa.int64()),
            "n_pages": pc.cast(pc.list_value_length(t["pages"]), pa.int64()),
            "n_paragraphs": pc.cast(pc.list_value_length(t["paragraphs"]), pa.int64()),
            "n_sentences": pc.cast(pc.list_value_length(t["sentences"]), pa.int64()),
            "n_sections": pc.cast(pc.list_value_length(t["sections"]), pa.int64()),
            "n_tables": pc.cast(pc.list_value_length(t["tables"]), pa.int64()),
        })

    return out.map_batches(summarize, batch_format="pyarrow")


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    return _extract_summary("/root/testdata/sf0.001")


def _extract_pages_summary(sf_dir: str) -> ray.data.Dataset:
    """SQL-checkable projection of the FLAGSHIP extraction (VERDICT r3
    item 5): the synthetic pages corpus is pure doc_id arithmetic, so
    for the html/empty families the extracted (status, kind, n_pages,
    n_tables, title) are CASE-expressible — the DuckDB oracle recomputes
    them from documents alone and a wrong parse breaks the hash match.
    PDF rows are excluded (their page count depends on the greedy
    60-char line wrap, not SQL-expressible); the full-corpus rows-only
    check stays in ``extract_pages``."""
    ds = synth_pages(sf_dir)
    out = extract_dataset(ds)

    def summarize(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        ids = np.fromiter((int(u[-8:]) for u in t["url"].to_pylist()),
                          np.int64, t.num_rows)
        t = t.append_column("doc_id", pa.array(ids, pa.int64()))
        t = t.filter(pa.array(ids % 41 != 7))
        return pa.table({
            "doc_id": t["doc_id"],
            "status": t["status"],
            "kind": t["kind"],
            "title": t["title"],
            "n_pages": pc.cast(pc.list_value_length(t["pages"]),
                               pa.int64()),
            "n_tables": pc.cast(pc.list_value_length(t["tables"]),
                                pa.int64()),
        })

    return out.map_batches(summarize, batch_format="pyarrow")


def _office_doc_summary(sf_dir: str, builder_name: str,
                        prefix: str) -> ray.data.Dataset:
    """Office-intake chain, SQL-checkable end-to-end: every document is
    re-packed as a word-processing file (heading 'Doc {id} office' +
    the raw text as one body paragraph) by ``builder_name``
    (build_docx / build_odt), run through the REAL pipeline (zip sniff
    → XML parse → normalize-to-PDF → content-stream extraction), and
    summarized with word/char counts that are wrap-invariant — the
    DuckDB oracle recomputes them from ``documents`` alone, so a broken
    converter, zip reader or PDF round-trip breaks the hash match."""
    from text_extraction_system_ray.extract import extract_row
    from text_extraction_system_ray.functions import office as _office

    builder = getattr(_office, builder_name)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def run(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        n_words, n_nonspace, n_toc, status, kind = [], [], [], [], []
        for doc_id, text in zip(ids, texts):
            payload = builder([(1, f"Doc {doc_id} office"),
                               (0, text or "")])
            row = extract_row(
                f"https://example.org/{prefix}/{doc_id:08d}", payload)
            status.append(row["status"])
            kind.append(row["kind"])
            n_words.append(len(row["text"].split()))
            n_nonspace.append(len("".join(row["text"].split())))
            n_toc.append(len(row["toc"]))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "status": pa.array(status, pa.string()),
            "kind": pa.array(kind, pa.string()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_nonspace": pa.array(n_nonspace, pa.int64()),
            "n_toc": pa.array(n_toc, pa.int64()),
        })

    return ds.map_batches(run, batch_format="pyarrow", batch_size=64)


def _office_extract_summary(sf_dir: str) -> ray.data.Dataset:
    return _office_doc_summary(sf_dir, "build_docx", "off")


def _office_odt_summary(sf_dir: str) -> ray.data.Dataset:
    """Same chain through the ODF parser: text:h heading + text:p
    body, tab/space expansion exercised."""
    return _office_doc_summary(sf_dir, "build_odt", "odt")


def _office_xlsx_summary(sf_dir: str) -> ray.data.Dataset:
    """Spreadsheet intake chain: each document's words packed six per
    row into a real XLSX (shared-strings table exercised — repeated
    words share entries), extracted through normalize-to-PDF; word and
    non-whitespace char counts are packing-invariant."""
    from text_extraction_system_ray.extract import extract_row
    from text_extraction_system_ray.functions.office import build_xlsx

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def run(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        n_words, n_nonspace, status, kind = [], [], [], []
        for doc_id, text in zip(ids, texts):
            words = (text or "").split()
            rows = ([words[i:i + 6] for i in range(0, len(words), 6)]
                    or [["empty"]])
            row = extract_row(f"https://example.org/xls/{doc_id:08d}",
                              build_xlsx(rows))
            status.append(row["status"])
            kind.append(row["kind"])
            n_words.append(len(row["text"].split()))
            n_nonspace.append(len("".join(row["text"].split())))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "status": pa.array(status, pa.string()),
            "kind": pa.array(kind, pa.string()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_nonspace": pa.array(n_nonspace, pa.int64()),
        })

    return ds.map_batches(run, batch_format="pyarrow", batch_size=64)


def _feed_census(sf_dir: str) -> ray.data.Dataset:
    """RSS/Atom chain, SQL-checkable end-to-end: each document becomes
    a spec-valid feed (RSS 2.0 for even doc_ids, Atom for odd) with
    ``1 + doc_id % 5`` items dated ``2021-01-01 + (doc_id*7 + j)``
    days; the REAL parser (ElementTree + RFC 822 / RFC 3339 dates)
    reads it back and the summary is pure doc_id arithmetic — a broken
    date parse or namespace walk breaks the hash."""
    import datetime as _dt

    from text_extraction_system_ray.functions.feeds import (
        build_atom, build_rss, feed_item_day, parse_feed)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    base = _dt.datetime(2021, 1, 1, tzinfo=_dt.timezone.utc)

    def run(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        ftype, n_items, latest, titles = [], [], [], []
        for doc_id in ids:
            # modulo keeps dates inside datetime range at ANY corpus
            # scale (doc_id*7 days would pass year 9999 near 4e5 docs)
            day0 = (doc_id % 100_000) * 7
            items = [(f"Item {j} of {doc_id}",
                      f"https://example.org/doc/{doc_id:08d}?i={j}",
                      base + _dt.timedelta(days=day0 + j))
                     for j in range(1, 2 + doc_id % 5)]
            payload = (build_rss(f"Feed {doc_id}", items)
                       if doc_id % 2 == 0
                       else build_atom(f"Feed {doc_id}", items))
            f = parse_feed(payload)
            ftype.append(f["feed_type"] if f else "")
            n_items.append(len(f["items"]) if f else 0)
            latest.append(max((feed_item_day(ts)
                               for _t, _l, ts in f["items"]),
                              default=-1) if f else -1)
            titles.append(f["title"] if f else "")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "feed_type": pa.array(ftype, pa.string()),
            "title": pa.array(titles, pa.string()),
            "n_items": pa.array(n_items, pa.int64()),
            "latest_day": pa.array(latest, pa.int64()),
        })

    return ds.map_batches(run, batch_format="pyarrow", batch_size=128)


def _sitemap_census(sf_dir: str) -> ray.data.Dataset:
    from text_extraction_system_ray.sources.sitemap import sitemap_census
    return sitemap_census(sf_dir)


def _warc_shards(sf_dir: str) -> list[str]:
    """Materialized .warc.gz shards for ``sf_dir`` (cached under /tmp
    with the same key discipline as ``pages_parquet`` — a fresh mkdtemp
    per query call would leak a shard set every run)."""
    import glob
    import os
    import shutil

    from text_extraction_system_ray.sources.pages import (
        PAGES_FIXTURE_VERSION, pages_parquet, read_pages)
    from text_extraction_system_ray.sources.warc import write_warc

    pages_dir = pages_parquet(sf_dir)
    out = os.path.join("/tmp/tes_ray_warc",
                       os.path.basename(pages_dir)
                       + f"-v{PAGES_FIXTURE_VERSION}")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        tmp = f"{out}.build-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        write_warc(read_pages(pages_dir,
                              columns=["url", "warc_ts", "html"]), tmp)
        open(os.path.join(tmp, "_DONE"), "w").close()
        try:
            os.makedirs(os.path.dirname(out), exist_ok=True)
            os.rename(tmp, out)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(marker):
                shutil.rmtree(out, ignore_errors=True)
                return _warc_shards(sf_dir)
    return sorted(glob.glob(os.path.join(out, "*.warc.gz")))


def _warc_extract_summary(sf_dir: str) -> ray.data.Dataset:
    """Container → flagship, end to end: pages → .warc.gz shards →
    read_warc → the SAME extraction pipeline → the SAME CASE-expressible
    summary as extract_pages_summary. A wrong WARC frame, gzip member
    boundary or payload byte would break the shared oracle."""
    from text_extraction_system_ray.sources.warc import read_warc

    def add_lang(t: pa.Table) -> pa.Table:
        return t.append_column(
            "lang", pa.array([""] * t.num_rows, pa.string()))

    back = read_warc(_warc_shards(sf_dir)).map_batches(
        add_lang, batch_format="pyarrow")
    out = extract_dataset(back)

    def summarize(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        ids = np.fromiter((int(u[-8:]) for u in t["url"].to_pylist()),
                          np.int64, t.num_rows)
        t = t.append_column("doc_id", pa.array(ids, pa.int64()))
        t = t.filter(pa.array(ids % 41 != 7))
        return pa.table({
            "doc_id": t["doc_id"],
            "status": t["status"],
            "kind": t["kind"],
            "title": t["title"],
            "n_pages": pc.cast(pc.list_value_length(t["pages"]),
                               pa.int64()),
            "n_tables": pc.cast(pc.list_value_length(t["tables"]),
                                pa.int64()),
        })

    return out.map_batches(summarize, batch_format="pyarrow")


def _warc_http_status(sf_dir: str) -> ray.data.Dataset:
    from text_extraction_system_ray.sources.warc import http_status_census
    return http_status_census(sf_dir)


def _warc_source_counts(sf_dir: str) -> ray.data.Dataset:
    """Pages → .warc.gz shards (one gzip member per record) → parse back
    → per-source census. The read side sees ONLY the container bytes, so
    a wrong WARC header/Content-Length/gzip-member boundary breaks the
    count/kind columns; exact payload byte-equality is pinned in
    tests/test_warc.py."""
    from text_extraction_system_ray.sources.warc import read_warc

    ds = read_warc(_warc_shards(sf_dir))

    def census(t: pa.Table) -> pa.Table:
        import numpy as np
        urls = t.column("url").to_pylist()
        payloads = t.column("html").to_pylist()
        src = [u.rsplit("/", 2)[-2] for u in urls]
        ids = np.fromiter((int(u[-8:]) for u in urls), np.int64, len(urls))
        empty = np.fromiter((len(p) == 0 for p in payloads), bool, len(urls))
        pdf = np.fromiter((p[:5] == b"%PDF-" for p in payloads), bool, len(urls))
        return pa.table({
            "source": pa.array(src, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "is_empty": pa.array(empty.astype(np.int64), pa.int64()),
            "is_pdf": pa.array(pdf.astype(np.int64), pa.int64()),
        })

    rows = ds.map_batches(census, batch_format="pyarrow")
    agg = rows.groupby("source").aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Min("doc_id"),
        ray.data.aggregate.Max("doc_id"),
        ray.data.aggregate.Sum("is_empty"),
        ray.data.aggregate.Sum("is_pdf"),
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t.column("source"),
            "n_pages": t.column("count()").cast(pa.int64()),
            "min_doc_id": t.column("min(doc_id)").cast(pa.int64()),
            "max_doc_id": t.column("max(doc_id)").cast(pa.int64()),
            "n_empty": t.column("sum(is_empty)").cast(pa.int64()),
            "n_pdf": t.column("sum(is_pdf)").cast(pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------- queries
def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # relational core (SQL-checked)
        "q1_pricing_summary": _rel.q1_pricing_summary,
        "revenue_by_nation": _rel.revenue_by_nation,
        "lineitem_orders_join": _rel.lineitem_orders_join,
        "lineitem_orders_join_native": _rel.lineitem_orders_join_native,
        "top_orders": _rel.top_orders,
        "filter_high_discount": _rel.filter_high_discount,
        "events_hourly": _rel.events_hourly,
        "events_sessionize": _rel.events_sessionize,
        "events_sliding_window": _rel.events_sliding_window,
        "segment_counts": _rel.segment_counts,
        "events_orders_asof": _rel.events_orders_asof,
        "customers_semi_join": _rel.customers_with_f_orders,
        "customers_anti_join": _rel.customers_without_big_orders,
        "union_all_keys": _rel.union_all_keys,
        "order_price_quantiles": _rel.order_price_quantiles,
        "top_orders_per_segment": _rel.top_orders_per_segment,
        "orders_customer_left_join": _rel.orders_customer_left_join,
        "events_running_total": _rel.events_running_total,
        # dedup family
        "dedup_exact": _dedup.exact_dedup,                  # SQL-checked
        "dedup_minhash_candidates": _dedup.minhash_candidates,
        "dedup_minhash_neardups": _dedup.minhash_neardups,
        # SQL-checked end-to-end: the md5-low64 token hash makes the
        # simhash itself DuckDB-computable, so the oracle independently
        # recomputes signatures AND the full Hamming<=3 pair set
        "dedup_simhash": _dedup.simhash_neardups,
        "dedup_ngram_jaccard": _dedup.ngram_jaccard_pairs,
        # exact-substring (window) dedup signal, Lee et al. 2022 style:
        # first-occurrence-wins over word-5-gram windows; SQL-checked
        # (oracle recomputes via ROW_NUMBER over gram text)
        "substring_dup_stats": _substr.substring_dup_stats,
        # GPT-style sequence packing: distributed prefix scan (bucketed
        # two-level cumsum) → per-doc global offset + sequence extent;
        # SQL-checked against a window-function recomputation
        "sequence_packing": _pack.pack_sequences,
        # URL curation signals: vectorized RFC-3986 parse (Arrow RE2)
        # over deterministic synth URLs; oracle re-parses with DuckDB's
        # own regex/string machinery — the parse is value-checked
        "url_stats": _url.url_stats,
        # JSON sidecar-field extraction + per-type aggregate (real
        # json.loads in the engine, DuckDB json_extract in the oracle)
        "json_props_stats": _json.json_props_stats,
        # ftfy-style mojibake repair: real cp1252↔utf-8 codec
        # round-trip on signature rows; oracle reconstructs both the
        # corruption and the repair from documents.text
        "fix_mojibake": _moji.fix_mojibake,
        # incremental crawl curation: content-hash anti-join of the new
        # snapshot against the old (broadcast + partitioned plans)
        "snapshot_delta": _snap.snapshot_delta,
        # corpus vocabulary top-k: per-batch combiners → term-partition
        # vectorized sums → partition candidates → driver merge
        "vocab_topk": _ts.vocab_topk,
        # inverted text index: term-partitioned posting lists on disk,
        # lookups read only the query terms' partitions (IVF-index
        # analog for retrieval); conjunctive match, tf-summed
        "text_index_lookup": _tix.text_index_lookup,
        # CCNet-lite LM quality score: corpus-trained char-trigram LM
        # (bounded vocab → broadcast), per-doc mean log-probability
        "lm_quality_score": _lm.lm_quality_score,
        # flagship composition #2: pretraining prep — C4 line filter →
        # paragraph-dedup share rule → mixture resample (rates from
        # the SURVIVORS) → token budget; one SQL oracle end-to-end
        "curate_pretrain": _cur2.curate_pretrain,
        # domain-mixture resampling (DoReMi-lite): per-domain
        # acceptance rates from observed vs uniform-target shares,
        # deterministic md5 acceptance filter; SQL-checked
        "mixture_sample": _mix.mixture_sample,
        # per-source corpus mixture dashboard (docs/tokens/mean
        # quality/language spread per source); scaled-int quality sum
        # so the 4-decimal mean is order-independent; SQL-checked
        "source_stats": _src.source_stats,
        # deterministic train/val/test split manifest (md5 90/5/5 rule,
        # per-(split,lang) doc/token/char totals via per-batch
        # combiners — a few dozen partial rows shuffle per block);
        # SQL-checked
        "corpus_split": _split.corpus_split,
        # distributed PageRank (iterative op class) over the planted
        # link graph: exact-integer fixed point — broadcast rank
        # vector, per-batch combined contributions, one tiny
        # groupby(dst) shuffle per iteration; SQL-checked against an
        # unrolled 10-iteration CTE chain
        "pagerank_topk": _pr.pagerank_topk,
        # deterministic training-shard shuffle: md5-keyed permutation
        # → (shard, pos) layout; payload-free ranking via the same
        # two-level scan; SQL-checked vs one window function
        "shard_shuffle": _shard.shard_shuffle,
        # C4-style line filtering (terminal-punct / min-words /
        # javascript / lorem-ipsum rules over planted line structure):
        # shuffle-free vectorized map; SQL-checked
        "c4_line_filter": _lf.c4_line_filter,
        # paragraph-level exact dedup (CCNet/C4 boilerplate removal):
        # corpus-wide first-occurrence-wins over planted paragraph
        # structure; one 24-byte-row shuffle, SQL-checked incl. an
        # order-insensitive checksum pinning WHICH occurrences won
        "paragraph_dedup": _para.paragraph_dedup,
        # token-budget corpus selection: highest-quality docs until a
        # global token budget (two-level quality-keyed prefix scan with
        # budget-pruned shuffle); SQL-checked vs one window function
        "token_budget_select": _budget.token_budget_select,
        # text analysis (token/stats/quality/fingerprint SQL-checked)
        "token_count": _ts.token_count,
        "doc_stats": _ts.doc_stats,
        "quality_score": _ts.quality_score,
        "repetition_signals": _ts.repetition_signals,
        "lang_id": _ts.lang_id,
        "fingerprint": _ts.fingerprint,
        # benchmark decontamination (broadcast eval-gram semi-join),
        # SQL-checked: the oracle joins on gram strings, the engine on
        # their md5-low64 hashes
        "decontaminate": _dec.decontaminate,
        # PII scrub (planted emails/IPs/phones; counts + redacted-text
        # digest SQL-checked — engine ``re`` and oracle RE2 run the
        # same RE2-compatible patterns)
        "pii_redact": _pii.pii_redact,
        # retrieval / corpus shaping (both SQL-checked)
        "bm25_topk": _ret.bm25_topk,
        "stratified_sample": _ret.stratified_sample,
        # similarity search
        "ann_cosine_topk": _ann.cosine_topk,                # SQL-checked
        # approximate methods emit per-query recall-vs-exact floored at
        # the bar (oracle = the constant bar), so the driver hash-match
        # IS the recall gate (VERDICT r2 item 3); raw top-k rows remain
        # the library API (ann.lsh_cosine_topk etc.) and stay
        # recall-pinned in pytest
        "ann_lsh_topk": _ann.lsh_recall_vs_exact,
        "ann_ivf_topk": _ann.ivf_recall_vs_exact,
        "ann_ivf_index_topk": _ann.ivf_index_recall_vs_exact,
        "embedding_neardups": _ann.embedding_neardup_pairs,  # SQL-checked
        # multimodal plumbing (deterministic fake codecs, real dataflow;
        # the *_summary projections are SQL-checked against doc_id
        # arithmetic, pinning the binary→decode dataflow by value)
        "image_metadata": _mm.image_metadata,
        "image_metadata_summary": _mm.image_metadata_summary,
        "image_resize_summary": _mm.image_resize_summary,
        "image_features": _mm.image_features,
        # SQL-checked projection of the feature pipeline: histogram
        # invariants on every row + exact mean/argmax on the planted
        # constant-PNG rows (real PNG decode → feature kernel)
        "image_features_summary": _mm.image_features_summary,
        "video_frame_sample": _mm.video_frame_sample,
        # real AVI/MJPEG container metadata (RIFF parse on the planted
        # doc_id%11==5 rows; every field is doc_id arithmetic)
        "video_metadata": _mm.video_metadata,
        "audio_metadata_summary": _mm.audio_metadata_summary,
        # real-font PDF decode round-trip (Widths/ToUnicode/filters;
        # oracle = the SOURCE text, so the decode path is SQL-checked)
        "realfont_roundtrip": _fontcheck.realfont_roundtrip,
        # flagship C4-style curation composition (quality gate → exact
        # dedup → near-dup removal), SQL-checked end-to-end
        "curate_corpus": _curate.curate_corpus,
        # transitive near-dup clustering: union-find over the EXACT
        # Jaccard pair set (distributed gram-inverted-index — zero LSH
        # false negatives, so the recursive-CTE oracle parity claim is
        # unconditional; ADVICE r3). The minhash-fed variant remains the
        # approximate-at-scale library path, pinned equal in pytest.
        "neardup_clusters": lambda sf: _curate.neardup_clusters(
            _dedup.exact_jaccard_pairs(sf, threshold=0.6)),
        # flagship extraction (non-SQL: DOM/PDF parse + segmentation)
        "extract_pages": _extract_summary,
        # SQL-checked projection of the flagship: html/empty families'
        # summary is doc_id arithmetic (PDF page counts excluded)
        "extract_pages_summary": _extract_pages_summary,
        # planted-script language-ID gate: transliterated docs must
        # classify to the script's language (doc_id arithmetic oracle)
        "lang_id_planted": _ts.lang_id_planted,
        # link-graph extraction over the pages corpus: the planted
        # related-links nav is parsed out of the raw HTML payload for
        # real; the oracle regenerates the exact edge set (doc_id
        # arithmetic with a lateral series join)
        "link_graph": _links.link_graph,
        "outlink_stats": _links.outlink_stats,
        # per-row STRING parity: the value hash covers the title bytes
        "html_title_extract": _links.html_title_extract,
        # WARC container round-trip: synth pages → .warc.gz shards
        # (ISO 28500, per-record gzip members) → parse back → per-source
        # corpus census; payload byte-equality is pinned in pytest
        "warc_source_counts": _warc_source_counts,
        # SemDedup-style semantic dedup (cluster → in-cluster prune),
        # integer-exact end to end so the oracle is bit-for-bit
        "semantic_dedup": _sem.semantic_dedup,
        # head-metadata extraction: per-row string parity on
        # (description, canonical) — attr-order-insensitive parse
        "meta_extract": _links.meta_extract,
        # anchor-text mining: pair combiner → two standard hash
        # aggregates (no per-tiny-group Python)
        "anchor_text_stats": _links.anchor_text_stats,
        # charset sniff + decode (BOM > meta prescan > utf-8; the utf-16
        # fixtures carry a lying meta to prove precedence)
        "charset_decode": _charset.charset_decode,
        # URL-canonicalization dedup (frontier hygiene): vectorized
        # N1-N5 normalization, one groupby on the normalized string
        "url_dedup": _urldedup.url_dedup,
        # schema.org JSON-LD extraction: script-block scan + stdlib JSON
        # parse; per-row parity on string AND integer fields
        "jsonld_extract": _links.jsonld_extract,
        # frontier composition: canonicalize → dedup → RFC 9309 gate
        # (matched on path+query) → per-source census
        "crawl_frontier": _urldedup.crawl_frontier,
        # graph analytics #2: transitive triangles via the standard
        # wedge-build + close plan (two hash-partitioned Dataset.joins)
        "link_triangles": _links.link_triangles,
        # weakly-connected components: guarded driver union-find /
        # distributed min-label propagation (no driver label vector)
        "link_components": _links.link_components,
        # HTTP status-line parse through real WARC record bytes
        "warc_http_status": _warc_http_status,
        # container → flagship: WARC shards feed the extraction pipeline
        # and must reproduce extract_pages_summary's oracle exactly
        "warc_extract_summary": _warc_extract_summary,
        # office intake: every doc re-packed as DOCX → zip sniff →
        # OOXML parse → normalize-to-PDF → extraction, wrap-invariant
        # word/char/toc counts vs a pure-arithmetic oracle
        "office_extract_summary": _office_extract_summary,
        "office_odt_summary": _office_odt_summary,
        "office_xlsx_summary": _office_xlsx_summary,
        # sitemaps.org protocol: build gz urlsets per source, parse them
        # back, census what the PARSER read (loc + lastmod grammar)
        "sitemap_census": _sitemap_census,
        # RSS 2.0 / Atom feeds parsed by the real ElementTree chain
        "feed_census": _feed_census,
        # HyperLogLog distinct-count sketch: per-batch register
        # combiners → one groupby-max → 1024-row driver finish; the
        # whole sketch is integer-exact and oracle-reproducible
        "hll_distinct": _sketch.hll_distinct_text,
        # Count-Min heavy hitters: 64 KiB counter matrix regardless of
        # corpus size; integer-exact, oracle rebuilds it bit-for-bit
        "cms_heavy_hitters": _sketch.cms_heavy_hitters,
        # Gopher document-quality rules, integerized thresholds
        "gopher_filter": _gopher.gopher_filter,
        # weight-biased bottom-k corpus sample, integer-exact keys
        "weighted_sample": _sketch.weighted_sample,
        # KMV/theta sketches over per-source VOCABULARY: k-min partials
        # per batch, tiny driver finish; set ops on sketches (the theta
        # intersection sample) — exactly reproducible via ROW_NUMBER<=k
        "kmv_source_sketch": _sketch.kmv_source_sketch,
        "kmv_source_overlap": _sketch.kmv_source_overlap,
        # quantile estimation from a deterministic hash-bottom-k
        # uniform sample ((hash → min value) dedup makes the sample a
        # pure function of the data — the fixture has duplicate keys)
        "hash_sample_quantiles": _sketch.hash_sample_quantiles,
        # bloom membership index: distinct set-bit shuffle → broadcast
        # bitmap → vectorized probes; the BIT ARRAY (false positives
        # included) reproduces exactly in SQL
        "bloom_probe": _sketch.bloom_probe,
        # RFC 9309 robots.txt evaluation: from-scratch parser (grouped
        # records, wildcard/$ rules, longest-match + allow-tie,
        # most-specific agent group), broadcast compiled rules,
        # vectorized per-rule regex verdicts
        "robots_filter": _robots.robots_filter,
    }


# ------------------------------------------------------------- oracle SQL
_STOP_SQL = "'the','a','of','and','to','in','is','for','on','with'"

# exact word-3-gram Jaccard over documents — the ground truth the MinHash
# family is graded against (tokenization mirrors Python str.split():
# whitespace runs, empties dropped; <3-token docs form one gram)
_JACCARD_PAIRS_SQL = """
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS w
        FROM documents
    ), g AS (
        SELECT doc_id,
               CASE WHEN len(w) = 0 THEN []::VARCHAR[]
                    WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_transform(range(1, len(w) - 1),
                           i -> array_to_string(list_slice(w, i, i + 2), ' '))
               END AS grams
        FROM tok
    ), gr AS (
        SELECT DISTINCT doc_id, unnest(grams) AS gram FROM g
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM gr GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM gr a JOIN gr b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT {select}
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i * 1.0 / (sa.n + sb.n - i) >= {threshold}
"""

def _pagerank_sql(iters: int = 10, k: int = 20) -> str:
    """Unrolled exact-integer PageRank: one CTE per iteration, same
    floor-division recurrence as the engine (pipelines/pagerank.py) —
    integer sums commute, so the two sides cannot diverge."""
    parts = [
        "nn AS (SELECT count(*) AS n FROM documents)",
        """e AS (
            SELECT d.doc_id AS src, CAST(1 + d.doc_id % 4 AS BIGINT) AS deg,
                   (d.doc_id * 31 + 17 + s.j * 7919)
                       % (SELECT n FROM nn) AS dst
            FROM documents d, (SELECT unnest([0,1,2,3]) AS j) s
            WHERE s.j < 1 + d.doc_id % 4)""",
        "r0 AS (SELECT doc_id AS node, CAST(1000000000 AS BIGINT) AS r "
        "FROM documents)"]
    for i in range(1, iters + 1):
        parts.append(f"""r{i} AS (
            SELECT d.doc_id AS node,
                   CAST(150000000 + (85 * COALESCE(s.tot, 0)) // 100
                        AS BIGINT) AS r
            FROM documents d LEFT JOIN (
                SELECT e.dst AS node, SUM(p.r // e.deg) AS tot
                FROM e JOIN r{i - 1} p ON p.node = e.src
                GROUP BY e.dst) s ON s.node = d.doc_id)""")
    return ("WITH " + ",\n".join(parts) +
            f"\nSELECT node AS doc_id, r AS rank_units FROM r{iters} "
            f"ORDER BY r DESC, node LIMIT {k}")


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            -- decimal accumulation mirrors the engine's exact scaled-int sums
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6)
                                       AS DECIMAL(24,6))) AS DOUBLE), 2)       AS sum_disc_price,
                   ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                         / COUNT(*), 4)                                        AS avg_qty,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                         / COUNT(*), 4)                                        AS avg_price,
                   COUNT(*)                                                    AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*)                                                 AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "lineitem_orders_join": """
            SELECT o_orderpriority,
                   ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6)
                                       AS DECIMAL(24,6))) AS DOUBLE), 2) AS revenue,
                   COUNT(*)                                              AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "top_orders": """
            SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice,
                   o_orderdate
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 20
        """,
        "filter_high_discount": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(l_extendedprice * (1 - l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_discount >= 0.08 AND l_shipdate < TIMESTAMP '1996-01-01'
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n_events,
                   ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(24,6))) AS DOUBLE), 2) AS sum_value
            FROM events
            GROUP BY event_type, date_trunc('hour', ts)
        """,
        "events_sessionize": """
            WITH marked AS (
                SELECT user_id, event_id, ts, value,
                       CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id, event_id, ts, value,
                       SUM(new_s) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
                FROM marked
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
                   ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(24,6))) AS DOUBLE), 2) AS sum_value
            FROM sess
            GROUP BY user_id, session_id
        """,
        "events_sliding_window": """
            WITH bounds AS (
                SELECT date_trunc('hour', min(ts)) AS lo, max(ts) AS hi
                FROM events
            ), windows AS (
                SELECT unnest(generate_series((SELECT lo FROM bounds),
                                              (SELECT hi FROM bounds),
                                              INTERVAL 15 MINUTE)) AS w_start
            )
            SELECT event_type, w_start, COUNT(*) AS n_events,
                   ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(24,6))) AS DOUBLE), 2) AS sum_value
            FROM windows JOIN events
              ON ts >= w_start AND ts < w_start + INTERVAL 60 MINUTE
            GROUP BY event_type, w_start
        """,
        "segment_counts": """
            SELECT c_mktsegment, COUNT(*) AS n_customers
            FROM customer GROUP BY c_mktsegment
        """,
        "events_orders_asof": """
            WITH od AS (
                SELECT o_custkey, o_orderdate,
                       max(o_orderkey) AS o_orderkey,
                       arg_max(o_totalprice, o_orderkey) AS o_totalprice
                FROM orders GROUP BY o_custkey, o_orderdate
            )
            SELECT e.event_id, e.user_id, e.ts, od.o_orderkey,
                   ROUND(od.o_totalprice, 2) AS o_totalprice
            FROM events e ASOF JOIN od
              ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
        """,
        "customers_semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        """,
        "customers_anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_totalprice > 400000)
        """,
        "union_all_keys": """
            SELECT c_custkey AS key, 'customer' AS src FROM customer
            UNION ALL
            SELECT s_suppkey AS key, 'supplier' AS src FROM supplier
        """,
        "lineitem_orders_join_native": """
            SELECT o_orderpriority,
                   ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6)
                                       AS DECIMAL(24,6))) AS DOUBLE), 2) AS revenue,
                   COUNT(*)                                              AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
                   COUNT(*) AS n_dups
            FROM documents GROUP BY md5(text)
        """,
        # exact word-3-gram Jaccard ground truth; the engine's LSH has
        # effectively-1.0 recall at these separations (every true pair in
        # the corpus sits at j >= 0.9; P[miss] = (1-0.9^4)^16 ~ 4e-8), so
        # candidates == verified pairs == the exact SQL answer.
        "dedup_minhash_candidates": _JACCARD_PAIRS_SQL.format(
            select="doc_a, doc_b", threshold=0.6),
        "dedup_minhash_neardups": _JACCARD_PAIRS_SQL.format(
            select="doc_a, doc_b, ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard",
            threshold=0.6),
        "dedup_ngram_jaccard": _JACCARD_PAIRS_SQL.format(
            select="doc_a, doc_b, ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard",
            threshold=0.5),
        # exact-substring window dedup: the oracle ranks every word-5-gram
        # window by (doc_id, pos) over the gram TEXT — independent of the
        # engine's md5-low64 grouping — and counts rank>1 windows per doc
        "substring_dup_stats": r"""
            WITH tok AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS w
                FROM documents
            ), g AS (
                SELECT doc_id,
                       CASE WHEN len(w) = 0 THEN []::VARCHAR[]
                            WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                            ELSE list_transform(range(1, len(w) - 3),
                                   i -> array_to_string(
                                       list_slice(w, i, i + 4), ' '))
                       END AS grams
                FROM tok
            ), w2 AS (
                SELECT doc_id, unnest(grams) AS gram,
                       unnest(range(1, len(grams) + 1)) AS pos
                FROM g
            ), r AS (
                SELECT doc_id, ROW_NUMBER() OVER (
                           PARTITION BY gram ORDER BY doc_id, pos) AS rn
                FROM w2
            ), agg AS (
                SELECT doc_id, count(*) AS n_windows,
                       SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_dup
                FROM r GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(n_windows, 0) AS BIGINT) AS n_windows,
                   CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_windows,
                   CASE WHEN COALESCE(n_windows, 0) = 0 THEN 0.0
                        ELSE n_dup * 1.0 / n_windows END AS dup_fraction
            FROM documents d LEFT JOIN agg USING (doc_id)
        """,
        # packing layout: the oracle recomputes the global exclusive
        # prefix sum with a single window function — the engine's
        # bucketed two-level scan must reproduce it exactly
        "sequence_packing": r"""
            WITH t AS (
                SELECT doc_id,
                       len(list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> '')) AS nt
                FROM documents
            ), c AS (
                SELECT doc_id, nt,
                       COALESCE(SUM(nt + 1) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS off
                FROM t
            )
            SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
                   CAST(off AS BIGINT) AS start_off,
                   CAST(off // 128 AS BIGINT) AS seq_first,
                   CAST((off + nt) // 128 AS BIGINT) AS seq_last
            FROM c
        """,
        # URL signals: the oracle rebuilds the deterministic URLs and
        # re-parses them with DuckDB regex/string functions (a different
        # parse strategy than the engine's RFC grammar regexes)
        "url_stats": r"""
            WITH hb AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
                       || 'site' || (doc_id % 50) || '.' ||
                       (CASE doc_id % 5 WHEN 0 THEN 'com'
                             WHEN 1 THEN 'org' WHEN 2 THEN 'net'
                             WHEN 3 THEN 'io' ELSE 'co.uk' END) AS h
                FROM documents
            ), u AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 7 = 0 THEN 'http'
                             ELSE 'https' END) || '://' ||
                       (CASE WHEN doc_id % 13 = 5 THEN upper(h)
                             ELSE h END) ||
                       (CASE WHEN doc_id % 11 = 3 THEN ':8080'
                             ELSE '' END) ||
                       (CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '/p0'
                             WHEN 2 THEN '/p0/p1'
                             ELSE '/p0/p1/p2' END) ||
                       (CASE WHEN doc_id % 6 = 1
                             THEN '?q=term' || (doc_id % 9) || '&page=2'
                             ELSE '' END) AS url
                FROM hb
            ), p AS (
                SELECT doc_id, url,
                       regexp_extract(url, '^([^:/?#]+)://', 1) AS scheme,
                       lower(regexp_extract(url,
                           '^[^:/?#]+://([^/?#:]*)', 1)) AS host,
                       regexp_extract(url,
                           '^[^:/?#]+://[^/?#:]*:([0-9]+)', 1) AS port_s,
                       regexp_extract(url,
                           '^[^:/?#]+://[^/?#]*([^?#]*)', 1) AS path,
                       regexp_extract(url, '\?([^#]*)', 1) AS q
                FROM u
            ), rd AS (
                SELECT *, CASE WHEN host LIKE '%.co.uk'
                        THEN regexp_extract(host, '([^.]+\.co\.uk)$', 1)
                        ELSE regexp_extract(host, '([^.]+\.[^.]+)$', 1)
                        END AS registered_domain
                FROM p
            )
            SELECT doc_id, url, scheme, host,
                   CASE WHEN port_s = ''
                        THEN CASE WHEN scheme = 'http' THEN 80
                                  ELSE 443 END
                        ELSE CAST(port_s AS BIGINT) END AS port,
                   registered_domain,
                   CASE WHEN host LIKE '%.co.uk' THEN 'co.uk'
                        ELSE regexp_extract(host, '\.([^.]+)$', 1)
                        END AS tld,
                   CASE WHEN path = '' THEN 0
                        ELSE len(string_split(path, '/')) - 1
                        END AS path_depth,
                   CASE WHEN q = '' THEN 0
                        ELSE len(string_split(q, '&')) END
                       AS n_query_params,
                   registered_domain IN ('site7.net', 'site13.io',
                                         'site21.org', 'site3.io')
                       AS is_blocked
            FROM rd
        """,
        "json_props_stats": r"""
            WITH x AS (
                SELECT event_type,
                       TRY_CAST(json_extract(props, '$.k') AS BIGINT) AS k
                FROM events
            )
            SELECT event_type, count(*) AS n_events,
                   CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_invalid,
                   CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k,
                   MIN(k) AS min_k, MAX(k) AS max_k,
                   CASE WHEN count(k) > 0
                        THEN SUM(k) * 1.0 / count(k)
                        ELSE 0.0 END AS avg_k
            FROM x GROUP BY event_type
        """,
        # mojibake: utf8('á')=C3 A1 read as cp1252 is 'Ã¡' (é → 'Ã©');
        # the oracle builds the corrupted text AND the repaired text
        # from scratch, so the engine's codec round-trip is value-pinned
        "fix_mojibake": """
            SELECT doc_id,
                   (doc_id % 7 = 2 AND (text LIKE '%a%'
                                        OR text LIKE '%e%'))
                       AS was_fixed,
                   CASE WHEN doc_id % 7 = 2 THEN
                       len(replace(replace(text, 'a', 'Ã¡'),
                                   'e', 'Ã©'))
                       - len(replace(replace(replace(text, 'a', 'Ã¡'),
                                             'e', 'Ã©'), 'Ã', ''))
                   ELSE 0 END AS n_suspicious_before,
                   substr(md5(CASE WHEN doc_id % 7 = 2
                              THEN replace(replace(text, 'a', 'á'),
                                           'e', 'é')
                              ELSE text END), 1, 16) AS fixed_digest
            FROM documents
        """,
        # snapshot delta: old = doc_id%3 != 2; novelty is content-level
        # (md5 of text), so moved/duplicated content is not "new"
        "snapshot_delta": """
            SELECT d.doc_id, substr(md5(d.text), 1, 16) AS text_hash
            FROM documents d
            WHERE NOT EXISTS (
                SELECT 1 FROM documents o
                WHERE o.doc_id % 3 != 2 AND md5(o.text) = md5(d.text))
        """,
        "vocab_topk": r"""
            WITH tok AS (
                SELECT unnest(list_filter(
                    string_split_regex(lower(text), '\s+'),
                    x -> x <> '')) AS term
                FROM documents
            ), c AS (SELECT term, count(*) AS cnt FROM tok
                     GROUP BY term)
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term)
                        AS BIGINT) AS rank,
                   term, cnt
            FROM c ORDER BY cnt DESC, term LIMIT 50
        """,
        "text_index_lookup": r"""
            WITH tok AS (
                SELECT doc_id, unnest(list_filter(
                    string_split_regex(lower(text), '\s+'),
                    x -> x <> '')) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf FROM tok
                WHERE term IN ('scan', 'column') GROUP BY 1, 2
            )
            SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS total_tf
            FROM tf GROUP BY doc_id HAVING count(*) = 2
        """,
        "lm_quality_score": r"""
            WITH g AS (
                SELECT doc_id, unnest(list_transform(
                    range(1, len(text) - 1),
                    i -> substr(text, i, 3))) AS g3
                FROM documents
            ), c AS (SELECT g3, count(*) AS cnt FROM g GROUP BY g3),
            tot AS (SELECT SUM(cnt) AS n FROM c),
            scored AS (
                SELECT g.doc_id, AVG(ln(c.cnt * 1.0 / tot.n)) AS s,
                       count(*) AS ng
                FROM g JOIN c USING (g3) CROSS JOIN tot
                GROUP BY g.doc_id
            )
            SELECT d.doc_id, COALESCE(ng, 0) AS n_trigrams,
                   ROUND(COALESCE(s, 0.0), 6) AS lm_score
            FROM documents d LEFT JOIN scored USING (doc_id)
        """,
        # independent SQL recomputation of the 64-bit simhash (md5-low64
        # token hash, frequency-weighted bit votes, majority rule
        # 2*votes > n_tokens) and the full Hamming<=3 pair set — checks
        # signature math AND LSH-banding completeness (3 flipped bits
        # can't touch all four 16-bit bands)
        "dedup_simhash": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(list_filter(
                           string_split_regex(lower(text), '\\s+'),
                           x -> x <> '')) AS w
                FROM documents
            ), tc AS (
                SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY 1, 2
            ), th AS (
                SELECT doc_id, cnt,
                       CAST(concat('0x', substr(md5(w), 1, 16)) AS UBIGINT)
                           AS h
                FROM tc
            ), tot AS (
                SELECT doc_id, SUM(cnt) AS n FROM th GROUP BY 1
            ), bits AS (
                SELECT doc_id, bb.b AS b,
                       SUM(cnt * CAST((h >> bb.b) & 1 AS BIGINT)) AS v
                FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) bb
                GROUP BY 1, 2
            ), sh AS (
                SELECT bits.doc_id,
                       CAST(SUM(CASE WHEN 2 * v > t.n
                                     THEN CAST(1 AS UBIGINT) << b
                                     ELSE 0 END) AS UBIGINT) AS s
                FROM bits JOIN tot t ON t.doc_id = bits.doc_id
                GROUP BY 1
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.s, b.s)) <= 3
        """,
        "token_count": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "doc_stats": """
            WITH toks AS (
                SELECT doc_id, length(text) AS n_chars,
                       CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents
            )
            SELECT doc_id, n_chars, len(t) AS n_tokens,
                   CASE WHEN len(t) = 0 THEN 0.0
                        ELSE ROUND(list_sum(list_transform(t, x -> length(x))) * 1.0
                                   / len(t), 4)
                   END AS avg_token_len
            FROM toks
        """,
        "quality_score": f"""
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                       END AS t
                FROM documents
            ), m AS (
                SELECT doc_id, len(t) AS n,
                       CASE WHEN len(t) = 0 THEN 0.0
                            ELSE ROUND(len(list_filter(t, x -> x IN ({_STOP_SQL})))
                                       * 1.0 / len(t), 4) END AS stop_ratio,
                       ROUND(LEAST(1.0, len(t) / 50.0), 4) AS len_score
                FROM toks
            )
            SELECT doc_id, stop_ratio, len_score,
                   ROUND(0.5 * len_score + 0.5 * stop_ratio, 4) AS quality
            FROM m
        """,
        # pretraining-prep composition: the four stage rules replayed
        # as one CTE chain (line filter → paragraph first-wins share →
        # survivor-mixture rates → budget window)
        "curate_pretrain": f"""
            WITH raw AS (
                SELECT doc_id, coalesce(text, '') || '.' AS l
                FROM documents
                UNION ALL SELECT doc_id, 'click here for more'
                FROM documents WHERE doc_id % 5 = 0
                UNION ALL SELECT doc_id,
                    'please enable javascript to continue.'
                FROM documents WHERE doc_id % 6 = 3
                UNION ALL SELECT doc_id, 'ok then.'
                FROM documents WHERE doc_id % 7 = 1
                UNION ALL SELECT doc_id,
                    'this is a valid closing sentence number ' ||
                    (doc_id % 9) || '.'
                FROM documents WHERE doc_id % 2 = 0
                UNION ALL SELECT doc_id, 'lorem ipsum dolor sit amet.'
                FROM documents WHERE doc_id % 31 = 5
            ), flags AS (
                SELECT doc_id, trim(l) AS l,
                       CASE WHEN regexp_matches(trim(l), '[.!?"]$')
                             AND len(list_filter(string_split_regex(
                                     trim(l), '\\s+'), x -> x <> '')) >= 3
                             AND NOT contains(trim(l), 'javascript')
                            THEN 1 ELSE 0 END AS keep,
                       CASE WHEN contains(l, 'lorem ipsum')
                             OR contains(l, '{{')
                            THEN 1 ELSE 0 END AS kill
                FROM raw
            ), lf AS (
                SELECT doc_id,
                       CAST(sum(keep) AS BIGINT) AS n_kept_lines,
                       CAST(sum(keep * len(list_filter(
                            string_split_regex(l, '\\s+'),
                            x -> x <> ''))) AS BIGINT) AS kept_tokens
                FROM flags GROUP BY doc_id HAVING max(kill) = 0
            ), occ AS (
                SELECT doc_id, 0 AS idx,
                       CASE WHEN doc_id % 3 = 0
                            THEN 'shared footer all rights reserved'
                            ELSE 'promo block ' || (doc_id % 7)
                       END AS p
                FROM documents WHERE doc_id % 3 IN (0, 1)
                UNION ALL
                SELECT doc_id,
                       CASE WHEN doc_id % 3 IN (0, 1) THEN 1 ELSE 0
                       END AS idx,
                       coalesce(text, '') AS p
                FROM documents
                UNION ALL
                SELECT doc_id,
                       CASE WHEN doc_id % 3 IN (0, 1) THEN 2 ELSE 1
                       END AS idx,
                       'contact page about ' || (doc_id % 11) AS p
                FROM documents WHERE doc_id % 4 = 2
            ), w AS (
                SELECT doc_id, p,
                       ROW_NUMBER() OVER (PARTITION BY p
                           ORDER BY doc_id, idx) AS rn
                FROM occ
            ), pdp AS (
                SELECT doc_id, count(*) AS n_paras,
                       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_kept_paras
                FROM w GROUP BY doc_id
            ), toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                       END AS t
                FROM documents
            ), q AS (
                SELECT doc_id,
                       ROUND(0.5 * ROUND(LEAST(1.0, len(t) / 50.0), 4)
                             + 0.5 * CASE WHEN len(t) = 0 THEN 0.0
                                   ELSE ROUND(len(list_filter(t,
                                       x -> x IN ({_STOP_SQL}))) * 1.0
                                       / len(t), 4) END,
                             4) AS quality
                FROM toks
            ), surv AS (
                SELECT lf.doc_id, lf.kept_tokens, q.quality,
                       CASE WHEN lf.doc_id % 10 <= 5 THEN 'web'
                            WHEN lf.doc_id % 10 <= 8 THEN 'books'
                            ELSE 'wiki' END AS domain,
                       CAST(CAST(concat('0x', substr(
                            md5(CAST(lf.doc_id AS VARCHAR)), 1, 16))
                            AS UBIGINT) % 10000 AS BIGINT) AS bp
                FROM lf
                JOIN pdp ON pdp.doc_id = lf.doc_id
                JOIN q ON q.doc_id = lf.doc_id
                WHERE lf.n_kept_lines >= 2
                  AND 2 * pdp.n_kept_paras >= pdp.n_paras
            ), c AS (
                SELECT domain, count(*) AS n FROM surv GROUP BY domain
            ), r AS (
                SELECT domain,
                       CAST(floor(LEAST(1.0,
                            ((SELECT count(*) FROM surv) * 1.0
                             / (SELECT count(*) FROM c)) / n)
                            * 10000) AS BIGINT) AS rate_bp
                FROM c
            ), mx AS (
                SELECT surv.* FROM surv JOIN r USING (domain)
                WHERE bp < rate_bp
            ), sel AS (
                SELECT doc_id, domain, quality, kept_tokens,
                       SUM(kept_tokens) OVER (
                           ORDER BY quality DESC, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum
                FROM mx
            )
            SELECT doc_id, domain, quality,
                   kept_tokens AS n_tokens,
                   CAST(cum AS BIGINT) AS cum_tokens
            FROM sel WHERE cum <= 5000 ORDER BY doc_id
        """,
        # mixture resampling: the oracle rebuilds the planted domain
        # split, recomputes observed shares → basis-point rates, and
        # replays the md5 acceptance test
        "mixture_sample": """
            WITH d AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 10 <= 5 THEN 'web'
                            WHEN doc_id % 10 <= 8 THEN 'books'
                            ELSE 'wiki' END AS domain,
                       CAST(CAST(concat('0x', substr(
                            md5(CAST(doc_id AS VARCHAR)), 1, 16))
                            AS UBIGINT) % 10000 AS BIGINT) AS bp
                FROM documents
            ), c AS (
                SELECT domain, count(*) AS n FROM d GROUP BY domain
            ), r AS (
                SELECT domain,
                       CAST(floor(LEAST(1.0,
                            ((SELECT count(*) FROM d) * 1.0
                             / (SELECT count(*) FROM c)) / n)
                            * 10000) AS BIGINT) AS rate_bp
                FROM c
            )
            SELECT doc_id, domain, bp AS accept_bp
            FROM d JOIN r USING (domain)
            WHERE bp < rate_bp ORDER BY doc_id
        """,
        # source mixture: quality recomputed per doc, mean via exact
        # integer sum (scaled-int), distinct langs per source
        "source_stats": f"""
            WITH toks AS (
                SELECT source, lang,
                       CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                       END AS t
                FROM documents
            ), m AS (
                SELECT source, lang, len(t) AS nt,
                       ROUND(0.5 * ROUND(LEAST(1.0, len(t) / 50.0), 4)
                             + 0.5 * CASE WHEN len(t) = 0 THEN 0.0
                                   ELSE ROUND(len(list_filter(t,
                                       x -> x IN ({_STOP_SQL}))) * 1.0
                                       / len(t), 4) END,
                             4) AS quality
                FROM toks
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   ROUND(SUM(CAST(ROUND(quality * 10000, 0) AS BIGINT))
                         / 10000.0 / COUNT(*), 4) AS avg_quality,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
            FROM m GROUP BY source ORDER BY source
        """,
        # split manifest: oracle recomputes the md5 90/5/5 assignment
        # and the \S+-run token count per (split, lang)
        "corpus_split": r"""
            WITH d AS (
                SELECT lang, n_chars,
                       CASE WHEN h < 9000 THEN 'train'
                            WHEN h < 9500 THEN 'val'
                            ELSE 'test' END AS split,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\s+'))
                       END AS n_tokens
                FROM (SELECT *,
                             CAST(CAST(concat('0x', substr(
                                  md5(CAST(doc_id AS VARCHAR)), 1, 16))
                                  AS UBIGINT) % 10000 AS BIGINT) AS h
                      FROM documents)
            )
            SELECT split, lang, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars
            FROM d GROUP BY split, lang ORDER BY split, lang
        """,
        "pagerank_topk": _pagerank_sql(),
        # shard shuffle: the oracle recomputes the md5 permutation key
        # and per-shard rank with one window function
        "shard_shuffle": """
            WITH k AS (
                SELECT doc_id,
                       CAST(concat('0x', substr(
                            md5(CAST(doc_id AS VARCHAR)), 1, 16))
                            AS UBIGINT) AS key
                FROM documents
            )
            SELECT doc_id, CAST(key % 8 AS BIGINT) AS shard,
                   CAST(ROW_NUMBER() OVER (PARTITION BY key % 8
                        ORDER BY key) - 1 AS BIGINT) AS pos
            FROM k ORDER BY doc_id
        """,
        # C4 line filter: the oracle rebuilds the planted line layout
        # (UNION ALL, one branch per slot) and re-applies the frozen
        # rules with DuckDB's own regex/string machinery
        "c4_line_filter": r"""
            WITH raw AS (
                SELECT doc_id, coalesce(text, '') || '.' AS l
                FROM documents
                UNION ALL SELECT doc_id, 'click here for more'
                FROM documents WHERE doc_id % 5 = 0
                UNION ALL SELECT doc_id,
                    'please enable javascript to continue.'
                FROM documents WHERE doc_id % 6 = 3
                UNION ALL SELECT doc_id, 'ok then.'
                FROM documents WHERE doc_id % 7 = 1
                UNION ALL SELECT doc_id,
                    'this is a valid closing sentence number ' ||
                    (doc_id % 9) || '.'
                FROM documents WHERE doc_id % 2 = 0
                UNION ALL SELECT doc_id, 'lorem ipsum dolor sit amet.'
                FROM documents WHERE doc_id % 31 = 5
            ), flags AS (
                SELECT doc_id, trim(l) AS l,
                       CASE WHEN regexp_matches(trim(l), '[.!?"]$')
                             AND len(list_filter(string_split_regex(
                                     trim(l), '\s+'), x -> x <> '')) >= 3
                             AND NOT contains(trim(l), 'javascript')
                            THEN 1 ELSE 0 END AS keep,
                       CASE WHEN contains(l, 'lorem ipsum')
                             OR contains(l, '{')
                            THEN 1 ELSE 0 END AS kill
                FROM raw
            )
            SELECT doc_id, count(*) AS n_lines,
                   CAST(sum(keep) AS BIGINT) AS n_kept,
                   CAST(sum(keep * length(l)) AS BIGINT) AS kept_chars,
                   CAST(sum(keep * len(list_filter(string_split_regex(
                        l, '\s+'), x -> x <> ''))) AS BIGINT)
                       AS kept_tokens
            FROM flags GROUP BY doc_id HAVING max(kill) = 0
            ORDER BY doc_id
        """,
        # paragraph dedup: the oracle rebuilds the planted paragraph
        # layout (header/body/footer slots via UNION ALL — same idx
        # arithmetic as the engine's occ encoding), replays
        # first-occurrence-wins with ROW_NUMBER over (doc_id, idx),
        # and recomputes the md5-low64 checksum of the winning rows
        "paragraph_dedup": """
            WITH occ AS (
                SELECT doc_id, 0 AS idx,
                       CASE WHEN doc_id % 3 = 0
                            THEN 'shared footer all rights reserved'
                            ELSE 'promo block ' || (doc_id % 7)
                       END AS p
                FROM documents WHERE doc_id % 3 IN (0, 1)
                UNION ALL
                SELECT doc_id,
                       CASE WHEN doc_id % 3 IN (0, 1) THEN 1 ELSE 0
                       END AS idx,
                       coalesce(text, '') AS p
                FROM documents
                UNION ALL
                SELECT doc_id,
                       CASE WHEN doc_id % 3 IN (0, 1) THEN 2 ELSE 1
                       END AS idx,
                       'contact page about ' || (doc_id % 11) AS p
                FROM documents WHERE doc_id % 4 = 2
            ), w AS (
                SELECT doc_id, idx, p,
                       ROW_NUMBER() OVER (PARTITION BY p
                           ORDER BY doc_id, idx) AS rn
                FROM occ
            )
            SELECT doc_id, count(*) AS n_paras,
                   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept,
                   CAST(sum(CASE WHEN rn = 1 THEN length(p) ELSE 0 END)
                        AS BIGINT) AS kept_chars,
                   CAST(sum(CASE WHEN rn = 1 THEN
                        CAST(concat('0x', substr(md5(p), 1, 16))
                             AS UBIGINT) % 1000000007
                        ELSE 0 END) AS BIGINT) AS kept_checksum
            FROM w GROUP BY doc_id ORDER BY doc_id
        """,
        # token-budget selection: the oracle recomputes the frozen
        # quality formula and replays the engine's distributed prefix
        # scan as one window function over (quality DESC, doc_id)
        "token_budget_select": f"""
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                       END AS t
                FROM documents
            ), m AS (
                SELECT doc_id, len(t) AS nt,
                       ROUND(0.5 * ROUND(LEAST(1.0, len(t) / 50.0), 4)
                             + 0.5 * CASE WHEN len(t) = 0 THEN 0.0
                                   ELSE ROUND(len(list_filter(t,
                                       x -> x IN ({_STOP_SQL}))) * 1.0
                                       / len(t), 4) END,
                             4) AS quality
                FROM toks
            ), c AS (
                SELECT doc_id, quality, nt,
                       SUM(nt) OVER (ORDER BY quality DESC, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum
                FROM m
            )
            SELECT doc_id, quality, nt AS n_tokens,
                   CAST(cum AS BIGINT) AS cum_tokens
            FROM c WHERE cum <= 1000 ORDER BY doc_id
        """,
        # Gopher-style repetition filters (Rae et al. 2021 §A1.1):
        # duplicate-word fraction, top-word fraction, top-bigram
        # fraction, recomputed from scratch over the same split
        "repetition_signals": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents
            ), w AS (
                SELECT doc_id, unnest(t) AS w FROM toks
            ), wc AS (
                SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2
            ), wagg AS (
                SELECT doc_id, SUM(c) AS n_words,
                       COUNT(*) AS n_distinct, MAX(c) AS max_w
                FROM wc GROUP BY 1
            ), bg AS (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, len(t)),
                           i -> t[i] || ' ' || t[i + 1])) AS b
                FROM toks WHERE len(t) >= 2
            ), bgc AS (
                SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2
            ), bgagg AS (
                SELECT doc_id, MAX(c) AS max_bg FROM bgc GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(COALESCE(w.n_words, 0) AS BIGINT) AS n_words,
                   CASE WHEN COALESCE(w.n_words, 0) = 0 THEN 0.0
                        ELSE ROUND((w.n_words - w.n_distinct) * 1.0
                                   / w.n_words, 4)
                   END AS dup_word_frac,
                   CASE WHEN COALESCE(w.n_words, 0) = 0 THEN 0.0
                        ELSE ROUND(w.max_w * 1.0 / w.n_words, 4)
                   END AS top_word_frac,
                   CASE WHEN COALESCE(w.n_words, 0) < 2 THEN 0.0
                        ELSE ROUND(COALESCE(b.max_bg, 0) * 1.0
                                   / (w.n_words - 1), 4)
                   END AS top_bigram_frac
            FROM documents d
            LEFT JOIN wagg w ON d.doc_id = w.doc_id
            LEFT JOIN bgagg b ON d.doc_id = b.doc_id
        """,
        # benchmark decontamination: training docs (doc_id % 41 <> 7)
        # sharing any word-8-gram with the eval slice (doc_id % 41 = 7);
        # the oracle joins on gram strings, the engine on md5-low64
        # hashes of the same strings — identical absent md5 collisions
        "decontaminate": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)),
                                                       '\\s+') END AS t
                FROM documents
            ), g AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(t) - 6),
                              i -> array_to_string(
                                  list_slice(t, i, i + 7), ' '))) AS g
                FROM toks WHERE len(t) >= 8
            ), eval_g AS (
                SELECT DISTINCT g FROM g WHERE doc_id % 41 = 7
            ), shared AS (
                SELECT t.doc_id, COUNT(DISTINCT t.g) AS n_shared
                FROM g t JOIN eval_g e USING (g)
                WHERE t.doc_id % 41 <> 7 GROUP BY 1
            )
            SELECT d.doc_id,
                   COALESCE(s.n_shared, 0) AS n_shared,
                   CAST(COALESCE(s.n_shared, 0) > 0 AS BIGINT)
                       AS contaminated
            FROM documents d LEFT JOIN shared s USING (doc_id)
            WHERE d.doc_id % 41 <> 7
        """,
        "pii_redact": _pii.PII_REDACT_SQL,
        # independent SQL recomputation of the md5 winnowing fingerprint:
        # word-8-gram md5-low64 hashes → 4 smallest → md5 of their
        # comma-joined decimal values (first 16 hex chars)
        "fingerprint": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(lower(text)),
                                                       '\\s+')
                       END AS t
                FROM documents
            ), g AS (
                SELECT doc_id,
                       CASE WHEN len(t) <= 7 THEN [array_to_string(t, ' ')]
                            ELSE list_transform(range(1, len(t) - 6),
                                   i -> array_to_string(
                                            list_slice(t, i, i + 7), ' '))
                       END AS grams
                FROM toks
            ), h AS (
                SELECT doc_id,
                       CAST(concat('0x', substr(md5(gram), 1, 16))
                            AS UBIGINT) AS h
                FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
            )
            SELECT doc_id,
                   substr(md5(array_to_string(list_transform(
                       list_sort(list(h))[1:4],
                       x -> CAST(x AS VARCHAR)), ',')), 1, 16)
                       AS fingerprint,
                   count(*) AS n_shingles
            FROM h GROUP BY doc_id
        """,
        "curate_corpus": """
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS w
        FROM documents
    ), g AS (
        SELECT doc_id,
               CASE WHEN len(w) = 0 THEN []::VARCHAR[]
                    WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                    ELSE list_transform(range(1, len(w) - 1),
                           i -> array_to_string(list_slice(w, i, i + 2), ' '))
               END AS grams
        FROM tok
    ), gr AS (
        SELECT DISTINCT doc_id, unnest(grams) AS gram FROM g
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM gr GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM gr a JOIN gr b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), drops AS (
        SELECT DISTINCT doc_b FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.6
    ), q AS (
        SELECT d.doc_id, d.lang, md5(d.text) AS text_hash,
               CASE WHEN len(t.w) = 0 THEN 0.0
                    ELSE ROUND(len(list_filter(t.w,
                        x -> x IN ('the','a','of','and','to','in','is',
                                   'for','on','with')))
                        * 1.0 / len(t.w), 4) END AS stop_ratio,
               ROUND(LEAST(1.0, len(t.w) / 50.0), 4) AS len_score
        FROM documents d JOIN tok t ON d.doc_id = t.doc_id
    ), gated AS (
        SELECT doc_id, text_hash,
               ROUND(0.5 * len_score + 0.5 * stop_ratio, 4) AS quality
        FROM q
        WHERE ROUND(0.5 * len_score + 0.5 * stop_ratio, 4) >= 0.5
          AND lang = 'en'
    ), keepers AS (
        SELECT min(doc_id) AS doc_id, min(quality) AS quality
        FROM gated GROUP BY text_hash
    )
    SELECT doc_id, quality FROM keepers
    WHERE doc_id NOT IN (SELECT doc_b FROM drops)
        """,
        "realfont_roundtrip": """
            -- engine writes each doc's normalized text into a
            -- Type0/ToUnicode/Widths PDF and extracts it back; the page
            -- assembly appends '\\n\\f' (rule P4)
            SELECT doc_id,
                   regexp_replace(trim(text), '\\s+', ' ', 'g')
                       || chr(10) || chr(12) AS text_out
            FROM documents
        """,
        "image_metadata_summary": """
            SELECT doc_id,
                   CASE WHEN doc_id % 17 = 5 THEN 'error' ELSE 'ok' END AS status,
                   CAST(CASE WHEN doc_id % 17 = 5 THEN 0
                        ELSE 8 + (doc_id % 5) * 4 END AS BIGINT) AS width,
                   CAST(CASE WHEN doc_id % 17 = 5 THEN 0
                        ELSE 8 + (doc_id % 3) * 4 END AS BIGINT) AS height,
                   CAST(CASE WHEN doc_id % 17 = 5 THEN 0
                        WHEN doc_id % 17 IN (7, 11, 13, 15) THEN 1
                        ELSE 3 END AS BIGINT) AS channels,
                   CASE WHEN doc_id % 17 = 5 THEN ''
                        WHEN doc_id % 17 IN (7, 11, 13, 15) THEN 'L'
                        ELSE 'RGB' END AS mode
            FROM documents
        """,
        # feature-pipeline projection: invariants (8 histogram bins
        # summing to 1) on every decodable row; on the planted
        # constant-value PNGs (doc_id%17==15, pixel = doc_id%256) the
        # channel mean and one-hot argmax bin are exact arithmetic
        "image_features_summary": """
            SELECT doc_id,
                   CASE WHEN doc_id % 17 = 5 THEN 'error'
                        ELSE 'ok' END AS status,
                   CAST(CASE WHEN doc_id % 17 = 5 THEN 0
                        WHEN doc_id % 17 IN (7, 11, 13, 15) THEN 1
                        ELSE 3 END AS BIGINT) AS n_channels,
                   CAST(CASE WHEN doc_id % 17 = 5 THEN 0
                        ELSE 8 END AS BIGINT) AS emb_len,
                   CASE WHEN doc_id % 17 = 5 THEN 0.0
                        ELSE 1.0 END AS emb_sum,
                   CASE WHEN doc_id % 17 = 15
                        THEN CAST(doc_id % 256 AS DOUBLE) END AS mean0,
                   CAST(CASE WHEN doc_id % 17 = 15
                        THEN (doc_id % 256) // 32
                        ELSE -1 END AS BIGINT) AS top_bin
            FROM documents
        """,
        "image_resize_summary": """
            SELECT doc_id,
                   CASE WHEN doc_id % 17 = 5 THEN 'error' ELSE 'ok' END AS status,
                   CASE WHEN doc_id % 17 = 5 THEN 0 ELSE 16 END AS width,
                   CASE WHEN doc_id % 17 = 5 THEN 0 ELSE 16 END AS height
            FROM documents
        """,
        "video_frame_sample": """
            SELECT doc_id, CAST(unnest(range(0, 2 + doc_id % 4, 2)) AS INT)
                       AS frame_no,
                   8 AS width, 8 AS height
            FROM documents
        """,
        # AVI rows (doc_id%11==5) carry real RIFF metadata written and
        # re-parsed by the in-repo muxer/demuxer; fakevid rows read the
        # fixture header — all fields are doc_id arithmetic either way
        "video_metadata": """
            SELECT doc_id,
                   CASE WHEN doc_id % 11 = 5 THEN 'avi'
                        ELSE 'fakevid' END AS container,
                   CASE WHEN doc_id % 11 = 5 THEN 'MJPG'
                        ELSE 'raw' END AS codec,
                   CAST(2 + doc_id % 4 AS BIGINT) AS n_frames,
                   CAST(8 AS BIGINT) AS width,
                   CAST(8 AS BIGINT) AS height,
                   CASE WHEN doc_id % 11 = 5
                        THEN CAST(10 + doc_id % 20 AS DOUBLE)
                        ELSE 0.0 END AS fps
            FROM documents
        """,
        "audio_metadata_summary": """
            SELECT doc_id,
                   CASE WHEN doc_id % 23 = 7 THEN 'error' ELSE 'ok' END AS status,
                   CASE WHEN doc_id % 23 = 7 THEN 0
                        WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS sample_rate,
                   CASE WHEN doc_id % 23 = 7 THEN 0
                        ELSE 4000 + (doc_id % 7) * 1000 END AS n_samples,
                   CASE WHEN doc_id % 23 = 7 THEN 0.0
                        ELSE ROUND((4000 + (doc_id % 7) * 1000) * 1.0 /
                                   (CASE WHEN doc_id % 2 = 0
                                         THEN 8000 ELSE 16000 END), 4)
                   END AS duration_s
            FROM documents
        """,
        "ann_cosine_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 5
            )
            SELECT query_id, vec_id,
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos
            FROM embeddings e CROSS JOIN q
            QUALIFY row_number() OVER (
                PARTITION BY query_id
                ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) DESC,
                         vec_id) <= 10
        """,
        # connected components over the exact-Jaccard >= 0.6 pair set
        # (recursive label propagation; min label per node = the
        # union-find representative the Ray side computes)
        "neardup_clusters": """
            WITH RECURSIVE pairs AS (
                """ + _JACCARD_PAIRS_SQL.format(
            select="doc_a, doc_b", threshold=0.6) + """
            ), edges AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION ALL
                SELECT doc_b AS a, doc_a AS b FROM pairs
            ), nodes AS (
                SELECT DISTINCT a AS id FROM edges
            ), cc AS (
                SELECT id, id AS comp FROM nodes
                UNION
                SELECT e.b AS id, cc.comp
                FROM cc JOIN edges e ON e.a = cc.id
            )
            SELECT id AS doc_id, MIN(comp) AS cluster_min
            FROM cc GROUP BY id ORDER BY doc_id
        """,
        # windowed aggregate: running total + sequence number per user,
        # decimal accumulation mirrors the engine's scaled ints
        "events_running_total": """
            SELECT user_id, event_id,
                   CAST(row_number() OVER w AS BIGINT) AS seq,
                   ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6)))
                              OVER w AS DOUBLE), 2) AS running_total
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        # left-outer join: unmatched orders keep a bucket of their own
        "orders_customer_left_join": """
            SELECT COALESCE(c.c_mktsegment, 'UNMATCHED') AS c_mktsegment,
                   COUNT(*) AS n_orders,
                   ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                              AS DOUBLE), 2) AS revenue
            FROM orders o LEFT JOIN customer c
              ON o.o_custkey = c.c_custkey
            GROUP BY 1 ORDER BY 1
        """,
        # exact grouped quantiles (value-count reconstruction =
        # quantile_cont linear interpolation)
        "order_price_quantiles": """
            SELECT o_orderpriority,
                   ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
                   ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
                   ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "top_orders_per_segment": """
            SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
                SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                       row_number() OVER (
                           PARTITION BY c.c_mktsegment
                           ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            ) WHERE rn <= 3
        """,
        # Okapi BM25 over word tokens for the fixed query-term set —
        # identical formula/association order as retrieval.bm25_topk,
        # ranking on the unrounded score with doc_id tie-break
        "bm25_topk": """
            WITH tok AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '') AS w
                FROM documents
            ), d AS (
                SELECT doc_id, len(w) AS dl,
                       len(list_filter(w, x -> x = 'spark'))  AS tf0,
                       len(list_filter(w, x -> x = 'window')) AS tf1,
                       len(list_filter(w, x -> x = 'join'))   AS tf2
                FROM tok
            ), s AS (
                SELECT count(*) AS n,
                       sum(dl) * 1.0 / count(*) AS avgdl,
                       sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                       sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                       sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
                FROM d
            ), scored AS (
                SELECT doc_id,
                       CASE WHEN tf0 > 0 THEN
                         ln((n - df0 + 0.5) / (df0 + 0.5) + 1) * tf0 * 2.2
                           / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                       ELSE 0 END
                     + CASE WHEN tf1 > 0 THEN
                         ln((n - df1 + 0.5) / (df1 + 0.5) + 1) * tf1 * 2.2
                           / (tf1 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                       ELSE 0 END
                     + CASE WHEN tf2 > 0 THEN
                         ln((n - df2 + 0.5) / (df2 + 0.5) + 1) * tf2 * 2.2
                           / (tf2 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                       ELSE 0 END AS s_raw
                FROM d, s
            )
            SELECT doc_id, ROUND(s_raw, 4) AS score
            FROM scored ORDER BY s_raw DESC, doc_id LIMIT 10
        """,
        # deterministic per-language hash sampling — same md5-low64
        # decision function as retrieval.stratified_sample
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CAST(concat('0x',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                       AS UBIGINT) % 100
                  < CASE lang WHEN 'en' THEN 5 WHEN 'de' THEN 20
                              WHEN 'zh' THEN 20 WHEN 'fr' THEN 20
                              WHEN 'es' THEN 20 ELSE 100 END
            ORDER BY doc_id
        """,
        # recall gates: the Ray side computes per-query recall of the
        # approximate method against the exact top-k and floors it at
        # the bar; the oracle emits the constant bar per query — the
        # hash matches iff every query's recall meets the bar
        "ann_lsh_topk": f"""
            SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS k,
                   {_ann.LSH_RECALL_BAR} AS recall_floor
            FROM embeddings WHERE vec_id < 5 ORDER BY query_id
        """,
        "ann_ivf_topk": f"""
            SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS k,
                   {_ann.IVF_RECALL_BAR} AS recall_floor
            FROM embeddings WHERE vec_id < 5 ORDER BY query_id
        """,
        "ann_ivf_index_topk": f"""
            SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS k,
                   {_ann.IVF_RECALL_BAR} AS recall_floor
            FROM embeddings WHERE vec_id < 5 ORDER BY query_id
        """,
        # flagship extraction summary, recomputed from documents alone:
        # the synthetic corpus plants html (title = 'Doc {id} ({source})',
        # one page, a <table> iff doc_id%7==0 with >=2 sentences) and
        # empty (doc_id%53==11) families; PDF rows (doc_id%41==7) are
        # excluded (page count = greedy line wrap, not SQL-expressible)
        "extract_pages_summary": """
            SELECT doc_id,
                   'ok' AS status,
                   CASE WHEN doc_id % 53 = 11 THEN 'empty'
                        ELSE 'html' END AS kind,
                   CASE WHEN doc_id % 53 = 11 THEN ''
                        ELSE 'Doc ' || CAST(doc_id AS VARCHAR)
                             || ' (' || source || ')' END AS title,
                   CAST(CASE WHEN doc_id % 53 = 11 THEN 0 ELSE 1 END
                        AS BIGINT) AS n_pages,
                   CAST(CASE WHEN doc_id % 53 = 11 THEN 0
                        WHEN doc_id % 7 = 0 AND
                             (CASE WHEN trim(text) = '' THEN 0
                                   ELSE len(regexp_split_to_array(
                                            trim(text), '\\s+')) END) > 12
                        THEN 1 ELSE 0 END AS BIGINT) AS n_tables
            FROM documents
            WHERE doc_id % 41 <> 7
        """,
        # office chain: extracted text = 'Doc {id} office' heading +
        # the raw text re-wrapped — word count and non-whitespace char
        # count are wrap-invariant, heading count is exactly 1
        "office_extract_summary": r"""
            SELECT doc_id, 'ok' AS status, 'office' AS kind,
                   CAST(3 + CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(
                                     trim(text), '\s+')) END
                        AS BIGINT) AS n_words,
                   CAST(9 + LENGTH(CAST(doc_id AS VARCHAR))
                          + LENGTH(regexp_replace(text, '\s', '', 'g'))
                        AS BIGINT) AS n_nonspace,
                   CAST(1 AS BIGINT) AS n_toc
            FROM documents
        """,
        "office_odt_summary": r"""
            SELECT doc_id, 'ok' AS status, 'office' AS kind,
                   CAST(3 + CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(
                                     trim(text), '\s+')) END
                        AS BIGINT) AS n_words,
                   CAST(9 + LENGTH(CAST(doc_id AS VARCHAR))
                          + LENGTH(regexp_replace(text, '\s', '', 'g'))
                        AS BIGINT) AS n_nonspace,
                   CAST(1 AS BIGINT) AS n_toc
            FROM documents
        """,
        # xlsx packing: words flow through shared strings and back out
        # in order; empty docs pack a single 'empty' sentinel cell
        "office_xlsx_summary": r"""
            SELECT doc_id, 'ok' AS status, 'office' AS kind,
                   CAST(CASE WHEN trim(text) = '' THEN 1
                        ELSE len(regexp_split_to_array(
                                 trim(text), '\s+')) END
                        AS BIGINT) AS n_words,
                   CAST(CASE WHEN trim(text) = '' THEN 5
                        ELSE LENGTH(regexp_replace(text, '\s', '', 'g'))
                        END AS BIGINT) AS n_nonspace
            FROM documents
        """,
        "warc_extract_summary": """
            SELECT doc_id,
                   'ok' AS status,
                   CASE WHEN doc_id % 53 = 11 THEN 'empty'
                        ELSE 'html' END AS kind,
                   CASE WHEN doc_id % 53 = 11 THEN ''
                        ELSE 'Doc ' || CAST(doc_id AS VARCHAR)
                             || ' (' || source || ')' END AS title,
                   CAST(CASE WHEN doc_id % 53 = 11 THEN 0 ELSE 1 END
                        AS BIGINT) AS n_pages,
                   CAST(CASE WHEN doc_id % 53 = 11 THEN 0
                        WHEN doc_id % 7 = 0 AND
                             (CASE WHEN trim(text) = '' THEN 0
                                   ELSE len(regexp_split_to_array(
                                            trim(text), '\\s+')) END) > 12
                        THEN 1 ELSE 0 END AS BIGINT) AS n_tables
            FROM documents
            WHERE doc_id % 41 <> 7
        """,
        # language ID over the raw corpus: the deterministic synthetic
        # text always classifies 'en' (detector + corpus both
        # deterministic; verified at sf0.001/0.01/0.1), and the folded-in
        # planted column re-runs the detector over script-transliterated
        # text whose expected verdict is pure doc_id arithmetic — one
        # query value-checks all five script families (VERDICT r4 #2)
        "lang_id": """
            SELECT doc_id, lang AS lang_hint, 'en' AS detected_lang,
                   CASE WHEN doc_id % 5 <> 0
                             AND regexp_matches(text, '[A-Za-z]')
                        THEN CASE doc_id % 5 WHEN 1 THEN 'ru'
                                             WHEN 2 THEN 'el'
                                             WHEN 3 THEN 'zh'
                                             ELSE 'ko' END
                        ELSE '' END AS planted_lang
            FROM documents
        """,
        # planted-script language ID: docs transliterated into
        # Cyrillic/Greek/CJK/Hangul by doc_id%5 must classify to that
        # script's language (marker-free Cyrillic range → exactly 'ru')
        "lang_id_planted": """
            SELECT doc_id,
                   CASE doc_id % 5 WHEN 1 THEN 'ru' WHEN 2 THEN 'el'
                                   WHEN 3 THEN 'zh' ELSE 'ko'
                   END AS detected_lang
            FROM documents
            WHERE doc_id % 5 <> 0 AND regexp_matches(text, '[A-Za-z]')
        """,
        "embedding_neardups": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
        """,
        # planted related-links nav: targets (doc_id*31 + 97*j) % total,
        # j = 1 .. 1 + doc_id % 5, HTML rows only
        "link_graph": """
            WITH params AS (SELECT count(*) AS total FROM documents),
            edges AS (
                SELECT (d.doc_id * 31 + 97 * j.j) % p.total AS target_doc_id
                FROM documents d CROSS JOIN params p
                JOIN range(1, 6) j(j) ON j.j <= 1 + d.doc_id % 5
                WHERE d.doc_id % 53 <> 11 AND d.doc_id % 41 <> 7)
            SELECT target_doc_id, count(*) AS indegree
            FROM edges GROUP BY 1
        """,
        "outlink_stats": """
            SELECT doc_id, CAST(1 + doc_id % 5 AS BIGINT) AS n_internal,
                   CAST(7 AS BIGINT) AS n_external
            FROM documents
            WHERE doc_id % 53 <> 11 AND doc_id % 41 <> 7
        """,
        "html_title_extract": """
            SELECT doc_id,
                   'Doc ' || CAST(doc_id AS VARCHAR) || ' (' || source || ')'
                       AS title
            FROM documents
            WHERE doc_id % 53 <> 11 AND doc_id % 41 <> 7
        """,
        "warc_source_counts": """
            SELECT source,
                   count(*) AS n_pages,
                   min(doc_id) AS min_doc_id,
                   max(doc_id) AS max_doc_id,
                   CAST(sum(CASE WHEN doc_id % 53 = 11 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_empty,
                   CAST(sum(CASE WHEN doc_id % 53 <> 11 AND doc_id % 41 = 7
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_pdf
            FROM documents GROUP BY source
        """,
        # SemDedup: quantize q = FLOOR(x*1024 + 0.5) in float64 (identical
        # IEEE ops to numpy), assign to the nearest of k = max(8, N//256)
        # deterministic seeds (vec_ids j*(N//k)) by int64 squared-L2 with
        # lowest-seed tie-break, then flag any vector whose int64-exact
        # cosine to an earlier same-cluster vector is >= 0.4
        # (dot > 0 AND 25*dot^2 >= 4*|u|^2*|v|^2)
        "semantic_dedup": """
            WITH params AS (
              SELECT count(*) AS n, GREATEST(8, count(*) // 256) AS k
              FROM embeddings
            ),
            q AS (
              SELECT vec_id, i,
                     CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                                * 1024 + 0.5) AS BIGINT) AS v
              FROM (SELECT vec_id, embedding,
                           UNNEST(generate_series(1, len(embedding))) AS i
                    FROM embeddings)
            ),
            seeds AS (
              SELECT UNNEST(generate_series(0, k - 1)) AS seed_j,
                     n // k AS step
              FROM params
            ),
            seed_q AS (
              SELECT s.seed_j, q.i, q.v
              FROM seeds s JOIN q ON q.vec_id = s.seed_j * s.step
            ),
            norms AS (SELECT vec_id, SUM(v*v) AS n2 FROM q GROUP BY 1),
            seed_norms AS (
              SELECT seed_j, SUM(v*v) AS n2 FROM seed_q GROUP BY 1
            ),
            dots AS (
              SELECT q.vec_id, sq.seed_j, SUM(q.v * sq.v) AS dot
              FROM q JOIN seed_q sq USING (i) GROUP BY 1, 2
            ),
            assign AS (
              SELECT d.vec_id, d.seed_j AS cluster_id
              FROM dots d JOIN seed_norms sn USING (seed_j)
              QUALIFY ROW_NUMBER() OVER (
                  PARTITION BY d.vec_id
                  ORDER BY (sn.n2 - 2*d.dot), d.seed_j) = 1
            ),
            pair_dots AS (
              SELECT a.vec_id AS u, b.vec_id AS w, SUM(qa.v * qb.v) AS dot
              FROM assign a
              JOIN assign b ON a.cluster_id = b.cluster_id
                           AND a.vec_id < b.vec_id
              JOIN q qa ON qa.vec_id = a.vec_id
              JOIN q qb ON qb.vec_id = b.vec_id AND qb.i = qa.i
              GROUP BY 1, 2
            ),
            dup AS (
              SELECT p.w AS vec_id
              FROM pair_dots p
              JOIN norms nu ON nu.vec_id = p.u
              JOIN norms nv ON nv.vec_id = p.w
              WHERE p.dot > 0 AND 25 * p.dot * p.dot >= 4 * nu.n2 * nv.n2
              GROUP BY 1
            )
            SELECT a.vec_id, CAST(a.cluster_id AS BIGINT) AS cluster_id,
                   (d.vec_id IS NOT NULL) AS is_dup
            FROM assign a LEFT JOIN dup d USING (vec_id)
        """,
        "meta_extract": """
            SELECT doc_id,
                   'Summary of doc ' || CAST(doc_id AS VARCHAR) || ' from '
                       || source AS description,
                   'https://example.org/' || source || '/'
                       || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS canonical
            FROM documents
            WHERE doc_id % 53 <> 11 AND doc_id % 41 <> 7
        """,
        "anchor_text_stats": """
            WITH params AS (SELECT count(*) AS total FROM documents),
            edges AS (
                SELECT (d.doc_id * 31 + 97 * j.j) % p.total AS target_doc_id,
                       'Related ' || CAST(j.j AS VARCHAR) AS anchor
                FROM documents d CROSS JOIN params p
                JOIN range(1, 6) j(j) ON j.j <= 1 + d.doc_id % 5
                WHERE d.doc_id % 53 <> 11 AND d.doc_id % 41 <> 7)
            SELECT target_doc_id,
                   count(*) AS n_inbound,
                   count(DISTINCT anchor) AS n_distinct_anchors,
                   min(anchor) AS top_anchor
            FROM edges GROUP BY 1
        """,
        "charset_decode": """
            SELECT doc_id,
                   CASE doc_id % 4 WHEN 0 THEN 'utf-8'
                                   WHEN 1 THEN 'utf-16-le'
                                   WHEN 2 THEN 'utf-16-be'
                                   ELSE 'cp1252' END AS charset,
                   'Doc ' || CAST(doc_id AS VARCHAR) || ' charset test ('
                       || source || ') ' || chr(8364) AS text
            FROM documents
        """,
        # raw-variant construction mirrored arithmetically; the value
        # hash covers the normalized strings, so any broken rule
        # (case, default port, fragment, tracking filter, param sort)
        # breaks the match
        "url_dedup": """
            WITH d AS (
              SELECT doc_id, source,
                     'https://example.org/' || source || '/' ||
                     lpad(CAST(doc_id AS VARCHAR), 8, '0') AS canon
              FROM documents),
            rows_ AS (
              SELECT canon AS normalized_url,
                     (CASE WHEN doc_id % 10 <> 4 THEN 1 ELSE 0 END)
                     + (CASE WHEN doc_id % 3 >= 1 THEN 1 ELSE 0 END)
                     + (CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END) AS n
              FROM d
              UNION ALL
              SELECT canon || '?a=' || CAST(doc_id % 7 AS VARCHAR)
                     || '&b=' || CAST(doc_id % 3 AS VARCHAR), 1
              FROM d WHERE doc_id % 10 = 4)
            SELECT normalized_url, CAST(SUM(n) AS BIGINT) AS n_raw
            FROM rows_ WHERE n > 0 GROUP BY 1
        """,
        "jsonld_extract": """
            SELECT doc_id,
                   'Article' AS jsonld_type,
                   'Doc ' || CAST(doc_id AS VARCHAR) AS headline,
                   n_chars AS char_count,
                   source AS publisher
            FROM documents
            WHERE doc_id % 53 <> 11 AND doc_id % 41 <> 7
        """,
        # frontier composition: canonicalize → dedup → robots gate.
        # Canonical paths end in the doc_id digits (blocked iff %10=0
        # unless %100=0); param URLs end in '&b=' || (doc_id%3) and the
        # RFC matches path+QUERY, so *0$ blocks them when doc_id%3=0
        "crawl_frontier": """
            WITH d AS (SELECT doc_id, source FROM documents),
            urls AS (
              SELECT source, doc_id, 'c' AS kind,
                     (CASE WHEN doc_id % 10 <> 4 THEN 1 ELSE 0 END)
                     + (CASE WHEN doc_id % 3 >= 1 THEN 1 ELSE 0 END)
                     + (CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END) AS n_raw
              FROM d
              UNION ALL
              SELECT source, doc_id, 'p', 1 FROM d WHERE doc_id % 10 = 4)
            SELECT source,
                   CAST(SUM(n_raw) AS BIGINT) AS n_raw,
                   CAST(SUM(CASE WHEN n_raw > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_canonical,
                   CAST(SUM(CASE WHEN n_raw > 0 AND NOT (
                                (kind = 'c' AND doc_id % 10 = 0
                                 AND doc_id % 100 <> 0)
                                OR (kind = 'p' AND doc_id % 3 = 0))
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed
            FROM urls GROUP BY 1
        """,
        # HLL reproduced end-to-end in SQL: same md5-low64 hash, integer
        # bit-length (binary reduction ≡ the correlated powers-of-two
        # max), exact int64 register numerator, identical estimator
        # literals; 4-decimal round kills libm-ulp risk on the ln branch
        # Count-Min: the oracle rebuilds the 4x2048 counter matrix from
        # the exact term counts with the same md5-half double hashing
        # (small-modulus arithmetic, the bloom_probe discipline) and
        # takes the same min-over-rows estimates
        "cms_heavy_hitters": r"""
            WITH tok AS (
                SELECT unnest(list_filter(
                    string_split_regex(lower(text), '\s+'),
                    x -> x <> '')) AS term
                FROM documents
            ), c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
            h AS (
                SELECT term, cnt,
                       CAST(CAST(concat('0x', substr(md5(term), 1, 16))
                                 AS UBIGINT) % 2048 AS BIGINT) AS a,
                       CAST(CAST(concat('0x', substr(md5(term), 17, 16))
                                 AS UBIGINT) % 2048 AS BIGINT) AS b
                FROM c
            ), inc AS (
                SELECT r.r * 2048 + (a + r.r * b) % 2048 AS cell, cnt
                FROM h CROSS JOIN range(4) r(r)
            ), cms AS (
                SELECT cell, CAST(SUM(cnt) AS BIGINT) AS v
                FROM inc GROUP BY cell
            ), est AS (
                SELECT h.term, h.cnt AS exact_cnt, MIN(cms.v) AS est_cnt
                FROM h CROSS JOIN range(4) r(r)
                JOIN cms ON cms.cell
                            = r.r * 2048 + (h.a + r.r * h.b) % 2048
                GROUP BY h.term, h.cnt
            )
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY est_cnt DESC, term)
                        AS BIGINT) AS rank,
                   term, CAST(est_cnt AS BIGINT) AS est_cnt,
                   CAST(exact_cnt AS BIGINT) AS exact_cnt
            FROM est ORDER BY est_cnt DESC, term LIMIT 20
        """,
        # weighted bottom-k: 63-bit md5 draw // (n_words+1); on
        # nonnegative operands numpy floor-div == SQL truncating div
        "weighted_sample": r"""
            WITH w AS (
                SELECT doc_id,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(
                                     trim(text), '\s+')) END
                            AS BIGINT) AS n_words,
                       CAST(CAST(concat('0x', substr(md5(text), 1, 16))
                                 AS UBIGINT)
                            & CAST(9223372036854775807 AS UBIGINT)
                            AS BIGINT) AS h
                FROM documents
            ), keyed AS (
                SELECT doc_id, n_words,
                       h // (n_words + 1) AS sample_key
                FROM w
            )
            SELECT CAST(ROW_NUMBER() OVER (
                        ORDER BY sample_key, doc_id) AS BIGINT) AS rank,
                   doc_id, n_words, sample_key
            FROM keyed ORDER BY sample_key, doc_id LIMIT 50
        """,
        # Gopher rules: integerized thresholds, no float boundaries
        "gopher_filter": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text),
                                                      '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), m AS (
                SELECT doc_id,
                       CAST(len(ws) AS BIGINT) AS n_words,
                       CAST(COALESCE(list_sum(list_transform(
                           ws, x -> length(x))), 0) AS BIGINT)
                           AS sum_word_chars,
                       CAST(len(list_filter(ws,
                           x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
                           AS n_alpha_words,
                       CAST(len(list_filter(
                           ['the','be','to','of','and','that','have',
                            'with'],
                           s -> list_contains(ws, s))) AS BIGINT)
                           AS n_stop_distinct,
                       CAST(len(list_filter(ws,
                           x -> contains(x, '#') OR x LIKE '%...'))
                           AS BIGINT) AS n_symbol_words
                FROM w
            )
            SELECT doc_id, n_words, sum_word_chars, n_alpha_words,
                   n_stop_distinct, n_symbol_words,
                   (n_words BETWEEN 50 AND 100000
                    AND 3 * n_words <= sum_word_chars
                    AND sum_word_chars <= 10 * n_words
                    AND 5 * n_alpha_words >= 4 * n_words
                    AND n_stop_distinct >= 2
                    AND 10 * n_symbol_words <= n_words) AS keep
            FROM m
        """,
        "hll_distinct": """
            WITH h AS (
              SELECT CAST(concat('0x', substr(md5(text), 1, 16))
                          AS UBIGINT) AS hu
              FROM documents
            ),
            b AS (
              SELECT CAST(hu >> 54 AS BIGINT) AS bucket,
                     CAST(hu & ((1::UBIGINT << 54) - 1) AS BIGINT) AS w
              FROM h
            ),
            r AS (
              SELECT bucket,
                     LEAST(55 - (SELECT COALESCE(MAX(i + 1), 0)
                                 FROM range(0, 54) t(i)
                                 WHERE (1::BIGINT << CAST(i AS INT))
                                       <= b.w), 40) AS rho
              FROM b
            ),
            mx AS (SELECT bucket, MAX(rho) AS m_rho FROM r GROUP BY 1),
            agg AS (
              SELECT COUNT(*) AS nonzero,
                     SUM(1::BIGINT << CAST(40 - m_rho AS INT))
                         AS num_present
              FROM mx
            ),
            f AS (
              SELECT CAST(1024 AS BIGINT) AS m,
                     CAST(1024 - nonzero AS BIGINT) AS zero_buckets,
                     CAST(num_present + (1024 - nonzero)
                          * (1::BIGINT << 40) AS BIGINT) AS rho_numerator
              FROM agg
            )
            SELECT m, zero_buckets, rho_numerator,
                   ROUND(CASE WHEN (0.7213 / (1.0 + 1.079 / 1024)) * 1024
                                   * 1024 * POW(2.0, 40)
                                   / CAST(rho_numerator AS DOUBLE)
                                   <= 2.5 * 1024 AND zero_buckets > 0
                              THEN 1024 * LN(1024.0 / zero_buckets)
                              ELSE (0.7213 / (1.0 + 1.079 / 1024)) * 1024
                                   * 1024 * POW(2.0, 40)
                                   / CAST(rho_numerator AS DOUBLE)
                         END, 4) AS estimate
            FROM f
        """,
        "bloom_probe": """
            WITH built AS (
              SELECT DISTINCT
                ((CAST(concat('0x', substr(md5(text), 1, 16)) AS UBIGINT)
                  % 131072)
                 + i.i * (CAST(concat('0x', substr(md5(text), 17, 16))
                          AS UBIGINT) % 131072)) % 131072 AS bit
              FROM documents CROSS JOIN range(0, 7) i(i)),
            probes AS (
              SELECT doc_id AS probe_id, text AS key
              FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT doc_id + 10000000,
                     'absent-' || CAST(doc_id AS VARCHAR)
              FROM documents WHERE doc_id % 2 <> 0),
            ppos AS (
              SELECT probe_id,
                ((CAST(concat('0x', substr(md5(key), 1, 16)) AS UBIGINT)
                  % 131072)
                 + i.i * (CAST(concat('0x', substr(md5(key), 17, 16))
                          AS UBIGINT) % 131072)) % 131072 AS bit
              FROM probes CROSS JOIN range(0, 7) i(i))
            SELECT p.probe_id,
                   (COUNT(*) = SUM(CASE WHEN b.bit IS NOT NULL
                                        THEN 1 ELSE 0 END)) AS hit
            FROM ppos p LEFT JOIN built b USING (bit)
            GROUP BY 1
        """,
        "hash_sample_quantiles": """
            WITH h AS (
              SELECT CAST(concat('0x', substr(md5(
                         CAST(l_orderkey AS VARCHAR) || '-'
                         || CAST(l_linenumber AS VARCHAR)), 1, 16))
                         AS UBIGINT) AS hu,
                     CAST(l_extendedprice AS DOUBLE) AS value
              FROM lineitem),
            d AS (SELECT hu, MIN(value) AS value FROM h GROUP BY hu),
            s AS (SELECT value FROM d ORDER BY hu LIMIT 1024)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
                   ROUND(quantile_cont(value, 0.25), 6) AS q25,
                   ROUND(quantile_cont(value, 0.5), 6) AS q50,
                   ROUND(quantile_cont(value, 0.75), 6) AS q75,
                   ROUND(quantile_cont(value, 0.95), 6) AS q95
            FROM s
        """,
        "kmv_source_sketch": """
            WITH w AS (
              SELECT DISTINCT source, UNNEST(list_filter(
                  string_split_regex(lower(text), '\\s+'),
                  x -> x <> '')) AS word
              FROM documents),
            h AS (
              SELECT DISTINCT source,
                     CAST(concat('0x', substr(md5(word), 1, 16))
                          AS UBIGINT) AS hu
              FROM w),
            rk AS (SELECT source, hu,
                          ROW_NUMBER() OVER (PARTITION BY source
                                             ORDER BY hu) AS rn
                   FROM h),
            keep AS (SELECT source, hu FROM rk WHERE rn <= 16),
            per AS (SELECT source, COUNT(*) AS k_kept, MAX(hu) AS kth
                    FROM keep GROUP BY 1)
            SELECT source, k_kept,
                   CAST(CAST(kth AS HUGEINT)
                        - (CASE WHEN kth >= 9223372036854775808::HUGEINT
                                THEN 18446744073709551616::HUGEINT
                                ELSE 0::HUGEINT END) AS BIGINT) AS kth_hash,
                   ROUND(CASE WHEN k_kept < 16
                              THEN CAST(k_kept AS DOUBLE)
                              ELSE 15.0 * POW(2.0, 64)
                                   / CAST(kth AS DOUBLE) END,
                         4) AS distinct_est
            FROM per
        """,
        "kmv_source_overlap": """
            WITH w AS (
              SELECT DISTINCT source, UNNEST(list_filter(
                  string_split_regex(lower(text), '\\s+'),
                  x -> x <> '')) AS word
              FROM documents),
            h AS (
              SELECT DISTINCT source,
                     CAST(concat('0x', substr(md5(word), 1, 16))
                          AS UBIGINT) AS hu
              FROM w),
            rk AS (SELECT source, hu,
                          ROW_NUMBER() OVER (PARTITION BY source
                                             ORDER BY hu) AS rn
                   FROM h),
            keep AS (SELECT source, hu FROM rk WHERE rn <= 16),
            pairs AS (SELECT a.source AS sa, b.source AS sb
                      FROM (SELECT DISTINCT source FROM keep) a
                      JOIN (SELECT DISTINCT source FROM keep) b
                        ON a.source < b.source),
            u AS (
              SELECT p.sa, p.sb, k.hu,
                     MAX(CASE WHEN k.source = p.sa THEN 1 ELSE 0 END)
                         AS in_a,
                     MAX(CASE WHEN k.source = p.sb THEN 1 ELSE 0 END)
                         AS in_b
              FROM pairs p JOIN keep k ON k.source IN (p.sa, p.sb)
              GROUP BY 1, 2, 3),
            ru AS (SELECT sa, sb, in_a, in_b,
                          ROW_NUMBER() OVER (PARTITION BY sa, sb
                                             ORDER BY hu) AS rn
                   FROM u)
            SELECT sa AS source_a, sb AS source_b,
                   CAST(SUM(CASE WHEN rn <= 16 AND in_a = 1 AND in_b = 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_common_in_unionk
            FROM ru GROUP BY 1, 2
        """,
        "sitemap_census": """
            SELECT source, count(*) AS n_urls,
                   min(doc_id % 365) AS min_lastmod_day,
                   max(doc_id % 365) AS max_lastmod_day
            FROM documents GROUP BY 1
        """,
        # planted-status WARC records round-tripped through the codec;
        # census keyed off the STATUS LINE the parser read back
        "warc_http_status": """
            WITH s AS (
              SELECT doc_id,
                     CAST(CASE WHEN doc_id % 37 = 3 THEN 404
                               WHEN doc_id % 41 = 5 THEN 301
                               WHEN doc_id % 53 = 7 THEN 500
                               ELSE 200 END AS BIGINT) AS http_status
              FROM documents)
            SELECT http_status, count(*) AS n_records,
                   min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
            FROM s GROUP BY 1
        """,
        # feeds: 2021-01-01 is epoch day 18628; item j of doc d is
        # dated 18628 + 7(d mod 1e5) + j (the modulo keeps dates in
        # datetime range at any corpus scale), so the latest is
        # 18628 + 7(d mod 1e5) + (1 + d%5)
        "feed_census": """
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'rss'
                        ELSE 'atom' END AS feed_type,
                   'Feed ' || CAST(doc_id AS VARCHAR) AS title,
                   CAST(1 + doc_id % 5 AS BIGINT) AS n_items,
                   CAST(18628 + (doc_id % 100000) * 7 + 1 + doc_id % 5
                        AS BIGINT) AS latest_day
            FROM documents
        """,
        # WCC: the oracle computes min-reachable-node per node with a
        # recursive CTE over the regenerated undirected edge set
        "link_components": """
            WITH RECURSIVE params AS (
                SELECT count(*) AS total FROM documents),
            edges AS (
              SELECT DISTINCT d.doc_id AS src,
                     (d.doc_id * 31 + 97 * j.j) % p.total AS dst
              FROM documents d CROSS JOIN params p
              JOIN range(1, 6) j(j) ON j.j <= 1 + d.doc_id % 5
              WHERE d.doc_id % 53 <> 11 AND d.doc_id % 41 <> 7
                AND (d.doc_id * 31 + 97 * j.j) % p.total <> d.doc_id),
            und AS (SELECT src AS a, dst AS b FROM edges
                    UNION SELECT dst, src FROM edges),
            reach(node, r) AS (
                SELECT a, a FROM und
                UNION
                SELECT reach.node, und.b
                FROM reach JOIN und ON und.a = reach.r
            )
            SELECT node, CAST(MIN(r) AS BIGINT) AS component
            FROM reach GROUP BY node
        """,
        "link_triangles": """
            WITH params AS (SELECT count(*) AS total FROM documents),
            edges AS (
              SELECT DISTINCT d.doc_id AS src,
                     (d.doc_id * 31 + 97 * j.j) % p.total AS dst
              FROM documents d CROSS JOIN params p
              JOIN range(1, 6) j(j) ON j.j <= 1 + d.doc_id % 5
              WHERE d.doc_id % 53 <> 11 AND d.doc_id % 41 <> 7
                AND (d.doc_id * 31 + 97 * j.j) % p.total <> d.doc_id)
            SELECT (SELECT count(*) FROM edges) AS n_edges,
                   (SELECT count(*) FROM edges a
                    JOIN edges b ON b.src = a.dst
                    JOIN edges c ON c.src = a.src AND c.dst = b.dst
                    WHERE a.src <> b.dst) AS n_triangles
        """,
        # generic agent: Disallow /s/*0$ overridden by the longer
        # Allow /s/*00$; specific agent group REPLACES the generic one
        # (RFC 9309 no-merge rule) and blocks only *5$
        "robots_filter": """
            SELECT doc_id,
                   (NOT (doc_id % 10 = 0 AND doc_id % 100 <> 0))
                       AS allowed_generic,
                   (doc_id % 10 <> 5) AS allowed_tesray
            FROM documents
        """,
    }
