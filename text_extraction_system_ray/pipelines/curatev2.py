"""Flagship composition #2 — the PRETRAINING-PREP curation pipeline,
built entirely from this round's operators and SQL-mirrored end-to-end:

1. **C4 line filter** (``linefilter``): drop lorem-ipsum pages; keep
   docs with ≥ ``MIN_KEPT_LINES`` surviving lines; a doc's token count
   downstream is its KEPT-line token count (cleaned content only).
2. **Paragraph-dedup share rule** (``paradedup``): corpus-wide
   first-occurrence-wins over the planted paragraph structure; drop
   boilerplate-dominated docs (``2 · kept_paras < total_paras``).
3. **Mixture resample** (``mixture``): per-domain acceptance rates
   recomputed ON THE SURVIVORS (observed vs uniform target shares),
   md5 acceptance test — a true composition, not independent stages.
4. **Token budget** (``budget``): quality-ranked prefix of the
   resampled survivors until ``TOKEN_BUDGET`` kept-tokens.

Physical plan: ONE text scan computes per-doc (line-filter stats,
quality) — compact rows; paragraph stats come from the
``paragraph_dedup`` pipeline (its own single scan + hash shuffle).
Below the doc-count guard the compact per-doc tables merge on the
driver; above it the honest fallback is a native hash-partitioned
``Dataset.join`` chain feeding the distributed two-level budget scan
(``budget.select_budget_rows``).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from . import linefilter as _lf
from .budget import (_QLEVELS, SUB_BUCKET, _quality_and_counts,
                     select_budget_rows)
from .mixture import _domain_of, _rates_bp
from .paradedup import paragraph_dedup
from .shardshuffle import _keys

TOKEN_BUDGET = 5000
MIN_KEPT_LINES = 2


def _stats_batch(t: pa.Table) -> pa.Table:
    """One scan: line-filter survivor stats + quality per doc."""
    ids = t.column("doc_id").to_numpy()
    q, _ = _quality_and_counts(t.column("text").to_pylist())
    lf = _lf._filter_batch(t).to_pandas()        # survivors only
    qmap = pd.Series(q, index=ids)
    lf["quality"] = qmap.reindex(lf["doc_id"]).to_numpy()
    return pa.table({
        "doc_id": pa.array(lf["doc_id"].to_numpy(), pa.int64()),
        "n_kept_lines": pa.array(lf["n_kept"].to_numpy(), pa.int64()),
        "kept_tokens": pa.array(lf["kept_tokens"].to_numpy(),
                                pa.int64()),
        "quality": pa.array(lf["quality"].to_numpy(), pa.float64())})


def _finish_driver(lf: pd.DataFrame, pdp: pd.DataFrame,
                   budget: int) -> pd.DataFrame:
    m = lf[lf["n_kept_lines"] >= MIN_KEPT_LINES].merge(
        pdp[["doc_id", "n_paras", "n_kept"]], on="doc_id")
    m = m[2 * m["n_kept"] >= m["n_paras"]]
    ids = m["doc_id"].to_numpy()
    dom = _domain_of(ids)
    counts = (pd.Series(dom).value_counts().rename_axis("domain")
              .reset_index(name="n"))
    rates = _rates_bp(counts)
    bp = (_keys(ids) % np.uint64(10000)).astype(np.int64)
    rate = np.fromiter((rates[d] for d in dom), np.int64, len(dom))
    keep = bp < rate
    m = m[keep]
    dom = dom[keep]
    order = np.lexsort((m["doc_id"].to_numpy(),
                        -m["quality"].to_numpy()))
    nt = m["kept_tokens"].to_numpy()[order]
    cum = np.cumsum(nt)
    sel = cum <= budget
    out = pd.DataFrame({
        "doc_id": m["doc_id"].to_numpy()[order][sel],
        "domain": dom[order][sel],
        "quality": m["quality"].to_numpy()[order][sel],
        "n_tokens": nt[sel],
        "cum_tokens": cum[sel]})
    return out.sort_values("doc_id").reset_index(drop=True)


def curate_pretrain(sf_dir: str, budget: int = TOKEN_BUDGET):
    """(doc_id, domain, quality, n_tokens, cum_tokens) keep-list."""
    from .dedup import DRIVER_GROUP_DOC_LIMIT, _n_docs
    n_docs = _n_docs(sf_dir)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    lf_ds = docs.map_batches(_stats_batch, batch_format="pyarrow")
    pdp = paragraph_dedup(sf_dir)
    if n_docs <= DRIVER_GROUP_DOC_LIMIT:
        pdp_df = pdp if isinstance(pdp, pd.DataFrame) else \
            pdp.to_pandas()
        return _finish_driver(lf_ds.to_pandas(), pdp_df, budget)
    # ------- at-scale fallback: join chain + distributed budget scan
    pdp_keep = pdp.map_batches(
        lambda t: t.filter(pc.greater_equal(
            pc.multiply(t["n_kept"], pa.scalar(2, pa.int64())),
            t["n_paras"])).select(["doc_id"]),
        batch_format="pyarrow")
    surv = (lf_ds.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t["n_kept_lines"], pa.scalar(MIN_KEPT_LINES, pa.int64()))),
        batch_format="pyarrow")
        .join(pdp_keep, join_type="inner", num_partitions=16,
              on=("doc_id",)))

    def dom_bp(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return pa.table({
            "doc_id": t["doc_id"],
            "kept_tokens": t["kept_tokens"],
            "quality": t["quality"],
            "domain": pa.array(_domain_of(ids), pa.string()),
            "bp": pa.array((_keys(ids) % np.uint64(10000))
                           .astype(np.int64), pa.int64())})

    surv = surv.map_batches(dom_bp,
                            batch_format="pyarrow").materialize()
    counts = (surv.groupby("domain").count().to_pandas()
              .rename(columns={"count()": "n"}))
    rates_ref = ray.put(_rates_bp(counts))

    def accept(t: pa.Table) -> pa.Table:
        rates = ray.get(rates_ref)
        dom = t.column("domain").to_pylist()
        rate = np.fromiter((rates[d] for d in dom), np.int64, len(dom))
        keep = t.column("bp").to_numpy() < rate
        return t.filter(pa.array(keep))

    kept = surv.map_batches(accept, batch_format="pyarrow")

    def budget_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        q = t.column("quality").to_numpy()
        nt = t.column("kept_tokens").to_numpy()
        qkey = (10000 - np.rint(q * 10000.0)).astype(np.int64)
        gkey = qkey * _QLEVELS + ids // SUB_BUCKET
        ug, inv = np.unique(gkey, return_inverse=True)
        tot = np.zeros(len(ug), np.int64)
        np.add.at(tot, inv, nt)
        return pa.table({
            "doc_id": pa.array(np.concatenate(
                [ids, np.full(len(ug), -1)]), pa.int64()),
            "gkey": pa.array(np.concatenate([gkey, ug]), pa.int64()),
            "nt": pa.array(np.concatenate([nt, tot]), pa.int64()),
            "q": pa.array(np.concatenate([q, np.zeros(len(ug))]),
                          pa.float64())})

    rows = kept.map_batches(budget_rows,
                            batch_format="pyarrow").materialize()
    sel = select_budget_rows(rows, budget, n_docs=DRIVER_GROUP_DOC_LIMIT + 1)
    dommap = kept.select_columns(["doc_id", "domain"])
    return (sel.join(dommap, join_type="inner", num_partitions=16,
                     on=("doc_id",))
            .select_columns(["doc_id", "domain", "quality",
                             "n_tokens", "cum_tokens"])
            .sort("doc_id"))
