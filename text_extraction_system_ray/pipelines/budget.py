"""Token-budget corpus selection: keep the highest-quality documents
until a global token budget is reached.

The standard "data-constrained" curation step (e.g. curated-subset
training: rank the corpus by a quality score, take the prefix whose
cumulative token count fits the training budget).  Semantics are a
global ``ORDER BY quality DESC, doc_id`` followed by a running
``SUM(n_tokens)`` and a ``cum <= BUDGET`` filter — but the engine never
globally sorts the data and never runs a driver pass over rows.

Distributed shape (same two-level scan as ``packing.py``, keyed by
quality instead of doc_id):

1. one ``map_batches`` over ``documents`` computes, per doc, the frozen
   quality score (identical formula to ``textstats.quality_score``) and
   the whitespace token count; it emits compact ``(doc_id, gkey, nt)``
   rows plus per-``gkey`` total partials.  ``gkey`` is the composite
   ``(10000 - quality*1e4) * 2^41 + doc_id // SUB`` — lexicographic in
   (quality desc, doc_id), and the ``doc_id // SUB`` sub-bucket bounds
   every group at ``SUB`` docs even when millions of docs tie on one
   quality value (the sessionize skew lesson).
2. ``groupby(gkey).sum`` over the partials — a small aggregate the
   driver exclusive-prefix-sums into per-group base offsets.  Groups
   whose base offset already exceeds the budget are pruned HERE: only
   the selected head of the corpus enters the final shuffle.
3. ``groupby(gkey).map_groups`` — each bounded group sorts by doc_id,
   inclusive-cumsums, adds its broadcast base, filters ``cum <= B``.

The quality formula and the budget constant are frozen and mirrored in
the SQL oracle (``__ray_entry__``), which recomputes the selection with
one window function.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from .textstats import STOPWORDS, _batch_tokens, _segment_sums
from .util import round_half_up

TOKEN_BUDGET = 1000
SUB_BUCKET = 4096
_QLEVELS = 1 << 41          # doc_id sub-bucket stride inside gkey


def _quality_and_counts(texts) -> tuple:
    """(quality 4dp, n_tokens) per text — textstats.quality_score's
    frozen formula, recomputed here so one pass yields both columns."""
    stop = frozenset(STOPWORDS)
    low = [(x or "").lower() for x in texts]
    flat, ptr = _batch_tokens(low)
    n = (ptr[1:] - ptr[:-1]).astype(np.float64)
    is_stop = (pd.Index(flat).isin(stop).astype(np.int64)
               if len(flat) else np.zeros(0, np.int64))
    stops = _segment_sums(is_stop, ptr).astype(np.float64)
    sr = round_half_up(np.where(n > 0, stops / np.maximum(n, 1), 0.0), 4)
    ls = round_half_up(np.minimum(1.0, n / 50.0), 4)
    q = round_half_up(0.5 * ls + 0.5 * sr, 4)
    return q, n.astype(np.int64)


def _rows_and_partials(t: pa.Table, sub: int) -> pa.Table:
    """Per-doc compact rows + per-gkey token-total partials (tagged
    ``doc_id = -1``; nt of a partial is the group total)."""
    ids = t.column("doc_id").to_numpy()
    q, nt = _quality_and_counts(t.column("text").to_pylist())
    qkey = (10000 - np.rint(q * 10000.0)).astype(np.int64)
    gkey = qkey * _QLEVELS + ids // sub
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


def _scan_group(g: pd.DataFrame, bases, budget: int) -> pd.DataFrame:
    g = g[g["doc_id"] >= 0].sort_values("doc_id")
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "quality": pd.Series([], dtype="float64"),
                          "n_tokens": pd.Series([], dtype="int64"),
                          "cum_tokens": pd.Series([], dtype="int64")})
    if len(g) == 0:
        return empty
    base = bases.get(int(g["gkey"].iloc[0]))
    if base is None:                 # group fully past the budget
        return empty
    nt = g["nt"].to_numpy()
    cum = base + np.cumsum(nt)
    keep = cum <= budget
    return pd.DataFrame({
        "doc_id": g["doc_id"].to_numpy()[keep],
        "quality": g["q"].to_numpy()[keep],
        "n_tokens": nt[keep],
        "cum_tokens": cum[keep]})


def _driver_finish(rows: "ray.data.Dataset", budget: int) -> pd.DataFrame:
    """Small-corpus finish: one lexsort over the compact rows on the
    driver (the ``exact_dedup`` adaptive pattern — a groupby shuffle
    into hundreds of tiny (qkey, sub) groups costs ~1 ms Python each,
    more than the whole reduction)."""
    t = rows.to_pandas()
    t = t[t["doc_id"] >= 0]
    ids = t["doc_id"].to_numpy()
    order = np.lexsort((ids, t["gkey"].to_numpy()))
    nt = t["nt"].to_numpy()[order]
    cum = np.cumsum(nt)
    keep = cum <= budget
    out = pd.DataFrame({
        "doc_id": ids[order][keep],
        "quality": t["q"].to_numpy()[order][keep],
        "n_tokens": nt[keep],
        "cum_tokens": cum[keep]})
    return out.sort_values("doc_id").reset_index(drop=True)


def select_budget_rows(rows: "ray.data.Dataset", budget: int,
                       n_docs: int):
    """Budget selection over a materialized compact row table
    (``doc_id, gkey, nt, q`` rows + tagged per-gkey partials — the
    output shape of :func:`_rows_and_partials`).  Reused by
    ``token_budget_select`` and the ``curate_pretrain`` composition.
    Small inputs finish on the driver; above the guard the two-level
    scan runs with the budget-pruned shuffle."""
    from .dedup import DRIVER_GROUP_DOC_LIMIT
    if n_docs <= DRIVER_GROUP_DOC_LIMIT:
        return _driver_finish(rows, budget)
    return _distributed_select(rows, budget)


def token_budget_select(sf_dir: str, budget: int = TOKEN_BUDGET,
                        sub_bucket: int = SUB_BUCKET):
    """Highest-quality prefix of the corpus within a token budget."""
    from .dedup import _n_docs
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    rows = ds.map_batches(lambda t: _rows_and_partials(t, sub_bucket),
                          batch_format="pyarrow").materialize()
    return select_budget_rows(rows, budget, _n_docs(sf_dir))


def _distributed_select(rows: "ray.data.Dataset", budget: int):
    totals = (rows.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 0))
                   .select(["gkey", "nt"]), batch_format="pyarrow")
        .groupby("gkey").aggregate(Sum("nt")).to_pandas())
    totals = totals.sort_values("gkey")
    tot = totals["sum(nt)"].to_numpy()
    base = np.concatenate([[0], np.cumsum(tot)[:-1]])
    live = base < budget             # prune groups past the budget
    bases_ref = ray.put(dict(zip(
        totals["gkey"].to_numpy()[live].astype(int), base[live])))
    live_keys = pa.array(totals["gkey"].to_numpy()[live].astype("int64"))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        return _scan_group(g, ray.get(bases_ref), budget)

    pruned = rows.map_batches(
        lambda t: t.filter(pc.is_in(t["gkey"], value_set=live_keys)),
        batch_format="pyarrow")
    return (pruned.groupby("gkey").map_groups(scan, batch_format="pandas")
            .select_columns(["doc_id", "quality", "n_tokens",
                             "cum_tokens"])
            .sort("doc_id"))
