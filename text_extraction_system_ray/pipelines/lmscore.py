"""LM-based quality scoring, CCNet-lite: char-trigram perplexity.

CCNet (Wenzek et al. 2020) ranks crawl documents by the perplexity of a
small language model; low-probability documents are gibberish, boiler-
plate or the wrong language.  This is the same shape with a char-trigram
unigram LM trained on the corpus itself: p(g) = count(g)/total over ALL
documents, score(doc) = mean ln p(g) over the doc's trigrams (higher =
more typical).  Deterministic, self-contained, and — because the model
is just counts — exactly recomputable in SQL.

Scale shape: the model side is the canonical broadcast small side.  A
char-trigram vocabulary is bounded by |charset|³ (tens of thousands of
entries for web text) REGARDLESS of corpus size, so per-batch combiners
(``np.unique`` partials) reduce to a driver-merged count table that is
``ray.put`` once; scoring then streams every batch through one
``searchsorted`` against the broadcast arrays — no shuffle anywhere.
"""
from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .util import round_half_up

ROUND = 6


def _doc_trigrams(text: str) -> List[str]:
    return [text[i:i + 3] for i in range(len(text) - 2)]


def _trigram_partials(t: pa.Table) -> pa.Table:
    grams: List[str] = []
    for x in t.column("text").to_pylist():
        grams.extend(_doc_trigrams(x or ""))
    if not grams:
        return pa.table({"g": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    ug, cnt = np.unique(np.asarray(grams, dtype=object).astype(str),
                        return_counts=True)
    return pa.table({"g": pa.array(ug, pa.string()),
                     "cnt": pa.array(cnt.astype(np.int64), pa.int64())})


class _Score:
    def __init__(self, model_ref):
        self.grams, self.logp = ray.get(model_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = np.empty(t.num_rows, np.float64)
        n_g = np.empty(t.num_rows, np.int64)
        for i, x in enumerate(t.column("text").to_pylist()):
            gs = _doc_trigrams(x or "")
            n_g[i] = len(gs)
            if not gs:
                out[i] = 0.0
                continue
            garr = np.asarray(gs, dtype=object).astype(str)
            pos = np.searchsorted(self.grams, garr)
            pos = np.minimum(pos, len(self.grams) - 1)
            # every doc trigram is in the corpus-trained vocabulary by
            # construction; the clamp only guards dirty inputs
            hit = self.grams[pos] == garr
            lp = np.where(hit, self.logp[pos], np.log(1e-12))
            out[i] = lp.mean()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_trigrams": pa.array(n_g, pa.int64()),
            "lm_score": pa.array(round_half_up(out, ROUND),
                                 pa.float64())})


def lm_quality_score(sf_dir: str) -> ray.data.Dataset:
    """Train the trigram LM corpus-wide, broadcast, score every doc."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    parts = ds.map_batches(_trigram_partials, batch_format="pyarrow")
    # driver merge of the bounded vocabulary (|charset|³ ceiling)
    gs: List[np.ndarray] = []
    cs: List[np.ndarray] = []
    for b in parts.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            gs.append(np.asarray(b["g"].to_pylist(), dtype=object)
                      .astype(str))
            cs.append(b["cnt"].to_numpy())
    if gs:
        allg = np.concatenate(gs)
        allc = np.concatenate(cs)
        ug, inv = np.unique(allg, return_inverse=True)
        tot = np.zeros(len(ug), np.int64)
        np.add.at(tot, inv, allc)
    else:
        ug, tot = np.array([], str), np.zeros(0, np.int64)
    total = max(int(tot.sum()), 1)
    model_ref = ray.put((ug, np.log(tot / total)
                         if len(tot) else np.zeros(0)))
    return ds.map_batches(_Score,
                          fn_constructor_kwargs={"model_ref": model_ref},
                          batch_format="pyarrow", batch_size=256,
                          concurrency=(1, 8))
