"""Per-source corpus mixture dashboard: the "what is my training mix"
aggregate every curation pipeline runs before sampling (docs, tokens,
mean quality, language spread per source/domain).

Scale shape: one ``map_batches`` over ``documents`` reduces each batch
to compact per-doc rows ``(source, lang, nt, q_int)`` — the text never
leaves the stage; ``q_int = round(quality * 1e4)`` is the repo's
scaled-int pattern so the mean is an exact integer sum both here and
in the SQL oracle (float summation order can flip a 4-decimal ROUND).
Then two small ``groupby`` aggregates: per-source sums, and distinct
``(source, lang)`` pair counts.  Group count == source count (tens to
thousands), so the tiny-group map_groups pathology does not apply.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from .budget import _quality_and_counts
from .util import round_half_up


def _doc_rows(t: pa.Table) -> pa.Table:
    q, nt = _quality_and_counts(t.column("text").to_pylist())
    return pa.table({
        "source": t["source"],
        "lang": t["lang"],
        "nt": pa.array(nt, pa.int64()),
        "q_int": pa.array(np.rint(q * 10000.0).astype(np.int64))})


def source_stats(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, n_tokens, avg_quality, n_langs) per source."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "lang", "text"])
    rows = ds.map_batches(_doc_rows, batch_format="pyarrow").materialize()
    agg = (rows.groupby("source")
           .aggregate(Count(alias_name="n_docs"),
                      Sum("nt", alias_name="n_tokens"),
                      Sum("q_int", alias_name="q_sum"))
           .to_pandas())
    langs = (rows.groupby(["source", "lang"]).count()
             .groupby("source").count().to_pandas()
             .rename(columns={"count()": "n_langs"}))
    out = agg.merge(langs, on="source")
    out["avg_quality"] = round_half_up(
        out["q_sum"].to_numpy() / 10000.0 / out["n_docs"].to_numpy(), 4)
    return (out[["source", "n_docs", "n_tokens", "avg_quality",
                 "n_langs"]]
            .sort_values("source").reset_index(drop=True))
