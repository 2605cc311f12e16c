"""Behavioral tests for the late-r4 curation trio: token-budget
selection boundary semantics, paragraph-dedup first-wins ordering, and
the C4 line-filter rules (each rule exercised in isolation)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from text_extraction_system_ray.pipelines import budget as _budget
from text_extraction_system_ray.pipelines import linefilter as _lf
from text_extraction_system_ray.pipelines import paradedup as _para


def _df(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


def _write_docs(d, ids, texts):
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


# --------------------------------------------------------------- budget
def test_budget_boundary_and_order(ray_session, tmp_path):
    # 4 docs, no stopwords → quality = min(1, n/50)/2; token counts
    # 30, 20, 10, 5 → qualities 0.3, 0.2, 0.1, 0.05 (distinct).
    ids = [0, 1, 2, 3]
    texts = [" ".join(f"w{i}" for i in range(n)) for n in (30, 20, 10, 5)]
    d = _write_docs(tmp_path, ids, texts)
    # budget 60: doc0 (cum 30) + doc1 (cum 50) + doc2 (cum 60, exactly
    # at the budget → included); doc3 (cum 65) excluded
    df = _df(_budget.token_budget_select(d, budget=60))
    assert list(df["doc_id"]) == [0, 1, 2]
    assert list(df["cum_tokens"]) == [30, 50, 60]
    # budget 59: the boundary doc drops
    df = _df(_budget.token_budget_select(d, budget=59))
    assert list(df["doc_id"]) == [0, 1]


def test_budget_quality_ties_break_by_doc_id(ray_session, tmp_path):
    # identical texts → identical quality; selection order = doc_id
    ids = [5, 9, 2]
    texts = ["alpha beta gamma delta epsilon"] * 3   # 5 tokens each
    d = _write_docs(tmp_path, ids, texts)
    df = _df(_budget.token_budget_select(d, budget=10))
    assert list(df["doc_id"]) == [2, 5]              # lowest ids win
    # sub-bucketing must not change the result
    df2 = _df(_budget.token_budget_select(d, budget=10, sub_bucket=1))
    pd.testing.assert_frame_equal(df, df2)


# --------------------------------------------------------- paragraph dedup
def test_paragraph_firstwins_lowest_doc_then_idx():
    # two docs: doc 3 (no header: 3%3=0 → header! recompute) — use
    # pure helpers to pin the occ encoding instead
    assert _para._planted_paragraphs(0, "body")[0] == (
        "shared footer all rights reserved")
    assert _para._planted_paragraphs(1, "body")[0] == "promo block 1"
    assert _para._planted_paragraphs(8, "body") == ["body"]
    t = pa.table({"doc_id": pa.array([2, 5], pa.int64()),
                  "text": pa.array(["same text", "same text"])})
    occ = _para._occurrences(t)
    rows = occ.to_pandas()
    real = rows[rows["occ"] >= 0]
    # both bodies hash identically; first-wins = min occ = doc 2
    body = real[real["plen"] == len("same text")]
    hs = body.groupby("h")["occ"].min()
    assert any(v // _para._MAX_PARAS == 2 for v in hs.values)


def test_paragraph_dedup_within_and_across_docs(ray_session, tmp_path):
    # doc 2 and doc 5 share body text (both have no header/footer at
    # these ids?) — 2%3=2 no header, 2%4=2 footer; 5%3=2 no header,
    # 5%4=1 no footer.  Body dup across docs → doc 5 keeps nothing
    # but still reports n_paras.
    d = _write_docs(tmp_path, [2, 5], ["same body text", "same body text"])
    df = _df(_para.paragraph_dedup(d)).set_index("doc_id")
    assert df.loc[2, "n_paras"] == 2        # body + footer
    assert df.loc[2, "n_kept"] == 2
    assert df.loc[5, "n_paras"] == 1
    assert df.loc[5, "n_kept"] == 0         # body lost to doc 2
    assert df.loc[5, "kept_chars"] == 0


# ------------------------------------------------------------ line filter
def _stats_for(doc_id, text):
    t = pa.table({"doc_id": pa.array([doc_id], pa.int64()),
                  "text": pa.array([text], pa.string())})
    out = _lf._filter_batch(t).to_pandas()
    return out


def test_line_rules_each_in_isolation():
    # doc_id 11 matches no planted slot → only the body line ("text.")
    out = _stats_for(11, "three word body")
    assert out.iloc[0]["n_lines"] == 1 and out.iloc[0]["n_kept"] == 1
    assert out.iloc[0]["kept_tokens"] == 3
    # "two words." splits to 2 tokens → fails the >=3-words rule
    out = _stats_for(11, "two words")
    assert out.iloc[0]["n_lines"] == 1 and out.iloc[0]["n_kept"] == 0


def test_line_rules_planted_slots():
    # doc_id 0: body, 'click here for more' (no punct → drop),
    # closing sentence (kept)
    out = _stats_for(0, "alpha beta gamma")
    assert out.iloc[0]["n_lines"] == 3
    assert out.iloc[0]["n_kept"] == 2       # body + closing sentence
    # doc_id 3: body + javascript line (6%... 3%6=3) → js dropped
    out = _stats_for(3, "alpha beta gamma")
    assert out.iloc[0]["n_lines"] == 2
    assert out.iloc[0]["n_kept"] == 1
    # doc_id 36: 36%31=5 → lorem ipsum page killer: doc dropped
    out = _stats_for(36, "alpha beta gamma")
    assert len(out) == 0


def test_line_filter_dataset(ray_session, tmp_path):
    d = _write_docs(tmp_path, [0, 36], ["alpha beta gamma"] * 2)
    df = _lf.c4_line_filter(d).to_pandas()
    assert list(df["doc_id"]) == [0]


# ------------------------------------------------------------ shard shuffle
def test_shard_shuffle_is_permutation(ray_session):
    from text_extraction_system_ray.pipelines import shardshuffle as _ss
    df = _df(_ss.shard_shuffle("/root/testdata/sf0.001"))
    assert df["doc_id"].is_unique
    for s, g in df.groupby("shard"):
        pos = np.sort(g["pos"].to_numpy())
        assert (pos == np.arange(len(g))).all()     # contiguous ranks
    # md5 balance: no shard more than 2x the mean
    sizes = df.groupby("shard").size()
    assert len(sizes) == 8 and sizes.max() < 2 * sizes.mean()


def test_paragraph_dedup_paths_equal(ray_session, monkeypatch):
    """Driver finish and distributed shuffle plan produce identical
    output (the adaptive-guard contract)."""
    from text_extraction_system_ray.pipelines import dedup as _dedup
    from text_extraction_system_ray.pipelines import paradedup as _pd
    sf = "/root/testdata/sf0.001"
    fast = _pd.paragraph_dedup(sf)
    fast = fast if isinstance(fast, pd.DataFrame) else fast.to_pandas()
    monkeypatch.setattr(_dedup, "DRIVER_GROUP_DOC_LIMIT", 0)
    slow = _pd.paragraph_dedup(sf).to_pandas()
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True),
        check_dtype=False)


def test_budget_and_shard_paths_equal(ray_session, monkeypatch):
    """Driver finish == distributed plan for budget select and shard
    shuffle (the adaptive-guard contract)."""
    from text_extraction_system_ray.pipelines import dedup as _dedup
    from text_extraction_system_ray.pipelines import shardshuffle as _ss
    sf = "/root/testdata/sf0.001"
    fast_b = _df(_budget.token_budget_select(sf))
    fast_s = _df(_ss.shard_shuffle(sf))
    monkeypatch.setattr(_dedup, "DRIVER_GROUP_DOC_LIMIT", 0)
    slow_b = _df(_budget.token_budget_select(sf))
    slow_s = _df(_ss.shard_shuffle(sf))
    pd.testing.assert_frame_equal(fast_b.reset_index(drop=True),
                                  slow_b.reset_index(drop=True),
                                  check_dtype=False)
    pd.testing.assert_frame_equal(fast_s.reset_index(drop=True),
                                  slow_s.reset_index(drop=True),
                                  check_dtype=False)


def test_curate_pretrain_paths_equal(ray_session, monkeypatch):
    from text_extraction_system_ray.pipelines import curatev2 as _c2
    from text_extraction_system_ray.pipelines import dedup as _dedup
    sf = "/root/testdata/sf0.001"
    fast = _df(_c2.curate_pretrain(sf))
    assert len(fast) > 10            # the composition selects a real subset
    monkeypatch.setattr(_dedup, "DRIVER_GROUP_DOC_LIMIT", 0)
    slow = _df(_c2.curate_pretrain(sf))
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  slow.reset_index(drop=True),
                                  check_dtype=False)
