"""Decontamination: broadcast and partitioned-join plans must agree;
edge cases (short docs, the eval slice itself) behave as documented."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from text_extraction_system_ray.pipelines import decontam as D

SF_DIR = "/root/testdata/sf0.001"


def _df(res):
    return res.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_plans_agree(ray_session):
    a = _df(D.decontaminate(SF_DIR))
    b = _df(D.decontaminate(SF_DIR, force_shuffle=True))
    assert a.astype("int64").equals(b[a.columns].astype("int64"))
    # eval rows never appear in the output
    assert (a["doc_id"].to_numpy() % D.EVAL_MOD != D.EVAL_RESIDUE).all()
    assert ((a["contaminated"] == 1) == (a["n_shared"] > 0)).all()


def test_planted_contamination(ray_session, tmp_path):
    """A training doc copying an eval doc's text must be flagged with
    the exact distinct-gram count; clean and short docs must not."""
    eval_id = D.EVAL_RESIDUE           # 7 % 41 == 7 → eval slice
    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota"
    rows = {
        "doc_id": [eval_id, 1, 2, 3],
        "text": [eval_text,
                 eval_text,                       # full copy → 2 grams
                 "one two three four five",       # <8 tokens → no grams
                 "totally different words that share nothing with "
                 "anything else here today"],
        "lang": ["en"] * 4, "source": ["t"] * 4,
        "n_chars": [len(eval_text), len(eval_text), 23, 60],
    }
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({k: pa.array(v) for k, v in rows.items()}),
                   d / "documents.parquet")
    out = _df(D.decontaminate(str(d)))
    got = dict(zip(out["doc_id"], out["n_shared"]))
    # 9 tokens → 2 distinct 8-grams, both shared
    assert got == {1: 2, 2: 0, 3: 0}


def test_gram_hashes_short_and_empty():
    h, ptr = D._gram_hashes_batch(["", None, "a b", " ".join("x" * 1
        for _ in range(8))])
    assert list(ptr) == [0, 0, 0, 0, 1]
    assert h.dtype == np.int64
