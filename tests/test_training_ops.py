"""Behavioral tests for the training-data ops: dedup actually finds
planted duplicates, ANN actually ranks by cosine, multimodal decode
round-trips, fingerprints collide for near-identical docs."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from text_extraction_system_ray.pipelines import ann as _ann
from text_extraction_system_ray.pipelines import dedup as _dedup
from text_extraction_system_ray.pipelines.multimodal import (
    DecodeImages, encode_fake_image, _decode_stub)


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    """Synthetic documents table with planted exact + near duplicates."""
    d = tmp_path_factory.mktemp("dup")
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest to hide from the loud hunters") * 3
    texts, ids = [], []
    for i in range(40):
        ids.append(i)
        texts.append(f"unique document {i} " + " ".join(
            f"word{i}_{j}" for j in range(60)))
    # exact dups: 100/101 identical; near dups: 102/103 differ by one word
    ids += [100, 101, 102, 103]
    texts += [base, base, base, base.replace("green", "blue", 1)]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["en"] * len(ids), pa.string()),
                    "source": pa.array(["s"] * len(ids), pa.string()),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_exact_dedup_finds_planted(ray_session, dup_dir):
    df = _dedup.exact_dedup(dup_dir)
    dup_groups = df[df["n_dups"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups.iloc[0]["keep_doc_id"] == 100
    assert dup_groups.iloc[0]["n_dups"] == 3    # 100, 101, 102 share text


def test_minhash_finds_neardups(ray_session, dup_dir):
    pairs = _dedup.minhash_neardups(dup_dir, threshold=0.5)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (100, 101) in got          # identical
    assert (100, 102) in got          # exact text again
    assert (100, 103) in got or (102, 103) in got   # one-word diff
    # no false positives among the unique docs
    assert all(a >= 100 for a, b in got)


def test_minhash_jaccard_values(ray_session, dup_dir):
    pairs = _dedup.minhash_neardups(dup_dir, threshold=0.5)
    exact = pairs[(pairs["doc_a"] == 100) & (pairs["doc_b"] == 101)]
    assert float(exact["jaccard"].iloc[0]) == 1.0


def test_simhash_finds_neardups(ray_session, dup_dir):
    pairs = _dedup.simhash_neardups(dup_dir, max_hamming=3)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (100, 101) in got
    assert (100, 102) in got
    assert all(a >= 100 for a, b in got)


def test_ngram_jaccard_matches_minhash_verify(ray_session, dup_dir):
    pairs = _dedup.ngram_jaccard_pairs(dup_dir, threshold=0.5)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (100, 101) in got and (100, 102) in got


def test_ann_topk_self_is_best(ray_session):
    sf = "/root/testdata/sf0.001"
    df = _ann.cosine_topk(sf)
    for qid, g in df.groupby("query_id"):
        assert g.iloc[0]["vec_id"] == qid      # self-similarity = 1.0 tops
        assert g.iloc[0]["cos"] == 1.0
        assert len(g) == 10
        assert (g["cos"].values[:-1] >= g["cos"].values[1:]).all()


def test_ann_lsh_recall(ray_session):
    sf = "/root/testdata/sf0.001"
    exact = _ann.cosine_topk(sf)
    approx = _ann.lsh_cosine_topk(sf)
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # OR-construction multi-table LSH with Hamming-2 probing; this corpus's
    # neighbors sit at cos ~0.4-0.5 (the hard regime), so >=0.9 is a real bar
    assert sum(recalls) / len(recalls) >= 0.9


def test_fake_image_roundtrip():
    payload = encode_fake_image(16, 8, 3, seed=7)
    m = _decode_stub(payload)
    assert (m["width"], m["height"], m["channels"]) == (16, 8, 3)
    assert m["mode"] == "RGB"
    with pytest.raises(NotImplementedError):
        _decode_stub(b"PNGNOTSUPPORTED" + bytes(32))
    with pytest.raises(ValueError):
        _decode_stub(encode_fake_image(4, 4)[:-3])


def test_decode_stage_error_rows():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "image": pa.array([encode_fake_image(4, 4),
                                     b"garbage"], pa.binary())})
    out = DecodeImages()(t)
    assert out.column("status").to_pylist() == ["ok", "error"]
    assert out.column("width").to_pylist()[0] == 4


def test_ann_ivf_recall(ray_session):
    sf = "/root/testdata/sf0.001"
    exact = _ann.cosine_topk(sf)
    approx = _ann.ivf_cosine_topk(sf)
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # self vector is always in a probed list
    assert all(qid in set(approx[approx["query_id"] == qid]["vec_id"])
               for qid in exact["query_id"].unique())
    assert sum(recalls) / len(recalls) >= 0.8
