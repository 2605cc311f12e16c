"""Exact-substring window dedup: edge semantics on a hand-built corpus."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _run(tmp_path, docs):
    from text_extraction_system_ray.pipelines.substr import \
        substring_dup_stats
    d = tmp_path / f"sf{len(list(tmp_path.iterdir()))}"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}), d / "documents.parquet")
    return (substring_dup_stats(str(d)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_first_wins_and_edges(ray_session, tmp_path):
    docs = [
        "a b c d e f",          # 0: two windows (abcde, bcdef), both first
        "a b c d e f",          # 1: exact dup of 0 -> both windows dup
        "short doc",            # 2: < 5 words -> one whole-run window
        "",                     # 3: empty -> zero windows
        "short doc",            # 4: dup of 2's single window
        "x y x y x y x y x y",  # 5: within-doc repeats: 6 windows,
                                #    'x y x y x'(pos0)='...'(pos2)=(pos4),
                                #    'y x y x y'(pos1)=(pos3)=(pos5)
    ]
    df = _run(tmp_path, docs)
    assert df["n_windows"].tolist() == [2, 2, 1, 0, 1, 6]
    assert df["n_dup_windows"].tolist() == [0, 2, 0, 0, 1, 4]
    np.testing.assert_allclose(
        df["dup_fraction"], [0, 1, 0, 0, 1, 4 / 6], rtol=1e-12)


def test_shuffle_path_matches_driver_path(ray_session, tmp_path,
                                          monkeypatch):
    """Force the at-scale partitioned-shuffle branch (DRIVER limit 0)
    and pin it to the driver path's output."""
    from text_extraction_system_ray.pipelines import substr
    docs = ["a b c d e f", "a b c d e f", "short doc", "",
            "short doc", "x y x y x y x y x y"]
    base = _run(tmp_path, docs)
    monkeypatch.setattr(substr, "DRIVER_BYTES_LIMIT", 0)
    forced = _run(tmp_path, docs)
    pd.testing.assert_frame_equal(base, forced)
    assert forced["n_dup_windows"].tolist() == [0, 2, 0, 0, 1, 4]


def test_cross_doc_ordering_is_doc_id_not_input_order(ray_session,
                                                      tmp_path):
    # doc 1 contains the window that doc 0 also has: doc 0 is the
    # first occurrence regardless of file layout
    docs = ["p q r s t", "z p q r s t"]
    df = _run(tmp_path, docs)
    assert df["n_dup_windows"].tolist() == [0, 1]  # doc1's 'p q r s t'
    assert df["n_windows"].tolist() == [1, 2]


def test_case_and_whitespace_normalization(ray_session, tmp_path):
    docs = ["Alpha Beta\tGamma  Delta\nEpsilon", "alpha beta gamma delta epsilon"]
    df = _run(tmp_path, docs)
    assert df["n_dup_windows"].tolist() == [0, 1]
