"""Gopher document-quality rules (Rae et al. 2021) — integerized
thresholds, planted verdict cases."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from text_extraction_system_ray.pipelines.gopher import gopher_filter

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gopher")
    good = ("the quick brown fox jumps over that lazy dog and it has "
            "style to spare with plenty of natural language ") * 5
    cases = [
        (0, good),                                  # passes everything
        (1, "short text with the of and"),          # < 50 words
        (2, ("a b c d e f g h i j " * 10 + "the of and that be")),
        # mean word len < 3 → fails the length band
        (3, good + " ### " * 20),                   # symbol ratio high
        (4, " ".join("12345" for _ in range(80))),  # no alpha, no stops
        (5, ""),                                    # empty
    ]
    tbl = pa.table({
        "doc_id": pa.array([c[0] for c in cases], pa.int64()),
        "text": pa.array([c[1] for c in cases], pa.string()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_planted_verdicts(ray_session, planted_dir):
    df = gopher_filter(planted_dir).to_pandas().set_index("doc_id")
    assert bool(df.loc[0, "keep"])
    assert not df.loc[1, "keep"]          # too few words
    assert not df.loc[2, "keep"]          # mean word length too small
    assert not df.loc[3, "keep"]          # symbol ratio
    assert not df.loc[4, "keep"]          # no alpha words / stopwords
    assert not df.loc[5, "keep"]          # empty
    assert df.loc[5, "n_words"] == 0


def test_counts_match_python_reference(ray_session):
    df = gopher_filter(SF).to_pandas().set_index("doc_id")
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    for doc_id, text in list(zip(texts["doc_id"].to_pylist(),
                                 texts["text"].to_pylist()))[:50]:
        ws = (text or "").lower().split()
        row = df.loc[doc_id]
        assert row["n_words"] == len(ws)
        assert row["sum_word_chars"] == sum(len(w) for w in ws)
        assert row["n_alpha_words"] == sum(
            any("a" <= c <= "z" for c in w) for w in ws)
