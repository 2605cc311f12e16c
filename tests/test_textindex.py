"""Inverted text index: pruned reads + conjunctive semantics."""
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _build(tmp_path, docs):
    from text_extraction_system_ray.pipelines.textindex import \
        build_text_index
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}), sf / "documents.parquet")
    idx = str(tmp_path / "idx")
    build_text_index(str(sf), idx, n_parts=8)
    return idx


def test_and_semantics_and_tf(ray_session, tmp_path):
    from text_extraction_system_ray.pipelines.textindex import \
        query_text_index
    idx = _build(tmp_path, [
        "cat dog cat",      # 0: both terms, tf 2+1
        "cat only here",    # 1: missing dog
        "dog dog",          # 2: missing cat
        "dog cat",          # 3: both, tf 1+1
    ])
    df = (query_text_index(idx, ("cat", "dog")).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert df["doc_id"].tolist() == [0, 3]
    assert df["total_tf"].tolist() == [3, 2]


def test_lookup_reads_only_matching_partitions(ray_session, tmp_path):
    from text_extraction_system_ray.pipelines import textindex as TI
    idx = _build(tmp_path, ["alpha beta gamma delta"] * 3)
    import numpy as np
    need = set(TI._term_parts(np.asarray(["alpha"], dtype=object),
                              8).tolist())
    all_parts = {int(d.split("=")[1]) for d in os.listdir(idx)
                 if d.startswith("part=")}
    assert need < all_parts or len(all_parts) <= len(need)
    # a single-term query must produce rows without touching the rest
    df = (TI.query_text_index(idx, ("alpha",)).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert df["doc_id"].tolist() == [0, 1, 2]
    assert df["total_tf"].tolist() == [1, 1, 1]
