"""Sequence packing: hand-computed layout + multi-bucket stitching."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, docs):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}), d / "documents.parquet")
    return str(d)


def test_layout_hand_computed(ray_session, tmp_path):
    from text_extraction_system_ray.pipelines import packing
    # tokens+EOS extents: doc0 [0,4) doc1 [4,5) doc2 [5,11) doc3 [11,13)
    docs = ["a b c", "", "p q r s t", "x"]
    df = (packing.pack_sequences(_write(tmp_path, docs), seq_len=4)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert df["n_tokens"].tolist() == [3, 0, 5, 1]
    assert df["start_off"].tolist() == [0, 4, 5, 11]
    # seq extent uses the EOS-inclusive end (off + nt) // L
    assert df["seq_first"].tolist() == [0, 1, 1, 2]
    assert df["seq_last"].tolist() == [0, 1, 2, 3]


def test_multi_bucket_scan_stitches(ray_session, tmp_path):
    from text_extraction_system_ray.pipelines import packing
    rng = np.random.RandomState(7)
    docs = [" ".join("w" * 1 for _ in range(rng.randint(0, 9)))
            for _ in range(50)]
    df = (packing.pack_sequences(_write(tmp_path, docs), bucket_size=4)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    nt = np.array([len(x.split()) for x in docs])
    off = np.concatenate([[0], np.cumsum(nt + 1)[:-1]])
    assert df["n_tokens"].tolist() == nt.tolist()
    assert df["start_off"].tolist() == off.tolist()
    assert df["seq_first"].tolist() == (off // packing.SEQ_LEN).tolist()
    assert df["seq_last"].tolist() == ((off + nt)
                                       // packing.SEQ_LEN).tolist()
