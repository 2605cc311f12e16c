"""LM quality score: hand-computed trigram model on a tiny corpus."""
import math

import pyarrow as pa
import pyarrow.parquet as pq


def test_hand_computed_model(ray_session, tmp_path):
    from text_extraction_system_ray.pipelines.lmscore import \
        lm_quality_score
    d = tmp_path / "sf"
    d.mkdir()
    # trigrams: doc0 'abcd' -> abc, bcd; doc1 'abc' -> abc; doc2 '' -> none
    # counts: abc=2, bcd=1, total=3
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["abcd", "abc", ""], pa.string())}),
        d / "documents.parquet")
    df = (lm_quality_score(str(d)).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert df["n_trigrams"].tolist() == [2, 1, 0]
    p_abc, p_bcd = math.log(2 / 3), math.log(1 / 3)
    assert abs(df["lm_score"][0] - round((p_abc + p_bcd) / 2, 6)) < 2e-6
    assert abs(df["lm_score"][1] - round(p_abc, 6)) < 2e-6
    assert df["lm_score"][2] == 0.0
    # the common-trigram doc scores higher (more typical)
    assert df["lm_score"][1] > df["lm_score"][0]
