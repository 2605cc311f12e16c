"""BPE: the textbook low/lower/newest example, hand-traced."""
import pyarrow as pa
import pyarrow.parquet as pq


def test_textbook_merges():
    from text_extraction_system_ray.functions.bpe import (
        EOW, encode_word, train_bpe_from_freqs)
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_from_freqs(freqs, 4)
    # hand trace: pair counts round 1 — ('e','s') 9, ('s','t') 9,
    # ('t','</w>') 9, ('l','o') 7, ('o','w') 7, ... tie at 9 broken
    # lexicographically: ('e','s') wins; then ('es','t') 9, then
    # ('est','</w>') 9, then ('l','o') 7
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW),
                      ("l", "o")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert encode_word("lowest", ranks) == ["lo", "w", "est</w>"]
    assert encode_word("low", ranks) == ["lo", "w", EOW]
    assert encode_word("zzz", ranks) == ["z", "z", "z", EOW]


def test_dataset_counts(ray_session, tmp_path):
    from text_extraction_system_ray.functions.bpe import bpe_token_counts
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["low low lower", ""], pa.string())}),
        d / "documents.parquet")
    df = (bpe_token_counts(str(d), n_merges=3).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert df["n_words"].tolist() == [3, 0]
    # merges on this corpus: ('l','o') 3, ('lo','w') 3, ('low','</w>') 2
    # low -> ['low</w>'] (1); lower -> ['low','e','r','</w>'] (4)
    assert df["n_bpe_tokens"].tolist() == [1 + 1 + 4, 0]
