"""Round-4 regression tests for the ADVICE r3 findings: the
clip-then-reduceat segment-sum corruption on batches ending with
empty-text docs (BM25 / textstats / simhash / minhash), the OCR-layer
removal terminating at a literal 'EMC' inside OCR'd text, and GIF
first-frame compositing (background index + overhang clipping)."""
import numpy as np
import pyarrow as pa


# ------------------------------------------------ reduceat-clip family
def test_bm25_term_stats_trailing_empty_doc():
    from text_extraction_system_ray.pipelines.retrieval import _doc_term_stats
    fn = _doc_term_stats(("spark",))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["x spark", ""])})
    out = fn(t)
    # the previous doc's tf must include its FINAL token even when the
    # batch ends with an empty doc (clipped reduceat gave [0, 0])
    assert out["tf0"].to_pylist() == [1, 0]
    assert out["dl"].to_pylist() == [2, 0]

    # empty docs interleaved + batch of only empties
    t2 = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                   "text": pa.array(["", "spark spark", ""])})
    assert fn(t2)["tf0"].to_pylist() == [0, 2, 0]
    t3 = pa.table({"doc_id": pa.array([1], pa.int64()),
                   "text": pa.array([""])})
    assert fn(t3)["tf0"].to_pylist() == [0]


def test_segment_sums_trailing_empty():
    from text_extraction_system_ray.pipelines.textstats import _segment_sums
    vals = np.array([1, 2], np.int64)
    ptr = np.array([0, 2, 2], np.int64)
    assert _segment_sums(vals, ptr).tolist() == [3, 0]
    # leading + middle empties
    ptr2 = np.array([0, 0, 1, 1, 2], np.int64)
    assert _segment_sums(vals, ptr2).tolist() == [0, 1, 0, 2]


def test_simhash_trailing_empty_doc_signature_stable():
    from text_extraction_system_ray.pipelines.dedup import SimhashStage
    stage = SimhashStage()
    alone = stage(pa.table({"doc_id": pa.array([1], pa.int64()),
                            "text": pa.array(["alpha beta gamma"])}))
    with_tail = stage(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma", ""])}))
    assert with_tail["simhash"][0].as_py() == alone["simhash"][0].as_py()
    assert with_tail["simhash"][1].as_py() == 0


def test_minhash_trailing_empty_doc_signature_stable():
    from text_extraction_system_ray.pipelines.dedup import (
        _batch_minhash, _perm_params, _shingle_batch, _MERSENNE)
    a, b = _perm_params()
    flat1, ptr1 = _shingle_batch(["one two three four"])
    flat2, ptr2 = _shingle_batch(["one two three four", "", ""])
    s1 = _batch_minhash(flat1, ptr1, a, b)
    s2 = _batch_minhash(flat2, ptr2, a, b)
    assert np.array_equal(s1[0], s2[0])
    assert (s2[1] == _MERSENNE).all() and (s2[2] == _MERSENNE).all()


# ------------------------------------------------ OCR layer structural end
def test_remove_ocr_layer_emc_in_ocr_text():
    from text_extraction_system_ray.config import PipelineConfig
    from text_extraction_system_ray.extract import extract_row
    from text_extraction_system_ray.functions.pdf_build import build_pdf
    from text_extraction_system_ray.functions.pdf_ops import (
        merge_text_layer_pdf, remove_ocr_layer)

    cfg = PipelineConfig()
    original = build_pdf([["Original digital text."]])
    base = extract_row("u", original, "", cfg)
    # OCR text containing the literal word EMC (and parens/escapes)
    merged = merge_text_layer_pdf(
        original, {1: "see the EMC rules (EMC) \\ EMC end"}, cfg)
    cleaned = remove_ocr_layer(merged, cfg)
    clean_row = extract_row("u", cleaned, "", cfg)
    assert clean_row["text"] == base["text"]
    assert "EMC" not in clean_row["text"]


def test_strip_ocr_layers_scanner_edges():
    from text_extraction_system_ray.functions.pdf_ops import _strip_ocr_layers
    # EMC inside a string literal is not the structural end
    c = b"q /OliveGeneratedContent BMC BT (word EMC word) Tj ET EMC Q"
    assert _strip_ocr_layers(c) == b"q  Q"
    # nested marked content balances
    c2 = b"/OliveGeneratedContent BMC /Other BMC x EMC y EMC tail"
    assert _strip_ocr_layers(c2) == b" tail"
    # a longer name is NOT our tag; unbalanced layer is left untouched
    c3 = b"/OliveGeneratedContentX BMC x EMC"
    assert _strip_ocr_layers(c3) == c3
    c4 = b"/OliveGeneratedContent BMC never closed"
    assert _strip_ocr_layers(c4) == c4
    # escaped paren inside the literal doesn't end the string
    c5 = b"/OliveGeneratedContent BMC (a\\) EMC) Tj EMC z"
    assert _strip_ocr_layers(c5) == b" z"


# ------------------------------------------------ GIF compositing
def _pack_lsb(codes, widths):
    acc = nbits = 0
    out = bytearray()
    for c, w in zip(codes, widths):
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_background_index_and_overhang_clip():
    from text_extraction_system_ray.functions.gif import decode_gif
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    table = b"".join(bytes(p) for p in palette)
    # logical screen 4x4, GCT of 4, BACKGROUND INDEX 1 (green)
    blob = b"GIF89a" + (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
    blob += bytes([0x81, 1, 0]) + table
    # 2x2 frame of palette[0] at (3,3) — overhangs the screen by 1px
    blob += b"\x2c" + (3).to_bytes(2, "little") + (3).to_bytes(2, "little")
    blob += (2).to_bytes(2, "little") + (2).to_bytes(2, "little") + b"\x00"
    codes = [4, 0, 0, 0, 0, 5]           # clear, 4×literal-0, end
    data = _pack_lsb(codes, [3] * len(codes))
    blob += bytes([2, len(data)]) + data + b"\x00\x3b"
    img = decode_gif(blob)
    assert img.shape == (4, 4, 3)
    assert tuple(img[0, 0]) == (0, 255, 0)      # background index 1
    assert tuple(img[3, 3]) == (255, 0, 0)      # clipped paste survives
