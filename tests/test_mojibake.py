"""Mojibake repair: codec round-trip edges on hand-built strings."""
import pyarrow as pa


def _repair(texts):
    from text_extraction_system_ray.pipelines.mojibake import repair_batch
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return repair_batch(t).to_pandas()


def test_repairs_real_mojibake():
    broken = "cafá©".replace("á©", "Ã©")  # 'café' damaged: é → Ã©
    assert broken == "cafÃ©"
    df = _repair([broken, "plain ascii stays"])
    assert df["was_fixed"].tolist() == [True, False]
    assert df["n_suspicious_before"].tolist() == [1, 0]
    import hashlib
    assert df["fixed_digest"][0] == hashlib.md5(
        "café".encode()).hexdigest()[:16]


def test_junk_signature_left_untouched():
    # 'Ã' followed by a char whose cp1252 bytes are NOT valid UTF-8:
    # strict round-trip fails, text must be left as-is
    junk = "Ãz not really mojibake"
    df = _repair([junk])
    assert df["was_fixed"].tolist() == [False]
    assert df["n_suspicious_before"].tolist() == [1]
    import hashlib
    assert df["fixed_digest"][0] == hashlib.md5(
        junk.encode("utf-8")).hexdigest()[:16]


def test_double_encoded_single_pass():
    # double-damaged text repairs one layer per pass (ftfy semantics
    # differ; ours documents single-pass) — still strictly better
    once = "é".encode("utf-8").decode("cp1252")          # 'Ã©'
    twice = once.encode("utf-8").decode("cp1252")        # 'Ã\x83Â©'-ish
    df = _repair([twice])
    assert df["was_fixed"].tolist() == [True]
    import hashlib
    assert df["fixed_digest"][0] == hashlib.md5(
        once.encode("utf-8")).hexdigest()[:16]
