"""PII scrub: planted patterns are counted and masked; natural text
without PII passes through with zero counts and an unchanged digest."""
import hashlib

from text_extraction_system_ray.pipelines import pii as P


def test_planted_suffixes():
    assert "user4@example.com" in P.planted_pii_text(4, "x")
    assert "10.9.63.9" in P.planted_pii_text(9, "x")
    assert "555-1011" in P.planted_pii_text(11, "x")
    assert P.planted_pii_text(0, "plain") == "plain"


def test_stage_counts_and_digest():
    import pyarrow as pa
    t = pa.table({
        "doc_id": pa.array([4, 9, 11, 0], pa.int64()),
        "text": pa.array(["a", "b", "c", "clean words only"])})
    out = P.PiiRedactStage()(t).to_pandas().set_index("doc_id")
    assert out.loc[4, "n_emails"] == 2 and out.loc[4, "n_ips"] == 0
    assert out.loc[9, "n_ips"] == 1
    assert out.loc[11, "n_phones"] == 1
    assert out.loc[0].tolist()[:3] == [0, 0, 0]
    assert out.loc[0, "redacted_md5"] == hashlib.md5(
        b"clean words only").hexdigest()[:16]


def test_email_redaction_masks_whole_address():
    import pyarrow as pa
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["mail me at first.last+x@sub.host.org."])})
    out = P.PiiRedactStage()(t).to_pandas()
    assert out.loc[0, "n_emails"] == 1
    # digest equals the fully-masked string's digest
    assert out.loc[0, "redacted_md5"] == hashlib.md5(
        b"mail me at <EMAIL>.").hexdigest()[:16]
