"""Mojibake (encoding-damage) detection and repair, ftfy-style.

The classic web-crawl defect: UTF-8 bytes misread as cp1252, turning
"á" into "Ã¡" ("é" → "Ã©", …).  The repair inverts the damage with the
real codecs — ``s.encode("cp1252").decode("utf-8")`` — exactly ftfy's
core move, applied only where the Ã/Â signature appears and only when
the round-trip strictly succeeds (junk that merely *looks* like
mojibake is left untouched and counted).

The corpus text is pure ASCII, so the op deterministically plants
accents on ``doc_id % 7 == 2`` rows (a→á, e→é) and corrupts them with
the real encoder chain; the SQL oracle reconstructs BOTH the corrupted
text (a→'Ã¡', e→'Ã©') and the expected repaired text (the accented
string) from ``documents.text``, so the engine's codec round-trip is
value-checked end to end — a wrong byte anywhere breaks the digest.

Scale shape: detection is a vectorized Arrow regex over the whole
column; the python repair loop touches ONLY the rows that match the
signature (sparse in real crawls), and each repair is one C-codec
round-trip.  No shuffle anywhere — the op is embarrassingly parallel.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# UTF-8 lead bytes 0xC2-0xC3 read as cp1252 yield Ã/Â — the signature
# of single-pass mojibake for Latin-script text
_SIGNATURE = "Ã|Â"


def corrupt_texts(t: pa.Table) -> pa.Table:
    """Plant accents on doc_id%7==2 rows, then mojibake them for real."""
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    out = []
    for d, x in zip(ids, texts):
        x = x or ""
        if d % 7 == 2:
            x = (x.replace("a", "á").replace("e", "é")
                 .encode("utf-8").decode("cp1252"))
        out.append(x)
    return pa.table({"doc_id": t.column("doc_id"),
                     "text": pa.array(out, pa.string())})


def repair_batch(t: pa.Table) -> pa.Table:
    """The real op: signature-gated strict codec round-trip repair."""
    texts = t.column("text")
    sus = pc.count_substring_regex(texts, _SIGNATURE).to_numpy()
    fixed = texts.to_pylist()
    was_fixed = np.zeros(len(fixed), bool)
    for i in np.nonzero(sus > 0)[0]:
        s = fixed[i]
        try:
            repaired = s.encode("cp1252").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
        fixed[i] = repaired
        was_fixed[i] = True
    digests = [hashlib.md5((s or "").encode("utf-8")).hexdigest()[:16]
               for s in fixed]
    return pa.table({
        "doc_id": t.column("doc_id"),
        "was_fixed": pa.array(was_fixed.tolist(), pa.bool_()),
        "n_suspicious_before": pa.array(sus.astype(np.int64),
                                        pa.int64()),
        "fixed_digest": pa.array(digests, pa.string())})


def fix_mojibake(sf_dir: str) -> ray.data.Dataset:
    """Synth-corrupt → repair; per-doc repair report (SQL-checked)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return (ds.map_batches(corrupt_texts, batch_format="pyarrow")
            .map_batches(repair_batch, batch_format="pyarrow"))
