"""PII redaction over the ``documents`` table.

The corpus-hygiene scrub every crawl pipeline runs before training
(C4 / CCNet drop or mask emails, IPs and phone numbers): replace each
match with a typed placeholder and count what was removed, so audits can
reconcile redaction volume per shard.

The synth corpus carries no natural PII, so the query plants it
deterministically from ``doc_id`` arithmetic (same pattern as the synth
image/video columns): a ``doc_id``-derived suffix containing an email,
an IPv4, or a phone-style number is appended for specific residues.
Both the engine and the DuckDB oracle build the identical planted text
and run the identical regexes (kept RE2-and-``re``-compatible: plain
character classes, bounded repeats, word boundaries — no backtracking
constructs), so the value hash pins the whole scrub.

Scale shape: one stateless ``map_batches`` over the corpus — compiled
patterns per actor, no shuffle, embarrassingly parallel.  The output
keeps only counts + a 16-hex digest of the redacted text (the redacted
payload itself would go to the shard sink in production).
"""
from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pyarrow as pa
import ray.data

# ordered: emails first (an email contains dots that could otherwise
# feed the IP pattern's context), then IPs, then phones
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"


def planted_pii_text(doc_id: int, text: str) -> str:
    """Deterministic PII suffix — keep in sync with the SQL oracle."""
    r = doc_id % 13
    if r == 4:
        return (f"{text} contact user{doc_id}@example.com or "
                f"admin{doc_id}@test.org")
    if r == 9:
        return (f"{text} server at 10.{doc_id % 256}."
                f"{(doc_id * 7) % 256}.{doc_id % 100} port 80")
    if r == 11:
        return f"{text} call 555-{1000 + doc_id % 9000} now"
    return text


class PiiRedactStage:
    """Actor-pool scrub stage: patterns compiled once per actor."""

    def __init__(self):
        self.email = re.compile(EMAIL_RE)
        self.ipv4 = re.compile(IPV4_RE)
        self.phone = re.compile(PHONE_RE)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        n = len(texts)
        ne = np.zeros(n, np.int64)
        ni = np.zeros(n, np.int64)
        np_ = np.zeros(n, np.int64)
        digests: List[str] = []
        for i, (d, x) in enumerate(zip(ids, texts)):
            s = planted_pii_text(int(d), x or "")
            s, ne[i] = self.email.subn("<EMAIL>", s)
            s, ni[i] = self.ipv4.subn("<IP>", s)
            s, np_[i] = self.phone.subn("<PHONE>", s)
            digests.append(
                hashlib.md5(s.encode("utf-8")).hexdigest()[:16])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_emails": pa.array(ne, pa.int64()),
            "n_ips": pa.array(ni, pa.int64()),
            "n_phones": pa.array(np_, pa.int64()),
            "redacted_md5": pa.array(digests, pa.string())})


def pii_redact(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(PiiRedactStage, batch_format="pyarrow",
                          batch_size=512, concurrency=(1, 8))


PII_REDACT_SQL = """
    WITH planted AS (
        SELECT doc_id,
               CASE doc_id % 13
                   WHEN 4 THEN text || ' contact user' || doc_id ||
                       '@example.com or admin' || doc_id || '@test.org'
                   WHEN 9 THEN text || ' server at 10.' ||
                       (doc_id % 256) || '.' || ((doc_id * 7) % 256) ||
                       '.' || (doc_id % 100) || ' port 80'
                   WHEN 11 THEN text || ' call 555-' ||
                       (1000 + doc_id % 9000) || ' now'
                   ELSE text
               END AS s
        FROM documents
    ), e AS (
        SELECT doc_id,
               len(regexp_extract_all(s, '{email}')) AS n_emails,
               regexp_replace(s, '{email}', '<EMAIL>', 'g') AS s
        FROM planted
    ), i AS (
        SELECT doc_id, n_emails,
               len(regexp_extract_all(s, '{ipv4}')) AS n_ips,
               regexp_replace(s, '{ipv4}', '<IP>', 'g') AS s
        FROM e
    ), p AS (
        SELECT doc_id, n_emails, n_ips,
               len(regexp_extract_all(s, '{phone}')) AS n_phones,
               regexp_replace(s, '{phone}', '<PHONE>', 'g') AS s
        FROM i
    )
    SELECT doc_id, n_emails, n_ips, n_phones,
           substr(md5(s), 1, 16) AS redacted_md5
    FROM p
""".format(email=EMAIL_RE, ipv4=IPV4_RE, phone=PHONE_RE)
# (DuckDB single-quoted literals keep backslashes verbatim, so the
# patterns drop in unescaped — RE2 sees exactly what ``re`` compiled)
