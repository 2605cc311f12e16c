"""Mergeable distinct-count sketch (HyperLogLog, Flajolet et al. 2007).

THE at-scale cardinality op: exact COUNT(DISTINCT) over 10^12 rows is
a full shuffle of every key; HLL reduces it to a 1024-cell register
that merges by elementwise max — each batch emits its bucket-max
partials (the combiner), one tiny groupby-max merges them, and the
driver finishes a 1024-row register. No text ever leaves the batch.

Exactness engineering (the whole sketch is ORACLE-REPRODUCIBLE):
  - hash = md5-low64 (the repo's oracle-parity hash; DuckDB recomputes
    it with ``CAST(concat('0x', substr(md5(x),1,16)) AS UBIGINT)``).
  - bucket = top 10 bits, w = low 54 bits, rho = min(55 - bitlen(w), 40)
    with bitlen computed by INTEGER binary reduction (never float log2 —
    exact up to the 2^53 double boundary is not good enough).
  - The register sum Σ 2^-M_j is carried as the exact int64 numerator
    ``Σ 2^(40 - M_j)`` over denominator 2^40 (capping rho at 40 keeps
    the worst case 1024·2^39 = 2^49 inside int64), so the raw-estimate
    division is a single IEEE op on identical operands in numpy and
    DuckDB. Small-range correction (linear counting) uses libm ln on
    identical operands; the output rounds to 4 decimals so a 1-ulp libm
    difference cannot flip the compare.
"""
from __future__ import annotations

import math
from typing import List

import numpy as np
import pyarrow as pa
import ray.data

from .decontam import _md5_low64

P = 10                    # register index bits
M = 1 << P                # 1024 buckets
W_BITS = 64 - P           # 54-bit remainder
RHO_CAP = 40              # keeps the exact numerator inside int64
ALPHA = 0.7213 / (1.0 + 1.079 / M)


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length (no float log2)."""
    w = w.copy()
    bl = np.zeros(len(w), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m_ = w >= (np.uint64(1) << np.uint64(s))
        bl[m_] += s
        w[m_] >>= np.uint64(s)
    bl += (w > 0)
    return bl


def register_partials(texts: List[str]) -> pa.Table:
    """One batch of values → (bucket, max rho) partial register rows."""
    h = _md5_low64([t or "" for t in texts])
    bucket = (h >> np.uint64(W_BITS)).astype(np.int64)
    w = (h & np.uint64((1 << W_BITS) - 1))
    rho = np.minimum(W_BITS + 1 - _bitlen_u64(w), RHO_CAP)
    mx = np.zeros(M, np.int64)
    np.maximum.at(mx, bucket, rho)
    nz = np.nonzero(mx)[0]
    return pa.table({"bucket": pa.array(nz, pa.int64()),
                     "max_rho": pa.array(mx[nz], pa.int64())})


def finish(buckets: np.ndarray, max_rho: np.ndarray) -> dict:
    """Merged register → estimate row (integer-exact numerator)."""
    reg = np.zeros(M, np.int64)
    np.maximum.at(reg, buckets, max_rho)
    zero_buckets = int((reg == 0).sum())
    numerator = int((np.int64(1) << (RHO_CAP - reg)).sum())
    raw = ALPHA * M * M * float(1 << RHO_CAP) / numerator
    if raw <= 2.5 * M and zero_buckets > 0:
        est = M * math.log(M / zero_buckets)
    else:
        est = raw
    return {"m": M, "zero_buckets": zero_buckets,
            "rho_numerator": numerator, "estimate": round(est, 4)}


def hll_distinct_text(sf_dir: str) -> pa.Table:
    """HLL distinct-text estimate over documents: one row
    (m, zero_buckets, rho_numerator, estimate)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    partials = ds.map_batches(
        lambda t: register_partials(t.column("text").to_pylist()),
        batch_format="pyarrow")
    merged = partials.groupby("bucket").max("max_rho")
    rows = merged.take_all()          # ≤ 1024 rows — the sketch itself
    row = finish(np.array([r["bucket"] for r in rows], np.int64),
                 np.array([r["max(max_rho)"] for r in rows], np.int64))
    return pa.table({k: pa.array([v]) for k, v in row.items()})


# --- KMV / theta sketch (k-minimum-values) -----------------------------
# HLL cannot intersect; KMV can: keep the k smallest hashes per key and
# set operations on sketches estimate set operations on the data
# (Beyer et al. 2007). Per-batch partials emit at most k rows per
# source; the driver finishes tiny (n_sources × k) hash lists. Being a
# pure function of the k smallest md5 values, the sketch — estimates
# included — is exactly reproducible in SQL (ROW_NUMBER ≤ k).
KMV_K = 16


def kmv_partials(sources: List[str], texts: List[str]) -> pa.Table:
    """Sketch the per-source VOCABULARY (distinct lowercased whitespace
    tokens — the same tokenization the vocab/jaccard oracles use).
    Vocabulary overlap across sources is dense, so the theta
    intersection below has real signal (a text-level sketch on this
    corpus never intersects — every doc text is source-unique)."""
    import numpy as np
    per_src_words: dict = {}
    for s, t in zip(sources, texts):
        per_src_words.setdefault(s, set()).update(
            (t or "").lower().split())
    out_s, out_h = [], []
    for s in sorted(per_src_words):
        words = sorted(per_src_words[s])
        hs = np.sort(np.unique(_md5_low64(words)))[:KMV_K] \
            if words else np.array([], np.uint64)
        out_s.extend([str(s)] * len(hs))
        out_h.extend(hs.tolist())
    return pa.table({"source": pa.array(out_s, pa.string()),
                     "hu": pa.array(np.array(out_h, np.uint64)
                                    .view(np.int64), pa.int64())})


def _kmv_merge(rows) -> dict:
    """rows of (source, hu-int64-view) → {source: sorted uint64 k-mins}."""
    import numpy as np
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["hu"])
    return {s: np.sort(np.unique(np.array(v, np.int64).view(np.uint64)
                                 ))[:KMV_K]
            for s, v in by_src.items()}


def kmv_source_sketch(sf_dir: str) -> pa.Table:
    """(source, k_kept, kth_hash, distinct_est) per source."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    partials = ds.map_batches(
        lambda t: kmv_partials(t.column("source").to_pylist(),
                               t.column("text").to_pylist()),
        batch_format="pyarrow")
    merged = _kmv_merge(partials.take_all())
    rows = []
    for s in sorted(merged):
        hs = merged[s]
        k_kept = len(hs)
        kth = int(hs[-1])
        if k_kept < KMV_K:
            est = float(k_kept)
        else:
            est = (KMV_K - 1) * float(1 << 64) / float(kth)
        # int64 two's-complement VIEW of the uint64 hash (np.int64(big)
        # would overflow; the SQL mirror applies the same 2^64 fold)
        kth_i64 = np.array([kth], np.uint64).view(np.int64)[0].item()
        rows.append({"source": s, "k_kept": k_kept,
                     "kth_hash": kth_i64,
                     "distinct_est": round(est, 4)})
    return pa.table({k: pa.array([r[k] for r in rows])
                     for k in ["source", "k_kept", "kth_hash",
                               "distinct_est"]})


def kmv_source_overlap(sf_dir: str) -> pa.Table:
    """Cross-source overlap from the sketches alone: for each source
    pair, union the two k-min lists, keep the k smallest, and count how
    many sit in BOTH sketches — the theta-sketch intersection sample
    (exactly reproducible in SQL)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    partials = ds.map_batches(
        lambda t: kmv_partials(t.column("source").to_pylist(),
                               t.column("text").to_pylist()),
        batch_format="pyarrow")
    merged = _kmv_merge(partials.take_all())
    srcs = sorted(merged)
    out = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            ha, hb = set(merged[a].tolist()), set(merged[b].tolist())
            union_k = sorted(ha | hb)[:KMV_K]
            common = sum(1 for h in union_k if h in ha and h in hb)
            out.append({"source_a": a, "source_b": b,
                        "n_common_in_unionk": common})
    return pa.table({k: pa.array([r[k] for r in out])
                     for k in ["source_a", "source_b",
                               "n_common_in_unionk"]})


# --- hash-bottom-k uniform sample → quantile estimates -----------------
# Classic order-independent quantile sketches (KLL/GK) compact by
# arrival order, which kills oracle reproducibility. Bottom-k BY HASH
# is the deterministic alternative used in practice: the k rows with
# the smallest md5(rowkey) are a uniform sample fixed by the DATA, not
# the schedule — per-batch bottom-k partials merge by global bottom-k,
# and the quantile estimates (np linear interpolation ≡ SQL
# quantile_cont) reproduce exactly.
QSAMPLE_K = 1024


def qsample_partials(keys: List[str], values) -> pa.Table:
    """Bottom-k DISTINCT hashes with min-value tie resolution — the
    fixture's keys are NOT unique (45.8k distinct over 60k lineitem
    rows), so without dedup the sample MULTISET depends on which copies
    each batch truncates (schedule-dependent). (hash → min value) makes
    the sample a pure function of the data."""
    import numpy as np
    h = _md5_low64(keys)
    vals = np.asarray(values, np.float64)
    order = np.lexsort((vals, h))            # by hash, then value
    h, vals = h[order], vals[order]
    first = np.concatenate([[True], h[1:] != h[:-1]])
    h, vals = h[first], vals[first]          # min value per distinct hash
    return pa.table({"hu": pa.array(h[:QSAMPLE_K].view(np.int64)),
                     "value": pa.array(vals[:QSAMPLE_K], pa.float64())})


def hash_sample_quantiles(sf_dir: str) -> pa.Table:
    """Quantiles of lineitem.l_extendedprice from a deterministic
    1024-row hash-bottom-k sample: one row
    (n_sample, q25, q50, q75, q95)."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"])

    def partials(t: pa.Table) -> pa.Table:
        keys = [f"{o}-{ln}" for o, ln in
                zip(t.column("l_orderkey").to_pylist(),
                    t.column("l_linenumber").to_pylist())]
        return qsample_partials(
            keys, t.column("l_extendedprice").to_numpy(
                zero_copy_only=False))

    rows = ds.map_batches(partials, batch_format="pyarrow").take_all()
    h = np.array([r["hu"] for r in rows], np.int64).view(np.uint64)
    v = np.array([r["value"] for r in rows], np.float64)
    order = np.lexsort((v, h))               # same merge rule as partials
    h, v = h[order], v[order]
    first = np.concatenate([[True], h[1:] != h[:-1]])
    sample = v[first][:QSAMPLE_K]
    qs = {f"q{int(q * 100)}": round(float(np.quantile(sample, q)), 6)
          for q in (0.25, 0.5, 0.75, 0.95)}
    out = {"n_sample": len(sample), **qs}
    return pa.table({k: pa.array([val]) for k, val in out.items()})


# --- Bloom filter (oracle-reproducible bits) ---------------------------
# The shared-membership-index class: build a bit array over corpus keys,
# probe another set. Kirsch-Mitzenmacher double hashing over the two
# md5-low64 halves gives k=7 positions per key; working mod BLOOM_M in
# SMALL integers keeps both numpy and DuckDB overflow-free, so the BIT
# ARRAY — false positives included — reproduces exactly in SQL.
BLOOM_M = 1 << 17          # bits
BLOOM_K = 7


def _md5_two_halves(keys: List[str]):
    """(low64(md5), next64(md5)) — both hex substrings, oracle-parity."""
    import numpy as np
    try:
        import duckdb
        if keys:
            con = duckdb.connect()
            gt = pa.table({"g": pa.array(keys, pa.string())})
            con.register("gt", gt)
            out = con.execute(
                "SELECT CAST(concat('0x', substr(md5(g), 1, 16)) AS UBIGINT)"
                " AS h1, CAST(concat('0x', substr(md5(g), 17, 16)) AS"
                " UBIGINT) AS h2 FROM gt").arrow()
            con.close()
            return (out["h1"].to_numpy().astype(np.uint64),
                    out["h2"].to_numpy().astype(np.uint64))
    except ImportError:                      # pragma: no cover - env gate
        pass
    import hashlib
    d = [hashlib.md5((g or "").encode()).digest() for g in keys]
    return (np.array([int.from_bytes(x[:8], "big") for x in d], np.uint64),
            np.array([int.from_bytes(x[8:16], "big") for x in d], np.uint64))


def bloom_positions(keys: List[str]):
    """(n, BLOOM_K) int64 bit positions per key."""
    import numpy as np
    h1, h2 = _md5_two_halves(keys)
    a = (h1 % BLOOM_M).astype(np.int64)
    b = (h2 % BLOOM_M).astype(np.int64)
    i = np.arange(BLOOM_K, dtype=np.int64)
    return (a[:, None] + i[None, :] * b[:, None]) % BLOOM_M


def bloom_probe(sf_dir: str) -> pa.Table:
    """Build a bloom over documents.text; probe half the corpus texts
    (present) plus planted 'absent-{doc_id}' strings. Output
    (probe_id, hit) — false positives and all reproduce in SQL."""
    import numpy as np

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def set_bits(t: pa.Table) -> pa.Table:
        pos = bloom_positions(t.column("text").to_pylist())
        return pa.table({"bit": pa.array(np.unique(pos), pa.int64())})

    bits_rows = ds.map_batches(set_bits, batch_format="pyarrow") \
                  .groupby("bit").count().take_all()
    bitmap = np.zeros(BLOOM_M, bool)
    bitmap[[r["bit"] for r in bits_rows]] = True
    bitmap_ref = ray.put(bitmap)

    def probe(t: pa.Table, ref=bitmap_ref) -> pa.Table:
        bm = ray.get(ref)
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        probe_ids, keys = [], []
        for d, txt in zip(ids, texts):
            if d % 2 == 0:
                probe_ids.append(int(d))
                keys.append(txt or "")
            else:
                probe_ids.append(int(d) + 10_000_000)
                keys.append(f"absent-{d}")
        pos = bloom_positions(keys)
        hit = bm[pos].all(axis=1)
        return pa.table({"probe_id": pa.array(probe_ids, pa.int64()),
                         "hit": pa.array(hit)})

    return ds.map_batches(probe, batch_format="pyarrow")


# ----------------------------------------------- Count-Min heavy hitters

CMS_D = 4                  # hash rows
CMS_W = 2048               # counters per row
CMS_TOPK = 20


def _cms_cols(terms: List[str]) -> "np.ndarray":
    """(n, CMS_D) int64 counter columns per term — Kirsch-Mitzenmacher
    double hashing over the md5 halves, small-modulus arithmetic so
    numpy and DuckDB never overflow (the bloom_probe discipline)."""
    import numpy as np
    h1, h2 = _md5_two_halves(terms)
    a = (h1 % CMS_W).astype(np.int64)
    b = (h2 % CMS_W).astype(np.int64)
    r = np.arange(CMS_D, dtype=np.int64)
    return (a[:, None] + r[None, :] * b[:, None]) % CMS_W


def cms_heavy_hitters(sf_dir: str, k: int = CMS_TOPK) -> pa.Table:
    """Top-``k`` corpus terms by Count-Min ESTIMATE (Cormode &
    Muthukrishnan 2005), ties → term ASC; each row also carries the
    exact count so the CMS overestimate property (est ≥ exact) is
    visible in the result.

    Scale shape: sketch build is per-batch distinct-term combiners →
    (cell, count) increments → ONE tiny groupby over ≤ D·W cells (the
    counter matrix is 4×2048 = 64 KiB regardless of corpus size —
    that is the point of the sketch); the matrix broadcasts via
    ``ray.put`` and candidate generation reuses vocab_topk's
    term-partitioned top-k plan, keyed by estimate. Integer-exact
    end-to-end, so the DuckDB oracle rebuilds the counter matrix and
    the estimates bit-for-bit."""
    import numpy as np

    from .textstats import _vocab_partials

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    partials = ds.map_batches(_vocab_partials,
                              batch_format="pyarrow").materialize()

    def cells(t: pa.Table) -> pa.Table:
        terms = t.column("term").to_pylist()
        cnt = t.column("cnt").to_numpy()
        if not terms:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        cols = _cms_cols(terms)
        key = (np.arange(CMS_D, dtype=np.int64)[None, :] * CMS_W
               + cols).ravel()
        c = np.repeat(cnt, CMS_D)
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.bincount(inv, weights=c.astype(np.float64))
        return pa.table({"cell": pa.array(uk, pa.int64()),
                         "c": pa.array(sums.astype(np.int64), pa.int64())})

    cms = np.zeros(CMS_D * CMS_W, np.int64)
    for r in (partials.map_batches(cells, batch_format="pyarrow")
              .groupby("cell").sum("c").take_all()):
        cms[r["cell"]] = r["sum(c)"]
    cms_ref = ray.put(cms)

    def part_topk(g: pa.Table) -> pa.Table:
        table = ray.get(cms_ref)
        terms_all = np.asarray(g.column("term").to_pylist(), dtype=object)
        cnt_all = g.column("cnt").to_numpy()
        terms_u, inv = np.unique(terms_all.astype(str),
                                 return_inverse=True)
        exact = np.bincount(inv, weights=cnt_all.astype(np.float64)) \
            .astype(np.int64)
        cols = _cms_cols(list(terms_u))
        est = table[(np.arange(CMS_D, dtype=np.int64)[None, :] * CMS_W
                     + cols)].min(axis=1)
        order = np.lexsort((terms_u, -est))[:k]
        return pa.table({
            "term": pa.array(terms_u[order], pa.string()),
            "est_cnt": pa.array(est[order], pa.int64()),
            "exact_cnt": pa.array(exact[order], pa.int64())})

    cands = partials.groupby("part").map_groups(part_topk,
                                                batch_format="pyarrow")
    allc = pa.concat_tables(
        [b for b in cands.iter_batches(batch_format="pyarrow")
         if b.num_rows])
    terms = np.asarray(allc.column("term").to_pylist(), dtype=object)
    est = allc.column("est_cnt").to_numpy()
    exact = allc.column("exact_cnt").to_numpy()
    order = np.lexsort((terms.astype(str), -est))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        "term": pa.array(terms[order].astype(str), pa.string()),
        "est_cnt": pa.array(est[order], pa.int64()),
        "exact_cnt": pa.array(exact[order], pa.int64())})


# ------------------------------------------- weighted bottom-k sample

WSAMPLE_K = 50


def weighted_sample(sf_dir: str, k: int = WSAMPLE_K) -> pa.Table:
    """Deterministic weight-biased corpus sample: key = md5_low64(text)
    // (n_words + 1), keep the k smallest keys (ties → doc_id ASC).

    Integer division by the weight scales each doc's uniform hash draw
    so heavier (longer) docs get proportionally smaller keys — the
    bottom-k is a weight-biased sample (the integer-exact analog of
    Efraimidis-Spirakis exponential keys; floats would risk libm-ulp
    divergence between numpy and the SQL oracle, integer division
    cannot). Per-batch bottom-k combiners → tiny driver merge, the
    hash_sample_quantiles shape; every value reproduces in DuckDB."""
    import numpy as np

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def partials(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        n_words = np.fromiter((len((x or "").split()) for x in texts),
                              np.int64, len(texts))
        h = _md5_low64_signed(texts)
        key = h // (n_words + 1)
        order = np.lexsort((ids, key))[:k]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_words": pa.array(n_words[order], pa.int64()),
            "sample_key": pa.array(key[order], pa.int64())})

    cands = pa.concat_tables(
        [b for b in ds.map_batches(partials, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow") if b.num_rows])
    ids = cands.column("doc_id").to_numpy()
    nw = cands.column("n_words").to_numpy()
    key = cands.column("sample_key").to_numpy()
    order = np.lexsort((ids, key))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        "doc_id": pa.array(ids[order], pa.int64()),
        "n_words": pa.array(nw[order], pa.int64()),
        "sample_key": pa.array(key[order], pa.int64())})


def _md5_low64_signed(texts: List[str]) -> "np.ndarray":
    """md5 low-64 masked to 63 bits → NONNEGATIVE int64. On nonnegative
    operands numpy's floor division and SQL's truncating division
    agree, so ``key // weight`` is bit-identical on both sides (signed
    values would diverge: ``//`` floors, SQL ``/`` truncates)."""
    import numpy as np
    h1, _ = _md5_two_halves(texts)
    return (h1 & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
