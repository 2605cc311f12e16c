"""robots.txt evaluation (RFC 9309) — crawl-frontier filtering.

A crawl pipeline must honor per-site robots rules before fetching /
keeping pages. This op parses robots.txt from scratch (grouped
``User-agent`` records, ``Allow``/``Disallow`` rules, ``*`` wildcard
and ``$`` anchor, longest-match-wins with allow on ties, most-specific
agent group only — all RFC 9309 §2 semantics) and evaluates every
page URL against its site's rules for two agents.

Scale shape: the robots corpus is tiny (one file per site); rules are
parsed once on the driver, compiled to site→rule-regex lists, and
broadcast via ``ray.put``; evaluation is vectorized
(``pc.match_substring_regex`` per rule over the whole batch — a few
rule regexes × rows, no per-row Python).

Fixture: every ``source`` is a site with

    User-agent: *
    Disallow: /<source>/*0$
    Allow: /<source>/*00$

    User-agent: tes-ray
    Disallow: /<source>/*5$

so generic crawlers lose doc_ids ending in 0 except those ending in 00
(longest-match + allow-tie rules exercised), while the specific agent
group REPLACES the generic one (no rule merging — RFC 9309 §2.2.1) and
loses only ids ending in 5. All CASE-expressible for the oracle.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

Rule = Tuple[str, bool]          # (path pattern, is_allow)


def robots_txt_for_source(source: str) -> str:
    """Deterministic per-site robots fixture."""
    return (
        "# robots for example.org/" + source + "\n"
        "User-agent: *\n"
        f"Disallow: /{source}/*0$\n"
        f"Allow: /{source}/*00$\n"
        "\n"
        "User-agent: tes-ray\n"
        f"Disallow: /{source}/*5$\n"
    )


def parse_robots(text: str) -> Dict[str, List[Rule]]:
    """robots.txt → {agent_token(lower): [(pattern, is_allow), ...]}.

    Successive ``User-agent`` lines share the following rule block
    (RFC 9309 §2.2.1); comments (#) and unknown directives ignored."""
    groups: Dict[str, List[Rule]] = {}
    current_agents: List[str] = []
    rules_started = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if rules_started:
                current_agents = []
                rules_started = False
            agent = val.lower()
            current_agents.append(agent)
            groups.setdefault(agent, [])
        elif key in ("allow", "disallow"):
            rules_started = True
            if not val and key == "disallow":
                continue          # empty Disallow ⇒ no restriction
            for a in current_agents:
                groups[a].append((val, key == "allow"))
    return groups


def select_group(groups: Dict[str, List[Rule]], agent: str) -> List[Rule]:
    """Most-specific matching group; '*' only as fallback (§2.2.1)."""
    agent = agent.lower()
    best: Optional[str] = None
    for token in groups:
        if token != "*" and token in agent:
            if best is None or len(token) > len(best):
                best = token
    if best is not None:
        return groups[best]
    return groups.get("*", [])


def _rule_regex(pattern: str) -> str:
    """robots pattern → anchored RE2: '*' wildcard, terminal '$'."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = "^" + ".*".join(re.escape(part) for part in body.split("*"))
    return out + ("$" if anchored else "")


def evaluate_rules(rules: List[Rule], paths: pa.Array) -> np.ndarray:
    """Vectorized verdicts: allowed (True) per path. Longest-match wins;
    allow wins length ties; no match ⇒ allowed."""
    n = len(paths)
    best_len = np.full(n, -1, np.int64)
    allowed = np.ones(n, bool)
    for pattern, is_allow in rules:
        hit = pc.match_substring_regex(
            paths, _rule_regex(pattern)).to_numpy(zero_copy_only=False)
        plen = len(pattern)
        better = hit & ((plen > best_len)
                        | ((plen == best_len) & is_allow))
        best_len = np.where(better, plen, best_len)
        allowed = np.where(better, is_allow, allowed)
    return allowed


def robots_filter(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, allowed_generic, allowed_tesray) for every document."""
    import pyarrow.parquet as pq

    sources = pc.unique(pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source"]).column("source"))
    compiled = {}
    for s in sources.to_pylist():
        groups = parse_robots(robots_txt_for_source(s))
        compiled[s] = {
            "generic": select_group(groups, "SomeCrawler/1.0"),
            "tesray": select_group(groups, "tes-ray/2.1"),
        }
    rules_ref = ray.put(compiled)

    def verdicts(t: pa.Table, ref=rules_ref) -> pa.Table:
        rules = ray.get(ref)
        ids = t.column("doc_id").to_numpy()
        srcs = t.column("source").to_numpy(zero_copy_only=False)
        paths = pa.array(
            [f"/{s}/{d:08d}" for s, d in zip(srcs, ids)], pa.string())
        gen = np.ones(len(ids), bool)
        tes = np.ones(len(ids), bool)
        for s in np.unique(srcs):
            m = srcs == s
            sub = paths.filter(pa.array(m))
            gen[m] = evaluate_rules(rules[s]["generic"], sub)
            tes[m] = evaluate_rules(rules[s]["tesray"], sub)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "allowed_generic": pa.array(gen),
                         "allowed_tesray": pa.array(tes)})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    return ds.map_batches(verdicts, batch_format="pyarrow")
