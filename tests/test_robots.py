"""RFC 9309 robots.txt parser/evaluator semantics."""
import pyarrow as pa

from text_extraction_system_ray.pipelines.robots import (
    evaluate_rules, parse_robots, select_group)


def _verdict(rules, path):
    return bool(evaluate_rules(rules, pa.array([path]))[0])


def test_longest_match_wins_and_allow_tie():
    rules = [("/p", False), ("/p/q", True)]
    assert _verdict(rules, "/p/q/deep")          # longer allow wins
    assert not _verdict(rules, "/p/x")
    # exact tie: allow wins
    tie = [("/page", False), ("/page", True)]
    assert _verdict(tie, "/page")


def test_wildcard_and_anchor():
    rules = [("/a/*.pdf$", False)]
    assert not _verdict(rules, "/a/x/file.pdf")
    assert _verdict(rules, "/a/file.pdf.html")   # $ anchors the end
    assert _verdict(rules, "/b/file.pdf")


def test_no_match_is_allowed_and_empty_disallow():
    g = parse_robots("User-agent: *\nDisallow:\n")
    assert select_group(g, "any") == []
    assert _verdict([], "/anything")


def test_group_selection_most_specific_no_merge():
    g = parse_robots(
        "User-agent: *\nDisallow: /all\n\n"
        "User-agent: bot\nDisallow: /bot\n\n"
        "User-agent: bot-special\nDisallow: /special\n")
    assert select_group(g, "unrelated") == [("/all", False)]
    assert select_group(g, "bot/1.0") == [("/bot", False)]
    # longest matching token wins; the generic rules are NOT merged in
    assert select_group(g, "bot-special 2.0") == [("/special", False)]


def test_shared_rule_block_for_stacked_agents():
    g = parse_robots(
        "User-agent: a\nUser-agent: b\nDisallow: /x\n\n"
        "User-agent: c\nDisallow: /y\n")
    assert g["a"] == g["b"] == [("/x", False)]
    assert g["c"] == [("/y", False)]


def test_comments_and_unknown_directives_ignored():
    g = parse_robots(
        "# header\nUser-agent: * # inline\nCrawl-delay: 10\n"
        "Disallow: /secret # hidden\nSitemap: https://e.org/s.xml\n")
    assert g["*"] == [("/secret", False)]


def test_parser_total_on_fuzz():
    """Parser/evaluator never raise on junk robots bodies."""
    import random
    import pyarrow as pa
    rng = random.Random(9)
    atoms = ["User-agent:", "Disallow:", "Allow:", "*", "$", "/a", "\n",
             ":", "#c", " ", "bot", "Crawl-delay: x", "\r\n", "Ünïcode"]
    for _ in range(200):
        text = "".join(rng.choice(atoms) for _ in range(rng.randint(1, 25)))
        g = parse_robots(text)
        rules = select_group(g, "anybot/1.0")
        evaluate_rules(rules, pa.array(["/a/b", "", "/x?q=1"]))
