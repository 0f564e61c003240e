"""robots.txt compliance (operators/robots.py): parser + evaluator
differential against stdlib urllib.robotparser (the public reference)
on RFC-9309-shaped fixtures, precedence/wildcard/anchor pins, and the
Spark gate end-to-end."""

from __future__ import annotations

import urllib.robotparser

from argostats_spark.operators.robots import (
    apply_robots,
    parse_robots,
    robots_allowed,
)

ROBOTS = """
# comment line
User-agent: badbot
Disallow: /

User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/ok/
Disallow: /*.pdf$
Allow: /downloads/special.pdf$
Disallow: /search?*q=
"""


def _std_allowed(body: str, ua: str, url: str) -> bool:
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(body.splitlines())
    return rp.can_fetch(ua, url)


CASES = [
    ("/", True),
    ("/public/page.html", True),
    ("/private/", False),
    ("/private/x.html", False),
    ("/private/ok/file.html", True),       # longer Allow wins
    ("/tmp", False),
    ("/tmpfile", False),                    # prefix match, no boundary
    ("/doc.pdf", False),                    # wildcard + anchor
    ("/doc.pdf.html", True),                # $ anchor respected
    ("/downloads/special.pdf", True),       # longest-match Allow
    ("/search?x=1&q=foo", False),           # mid-pattern wildcard
    ("/search?x=1", True),
]


def test_evaluator_pins():
    """The 12 pins encode RFC 9309 semantics (longest-match precedence,
    * wildcards, $ anchors — Google's documented behavior). stdlib
    urllib.robotparser PREDATES those extensions (first-match, literal
    patterns), so it is only a differential reference on the simple
    subset — see the next test."""
    rules = parse_robots(ROBOTS, "goodbot")
    for path, want in CASES:
        assert robots_allowed(rules, path) == want, path


SIMPLE = """
User-agent: *
Disallow: /private/
Disallow: /tmp
Disallow: /cgi-bin/
"""


def test_stdlib_differential_on_simple_subset():
    """On wildcard-free, non-overlapping prefix rules (the pre-RFC-9309
    core both implementations share) the evaluator must agree with
    urllib.robotparser on every path."""
    rules = parse_robots(SIMPLE, "anybot")
    for path in ["/", "/a", "/private/", "/private/x", "/privateer",
                 "/tmp", "/tmp/x", "/tmpz", "/cgi-bin/q", "/cgi-bin",
                 "/x/private/"]:
        mine = robots_allowed(rules, path)
        std = _std_allowed(SIMPLE, "anybot", "http://h" + path)
        assert mine == std, (path, mine, std)


def test_ua_group_selection():
    assert parse_robots(ROBOTS, "BadBot/1.0") == [(False, "/")]
    # unknown agent falls to *
    r = parse_robots(ROBOTS, "other")
    assert (False, "/private/") in r
    # robots with no matching group at all -> empty rules -> allow
    assert robots_allowed(parse_robots("User-agent: x\nDisallow: /", "y"), "/") is True
    # empty Disallow means allow-everything
    assert robots_allowed(
        parse_robots("User-agent: *\nDisallow:", "y"), "/anything"
    ) is True


def test_anchor_not_counted_in_specificity():
    """RFC 9309 precedence counts octets of the PATH pattern; the '$'
    end-anchor is syntax, not path octets. '/ab$' (3 path octets) must
    NOT outrank '/abc' (4 path octets), and an Allow/Disallow pair of
    equal real length differing only by a trailing '$' must tie (Allow
    wins ties)."""
    # Disallow /abc (4) vs Allow /ab$ (3 after anchor strip): /abc hits
    # both ('/ab$' does not match '/abc' — anchored), so check the tie
    # case directly: '/ab' matches both '/ab$' (anchored, exact) and
    # '/ab' — equal real length 3 -> Allow wins the tie.
    rules = [(False, "/ab"), (True, "/ab$")]
    assert robots_allowed(rules, "/ab") is True
    # and the anchored rule must not win by anchor padding against a
    # LONGER real pattern: Disallow /abc (4) beats Allow /ab$ only if
    # '/ab$' matched — it doesn't match '/abc'; use wildcard form:
    rules = [(False, "/abc"), (True, "/a*$")]   # real lengths 4 vs 3
    assert robots_allowed(rules, "/abc") is False


def test_parse_robots_table(spark):
    from argostats_spark.operators.robots import parse_robots_table

    robots = spark.createDataFrame(
        [("a.com", ROBOTS), ("b.com", None)],
        "host string, robots_txt string",
    )
    rows = {r["host"]: r["rules"]
            for r in parse_robots_table(robots, "goodbot").collect()}
    assert rows["b.com"] is None
    got = [(r["allow"], r["pattern"]) for r in rows["a.com"]]
    assert got == parse_robots(ROBOTS, "goodbot")


def test_apply_robots_gate(spark):
    docs = spark.createDataFrame(
        [
            (0, "http://a.com/public/x"),
            (1, "http://a.com/private/x"),
            (2, "http://b.com/anything"),     # no robots row -> allowed
            (3, "https://a.com/doc.pdf"),
            (4, None),                         # NULL url -> not allowed
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", ROBOTS)], "host string, robots_txt string"
    )
    got = {r["doc_id"]: r["robots_allowed"]
           for r in apply_robots(docs, robots, user_agent="goodbot").collect()}
    assert got == {0: True, 1: False, 2: True, 3: False, 4: False}
    out = apply_robots(docs, robots)
    assert out.columns == ["doc_id", "url", "robots_allowed"]


def test_robots_differential_property():
    """Property (hypothesis): on wildcard-free DISALLOW-only rule sets
    — the exact subset where stdlib's first-match and RFC 9309's
    longest-match semantics provably coincide (every matching rule
    denies, so match order can't matter) — the evaluator agrees with
    urllib.robotparser on every (ruleset, path) pair, at any rule
    order and prefix overlap. Allow/Disallow mixes are deliberately
    EXCLUDED: hypothesis itself found that stdlib resolves
    [Disallow /a, Allow /a] by file order (first match, → deny) while
    RFC 9309 resolves it by longest-match with Allow winning ties
    (→ allow) — a real semantic fork, not a bug; the RFC behavior is
    pinned by the hand-written precedence tests above."""
    from hypothesis import given, settings, strategies as st

    seg = st.sampled_from(["a", "b", "ab", "abc", "x", "dir", "file.html"])
    path_st = st.lists(seg, min_size=0, max_size=3).map(
        lambda parts: "/" + "/".join(parts)
    )

    @settings(max_examples=120, deadline=None)
    @given(
        st.lists(path_st.filter(lambda p: p != "/"), min_size=0, max_size=6),
        path_st,
    )
    def run(patterns, path):
        body = "User-agent: *\n" + "\n".join(
            "Disallow: " + pat for pat in patterns
        )
        mine = robots_allowed(parse_robots(body, "anybot"), path)
        std = _std_allowed(body, "anybot", "http://h" + path)
        assert mine == std, (patterns, path, mine, std)

    run()


def test_apply_robots_streaming_equals_batch(spark, tmp_path):
    """apply_robots is a stream-static broadcast join + stateless UDF,
    so it must run unchanged on a readStream and emit row-identical
    gating decisions to the batch path — robots compliance is an
    ingest-edge stage of the streaming curation chain."""
    import json as _json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    rows = [
        (0, "http://a.com/public/x"),
        (1, "http://a.com/private/x"),
        (2, "http://b.com/anything"),
        (3, "https://a.com/doc.pdf"),
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text(
        "\n".join(_json.dumps({"doc_id": i, "url": u}) for i, u in rows) + "\n"
    )
    schema = StructType([
        StructField("doc_id", LongType()), StructField("url", StringType()),
    ])
    robots = spark.createDataFrame(
        [("a.com", ROBOTS)], "host string, robots_txt string"
    )
    batch = {
        r["doc_id"]: r["robots_allowed"]
        for r in apply_robots(
            spark.read.schema(schema).json(str(src)), robots,
            user_agent="goodbot",
        ).collect()
    }
    stream = spark.readStream.schema(schema).json(str(src))
    out = apply_robots(stream, robots, user_agent="goodbot")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("robots_gated")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: r["robots_allowed"]
               for r in spark.sql("SELECT * FROM robots_gated").collect()}
    finally:
        q.stop()
    assert got == batch == {0: True, 1: False, 2: True, 3: False}
