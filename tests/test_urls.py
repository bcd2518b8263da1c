"""URL canonicalization + URL-level dedup (operators/urls.py)."""

from __future__ import annotations

import pytest

from chapterhousedb_spark.operators.urls import (
    canonicalize_url,
    url_dedup,
    url_host,
)


def _canon(spark, raw: str) -> str:
    df = spark.createDataFrame([(raw,)], "url string")
    return canonicalize_url(df).collect()[0]["canon_url"]


def test_every_canonicalization_rule(spark):
    cases = {
        # scheme + host lowercased, path case preserved
        "HTTP://Example.COM/Path/Page?id=1": "http://example.com/Path/Page?id=1",
        # default ports stripped per scheme
        "http://example.com:80/a": "http://example.com/a",
        "https://example.com:443/a": "https://example.com/a",
        # non-default port preserved; https:80 is NOT default
        "http://example.com:8080/a": "http://example.com:8080/a",
        "https://example.com:80/a": "https://example.com:80/a",
        # fragment stripped
        "http://example.com/a#section-2": "http://example.com/a",
        "http://example.com/a?x=1#frag": "http://example.com/a?x=1",
        # tracker params removed, other params keep order
        "http://e.com/p?utm_source=tw&id=3&utm_campaign=x": "http://e.com/p?id=3",
        "http://e.com/p?fbclid=abc": "http://e.com/p",
        "http://e.com/p?gclid=1&b=2&msclkid=3&a=1": "http://e.com/p?b=2&a=1",
        # utm_* is a prefix family; a param merely CONTAINING utm stays
        "http://e.com/p?utm_x=1&autumn=2": "http://e.com/p?autumn=2",
        # valueless tracker param ('fbclid' with no '=') also removed
        "http://e.com/p?fbclid&id=1": "http://e.com/p?id=1",
        # trailing slashes stripped (incl. bare root, incl. multiple)
        "http://example.com/": "http://example.com",
        "http://example.com/a/b/": "http://example.com/a/b",
        "http://example.com/a//": "http://example.com/a",
        # empty leftover query drops its '?'
        "http://example.com/a?": "http://example.com/a",
        # everything at once
        "HTTPS://News.Site.ORG:443/A/b/?utm_medium=m#top": "https://news.site.org/A/b",
        # whitespace trimmed
        "  http://example.com/a  ": "http://example.com/a",
    }
    for raw, want in cases.items():
        assert _canon(spark, raw) == want, raw


def test_non_absolute_urls_pass_through(spark):
    """Relative URLs / garbage are trimmed but never mangled; NULL
    stays NULL."""
    df = spark.createDataFrame(
        [("/relative/path?utm_source=x",), ("not a url",), (None,)],
        "url string",
    )
    got = [r["canon_url"] for r in canonicalize_url(df).collect()]
    assert got == ["/relative/path?utm_source=x", "not a url", None]


def test_url_host(spark):
    df = spark.createDataFrame(
        [
            ("https://News.Site.ORG:8443/a",),
            ("http://user:pw@example.com/x",),
            ("nonsense",),
            (None,),
        ],
        "url string",
    )
    got = [r["url_host"] for r in url_host(df).collect()]
    assert got == ["news.site.org", "example.com", None, None]


def test_url_dedup_groups_variants(spark):
    rows = [
        (1, "HTTP://E.com/p?id=1"),
        (2, "http://e.com:80/p?id=1#frag"),
        (3, "http://e.com/p/?utm_source=x&id=1"),
        (4, "https://other.org/q"),
        (5, "https://other.org/q/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["canon_url"]: (r["keeper_id"], r["n_variants"], r["url_host"])
        for r in url_dedup(df).collect()
    }
    assert got == {
        "http://e.com/p?id=1": (1, 3, "e.com"),
        "https://other.org/q": (4, 2, "other.org"),
    }
    mx = {
        r["canon_url"]: r["keeper_id"]
        for r in url_dedup(df, keep="max").collect()
    }
    assert mx["http://e.com/p?id=1"] == 3
    with pytest.raises(ValueError, match="keep must be"):
        url_dedup(df, keep="first")


def test_canonicalize_is_idempotent(spark):
    """canon(canon(x)) == canon(x) — the property that makes re-running
    the stage over an already-canonicalized corpus a no-op."""
    raws = [
        "HTTP://Example.COM:80/Path/?utm_source=a&id=1#f",
        "https://a.b.c/x//",
        "http://e.com/p?fbclid&id=1",
    ]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    once = canonicalize_url(df).select("canon_url")
    twice = canonicalize_url(once, "canon_url", "again")
    for r in twice.collect():
        assert r["again"] == r["canon_url"]


def test_canonicalize_preserves_userinfo_case(spark):
    """Only host:port case-folds — RFC 3986 userinfo is
    case-sensitive, so URLs differing only in credential case must NOT
    merge (review fix, round 11)."""
    a = _canon(spark, "http://Alice@Example.COM:80/x")
    b = _canon(spark, "http://alice@example.com/x")
    assert a == "http://Alice@example.com/x"
    assert b == "http://alice@example.com/x"
    assert a != b


def test_multi_at_authority_splits_at_last_at(spark):
    """WHATWG: everything before the LAST '@' is userinfo — a
    multi-'@' authority keeps all credentials case-preserved, and
    url_host returns the true host (review fix, round 11)."""
    assert (
        _canon(spark, "http://A@B@Host.COM/x") == "http://A@B@host.com/x"
    )
    df = spark.createDataFrame([("http://A@B@Host.COM:81/x",)], "url string")
    assert url_host(df).collect()[0]["url_host"] == "host.com"


def test_url_dedup_null_urls_survive_as_singletons(spark):
    """NULL urls are not an identity: each NULL-url doc is its own
    singleton row, never collapsed into one NULL dedup group (round-11
    review fix)."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "http://e.com/x")],
        "doc_id long, url string",
    )
    rows = url_dedup(df).collect()
    nulls = [r for r in rows if r["canon_url"] is None]
    assert {r["keeper_id"] for r in nulls} == {1, 2}
    assert all(r["n_variants"] == 1 for r in nulls)
    assert [r["keeper_id"] for r in rows if r["canon_url"] is not None] == [3]


def _regdom(spark, raw):
    from chapterhousedb_spark.operators.urls import url_registered_domain

    df = spark.createDataFrame([(raw,)], "url string")
    return url_registered_domain(df).collect()[0]["registered_domain"]


def test_registered_domain_every_branch(spark):
    """eTLD+1 under the pinned snapshot (VERDICT r11 #3) — one case
    per branch of the longest-suffix match."""
    cases = {
        # plain TLD: default rule (last label is the suffix)
        "https://www.example.com/a": "example.com",
        "https://a.b.c.example.com/a": "example.com",
        # 2-label snapshot suffix
        "https://shop.example.co.uk/p": "example.co.uk",
        "https://brand.co.uk/": "brand.co.uk",
        # 3-label snapshot suffix (longest match wins over heuristics)
        "https://school.k12.ca.us/h": "school.k12.ca.us",
        "https://deep.school.k12.ca.us/h": "school.k12.ca.us",
        # PRIVATE-section farm host folds into the PARENT domain (the
        # documented snapshot boundary: blogspot.com is NOT a suffix
        # here, so the farm caps against one budget)
        "https://someone.blogspot.com/post": "blogspot.com",
        "https://someone.github.io/repo": "github.io",
        # unknown TLD: default rule applies
        "https://x.foo.internal/": "foo.internal",
        # host normalization feeds in: case, port, userinfo, FQDN dot
        "HTTPS://User:P@SS@WWW.Example.COM.:8443/q": "example.com",
        # bare public suffix / bare TLD: no registered domain
        "https://co.uk/": None,
        "https://k12.ca.us/": None,
        "http://localhost/": None,
        # IP literals: no registered domain
        "http://93.184.216.34/x": None,
        "http://[2001:db8::1]/x": None,
        # non-absolute / garbage / NULL
        "not a url": None,
    }
    for raw, want in cases.items():
        assert _regdom(spark, raw) == want, raw
    assert _regdom(spark, None) is None


def test_registered_domain_caps_subdomain_farm_as_one(spark):
    """The subdomain-farm fix the operator exists for: hosts across a
    farm share ONE registered domain, so a per-domain cap counts them
    against one budget (full-host grouping would give each subdomain
    its own cap). Two *.blogspot.com docs, cap k=1 -> ONE survivor."""
    from chapterhousedb_spark.operators.sampling import grouped_sample
    from chapterhousedb_spark.operators.urls import url_registered_domain

    df = spark.createDataFrame(
        [
            (1, "https://alice.blogspot.com/a"),
            (2, "https://bob.blogspot.com/b"),
            (3, "https://other.example.org/c"),
        ],
        "doc_id long, url string",
    )
    rd = url_registered_domain(df)
    assert {
        r["registered_domain"] for r in rd.collect()
    } == {"blogspot.com", "example.org"}
    capped = grouped_sample(rd, group_col="registered_domain", k=1)
    rows = {r["registered_domain"]: r["doc_id"] for r in capped.collect()}
    assert len(rows) == 2  # one blogspot survivor + one example.org
    assert rows["blogspot.com"] in (1, 2)


def test_registered_domain_is_jvm_only(spark):
    """The extraction must stay all-JVM and data-shuffle-free: no
    Python eval nodes, no hash/range exchange of the input — the
    100 TB path is scan-speed. The ONLY exchanges allowed are the two
    ~200-row snapshot broadcasts (round-12 rebuild: broadcast joins
    replace the inlined IN-lists so downstream pushdown can't blow
    codegen past Janino's method limit)."""
    from chapterhousedb_spark.operators.urls import url_registered_domain

    df = spark.createDataFrame([(1, "https://a.co.uk/x")], "doc_id long, url string")
    plan = url_registered_domain(df)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "EvalPython" not in plan
    assert plan.count("BroadcastHashJoin") == 2
