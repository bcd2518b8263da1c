"""URL canonicalization + URL-level dedup (VERDICT r10 #5).

The crawl-pipeline stage that runs BEFORE MinHash in CCNet/FineWeb-
style pipelines: most crawl duplicates are the same page fetched under
trivially different URLs (scheme/host case, default ports, tracker
params, fragments, trailing slashes). Canonicalizing first collapses
those at the cost of a string projection — no shuffle — so the
expensive content-level dedup only sees one row per page identity.

Reference parity note: the reference engine (ChapterhouseDB) has no
URL operators — this is part of the beyond-reference training-data
surface (SURVEY.md §7.3). Per-domain caps compose with the existing
`grouped_sample` (sampling.py) over the `url_host` column.

Every rule is a pure JVM expression in the RE2-subset (no backrefs,
no lookaround), so DuckDB replays the exact chain in the oracle row
(workload/llm.py::url_dedup_docs). Rules, applied in order:

1. scheme and host:port lowercased (path/query AND userinfo case
   PRESERVED — servers are case-sensitive past the authority, and
   RFC 3986 userinfo is case-sensitive too);
2. fragment stripped (`#...` never reaches the server);
3. default port stripped (`:80` for http, `:443` for https — other
   scheme/port pairs preserved);
4. tracker params removed: `utm_*`, `fbclid`, `gclid`, `msclkid`
   (exact param-name matches on the query string split at `&`;
   remaining params keep their original ORDER — we deliberately do
   NOT sort the query string, since param order can be semantic);
5. trailing slashes stripped from the path (`/a/b/` == `/a/b`; the
   bare-root `http://x.com/` == `http://x.com`);
6. an empty leftover query string drops its `?`.

Deliberately NOT done (documented boundaries): no `www.` stripping
and no query-param sorting (both change identity for real sites), no
IDN/punycode folding.

Registered-domain (eTLD+1) extraction (VERDICT r11 #3) uses a PINNED
public-suffix snapshot (see `PSL_SNAPSHOT_2`/`PSL_SNAPSHOT_3` below)
rather than the live PSL dataset — documented snapshot boundaries:

- ICANN-section entries only, and only MULTI-LABEL ones: the PSL
  default rule ("the last label is a public suffix") covers every
  single-label TLD without listing it, so only >=2-label suffixes
  change the outcome. The PRIVATE section (blogspot.com, github.io,
  ...) is EXCLUDED on purpose: for per-domain caps a subdomain farm
  should count against ONE domain budget (`*.blogspot.com` ->
  `blogspot.com`), which is the opposite of what the private section
  encodes.
- No wildcard (`*.ck`) or exception (`!www.ck`) rules — a dozen-odd
  PSL entries; hosts under them fall back to the default rule.
- The snapshot is a pinned literal list (replayed verbatim by the
  DuckDB oracle) — refreshing it is a code change, not a data load.
  The lookup runs as two BROADCAST hash joins against the tiny
  suffix table, NOT as inlined `IN`-list expressions: the join is a
  real operator boundary, so Catalyst's filter/window pushdown
  cannot re-inline the whole host-normalization chain per reference
  site (the inlined-expression form blew Janino's 64 KB method
  limit at composition sites like url_etld_cap and silently fell
  back to INTERPRETED evaluation — round-12 fix), and the same plan
  shape holds for the full ~9k-entry live PSL.

At 100 TB: canonicalize is a single narrow projection (zero shuffle,
whole-stage codegen); url_dedup is one exact hash-groupBy on the
canonical string — the same shape as dedup.exact_dedup, map-side
combinable, no skew beyond genuinely hot pages (diagnose with
profile.key_skew on the canonical column before joining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# authority = everything between "://" and the first /, ?, or #
_AUTH_RE = r"^[^:/?#]+://([^/?#]*)"
_SCHEME_RE = r"^([^:/?#]+)://"
# path+query = from the end of the authority to the fragment (or end)
_TAIL_RE = r"^[^:/?#]+://[^/?#]*([^#]*)"
_TRACKER_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)"


def canonicalize_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canon_url"
) -> DataFrame:
    """Append `out_col` with the canonical form of `url_col` (rules in
    the module docstring). Rows whose value does not look like an
    absolute `scheme://...` URL pass through UNCHANGED (trimmed only)
    rather than being mangled — relative URLs and garbage lines are a
    reporting concern, not a canonicalization one. NULL stays NULL."""
    url = F.trim(F.col(url_col))
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    raw_auth = F.regexp_extract(url, _AUTH_RE, 1)
    # case-fold ONLY host:port — userinfo is case-sensitive per RFC
    # 3986 (lowercasing it would falsely merge URLs differing only in
    # credential case), same boundary as path/query. GREEDY '.*@':
    # WHATWG puts everything before the LAST '@' in userinfo, so a
    # multi-'@' authority keeps ALL its credentials un-folded
    userinfo = F.regexp_extract(raw_auth, r"^(.*@)", 1)
    hostport = F.lower(F.regexp_replace(raw_auth, r"^.*@", ""))
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    auth = F.concat(userinfo, hostport)
    tail = F.regexp_extract(url, _TAIL_RE, 1)  # path[?query], no fragment
    # split path vs query at the FIRST '?'
    path = F.regexp_replace(
        F.regexp_extract(tail, r"^([^?]*)", 1), "/+$", ""
    )
    query = F.when(
        tail.contains("?"), F.regexp_replace(tail, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~p.rlike(_TRACKER_RE) & (p != ""),
    )
    query = F.array_join(kept, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    canon = F.when(url.rlike(_SCHEME_RE), rebuilt).otherwise(url)
    return df.withColumn(out_col, canon)


def url_host(
    df: DataFrame, url_col: str = "url", out_col: str = "url_host"
) -> DataFrame:
    """Append the lowercased host (port stripped) — the grouping key
    for per-domain caps (compose with sampling.grouped_sample) and
    per-domain stats. Non-absolute URLs and NULLs yield NULL."""
    auth = F.lower(F.regexp_extract(F.trim(F.col(url_col)), _AUTH_RE, 1))
    host = F.regexp_replace(auth, r":[0-9]+$", "")
    # strip userinfo if present (user:pass@host) — greedy through the
    # LAST '@' (WHATWG authority parsing)
    host = F.regexp_replace(host, r"^.*@", "")
    return df.withColumn(
        out_col, F.when(host == "", F.lit(None).cast("string")).otherwise(host)
    )


# Pinned public-suffix snapshot (module docstring: ICANN section,
# multi-label entries only — single-label TLDs are covered by the PSL
# default rule). Sorted, deduplicated; ~140 entries covering the
# country-code second-level registries a web crawl actually hits.
PSL_SNAPSHOT_2 = sorted(
    {
        # uk / ie
        "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk",
        "org.uk", "plc.uk", "sch.uk",
        # au / nz
        "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au",
        "org.au",
        "ac.nz", "co.nz", "govt.nz", "net.nz", "org.nz",
        # jp
        "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
        "ne.jp", "or.jp",
        # br / mx / ar and latam
        "com.br", "edu.br", "gov.br", "net.br", "org.br",
        "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
        "com.ar", "edu.ar", "gob.ar", "net.ar", "org.ar",
        "com.bo", "com.co", "com.do", "com.ec", "com.gt", "com.ni",
        "com.pa", "com.pe", "com.py", "com.sv", "com.uy", "com.ve",
        # cn / hk / tw / kr / sg / my / id / th / vn / ph
        "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
        "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
        "com.tw", "edu.tw", "gov.tw", "idv.tw", "net.tw", "org.tw",
        "ac.kr", "co.kr", "go.kr", "ne.kr", "or.kr", "pe.kr", "re.kr",
        "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
        "com.my", "edu.my", "gov.my", "net.my", "org.my",
        "ac.id", "co.id", "go.id", "or.id", "sch.id", "web.id",
        "ac.th", "co.th", "go.th", "in.th", "or.th",
        "com.vn", "edu.vn", "gov.vn", "net.vn", "org.vn",
        "com.ph", "net.ph", "org.ph",
        # in / pk / bd
        "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in",
        "ind.in", "net.in", "org.in", "res.in",
        "com.pk", "edu.pk", "gov.pk", "net.pk", "org.pk",
        "com.bd", "net.bd", "org.bd",
        # tr / ua / pl / il / at / pt / gr
        "com.tr", "edu.tr", "gov.tr", "net.tr", "org.tr",
        "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
        "com.pl", "edu.pl", "net.pl", "org.pl", "waw.pl",
        "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
        "ac.at", "co.at", "gv.at", "or.at",
        "com.pt", "edu.pt", "org.pt",
        "com.gr", "edu.gr", "net.gr", "org.gr",
        # za / ke / ng / eg / sa
        "ac.za", "co.za", "gov.za", "net.za", "org.za", "web.za",
        "ac.ke", "co.ke", "go.ke", "ne.ke", "or.ke",
        "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng",
        "com.eg", "edu.eg", "gov.eg", "net.eg", "org.eg",
        "com.sa", "edu.sa", "gov.sa", "net.sa", "org.sa",
    }
)
# 3-label entries prove the longest-match depth logic (US K12/CC
# registries are the common real-world case)
PSL_SNAPSHOT_3 = sorted({"cc.ca.us", "k12.ca.us", "k12.ny.us", "k12.tx.us"})


def url_registered_domain(
    df: DataFrame, url_col: str = "url", out_col: str = "registered_domain"
) -> DataFrame:
    """Append the registered domain (eTLD+1) of `url_col` — the
    grouping key real crawl pipelines cap on: full-host grouping
    under-caps subdomain farms (every `*.blogspot.com` host counting
    as its own "domain" multiplies the farm's budget by its subdomain
    count). Longest pinned-suffix match (3-label, then 2-label, else
    the PSL default rule's 1-label); registered domain = suffix + one
    more label. Non-absolute URLs, IP-literal hosts and bare public
    suffixes / bare TLDs yield NULL — exactly the PSL "no registered
    domain" cases.

    Plan shape (round-12 rebuild): staged narrow projections compute
    the host-label array and its 2-/3-label tail suffixes ONCE, then
    two BROADCAST hash joins (one per suffix depth — each suffix list
    is unique within its depth, so neither join can duplicate rows)
    probe the pinned snapshot, and the final projection assembles the
    domain from plain attributes. All-JVM, no data shuffle (the only
    exchanges are the two ~200-row broadcasts); safe under
    whole-stage codegen because downstream filter/window pushdown
    stops at the join boundary instead of re-inlining the host
    normalization chain per reference (the previous single-expression
    form exceeded Janino's 64 KB method limit when composed with a
    filter + cap window and silently degraded to interpreted eval)."""
    spark = df.sparkSession
    psl3 = F.broadcast(
        spark.createDataFrame(
            [(s,) for s in PSL_SNAPSHOT_3], "__rd_psl3_suffix string"
        )
    )
    psl2 = F.broadcast(
        spark.createDataFrame(
            [(s,) for s in PSL_SNAPSHOT_2], "__rd_psl2_suffix string"
        )
    )
    hosted = url_host(df, url_col, "__rd_host")
    # staged projections: each non-cheap intermediate becomes a real
    # column referenced as an attribute downstream, so CollapseProject
    # keeps single evaluation sites
    labeled = hosted.withColumn(
        "__rd_labels",
        F.split(F.regexp_replace("__rd_host", r"\.$", ""), r"\."),
    )
    sufd = (
        labeled.withColumn("__rd_n", F.size("__rd_labels"))
        .withColumn(
            "__rd_suf3", F.array_join(F.slice("__rd_labels", -3, 3), ".")
        )
        .withColumn(
            "__rd_suf2", F.array_join(F.slice("__rd_labels", -2, 2), ".")
        )
    )
    joined = sufd.join(
        psl3,
        (F.col("__rd_suf3") == F.col("__rd_psl3_suffix"))
        & (F.col("__rd_n") >= 3),
        "left",
    ).join(
        psl2,
        (F.col("__rd_suf2") == F.col("__rd_psl2_suffix"))
        & (F.col("__rd_n") >= 2),
        "left",
    )
    lvl = (
        F.when(F.col("__rd_psl3_suffix").isNotNull(), F.lit(3))
        .when(F.col("__rd_psl2_suffix").isNotNull(), F.lit(2))
        .otherwise(F.lit(1))
    )
    host = F.col("__rd_host")
    n = F.col("__rd_n")
    leveled = joined.withColumn("__rd_lvl", lvl)
    out = leveled.withColumn(
        out_col,
        F.when(
            host.isNull()
            | host.rlike(r"^[0-9.]+$")  # IPv4 literal
            | host.startswith("["),  # [IPv6] literal
            F.lit(None).cast("string"),
        ).otherwise(
            # slice(start = n - lvl, length = lvl + 1) = the last
            # lvl+1 labels, 1-based; NULL when the host has no label
            # beyond the suffix (n <= lvl)
            F.when(
                n > F.col("__rd_lvl"),
                F.array_join(
                    F.slice(
                        "__rd_labels",
                        n - F.col("__rd_lvl"),
                        F.col("__rd_lvl") + F.lit(1),
                    ),
                    ".",
                ),
            ).otherwise(F.lit(None).cast("string"))
        ),
    )
    return out.drop(
        "__rd_host",
        "__rd_labels",
        "__rd_n",
        "__rd_suf3",
        "__rd_suf2",
        "__rd_psl3_suffix",
        "__rd_psl2_suffix",
        "__rd_lvl",
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """URL-level exact dedup on the CANONICAL form: one row per
    canonical URL with the surviving id (`keep`: "min" or "max" id —
    deterministic, no arbitrary-row semantics), the variant count, and
    the host. The keeper id joins back to the full rows when callers
    need the text (broadcast when the survivor set is small, else an
    id-keyed shuffle — same contract as dedup.exact_dedup).

    NULL urls are NOT dedup groups: a missing URL says nothing about
    page identity, so each NULL-url doc survives as its own singleton
    row (canon_url NULL, keeper_id = its own id, n_variants 1) — a
    groupBy would collapse ALL of them into one key and the documented
    keeper-join-back pattern would silently drop every such doc but
    one (round-11 review fix).

    One projection + one map-side-combined groupBy on the canonical
    string; nothing collected."""
    if keep not in ("min", "max"):
        raise ValueError(f"url_dedup: keep must be 'min' or 'max', got {keep!r}")
    agg_id = F.min(id_col) if keep == "min" else F.max(id_col)
    canon = canonicalize_url(df, url_col, "canon_url")
    canon = url_host(canon, "canon_url", "url_host")
    grouped = (
        canon.filter(F.col("canon_url").isNotNull())
        .groupBy("canon_url", "url_host")
        .agg(
            agg_id.alias("keeper_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )
    singletons = canon.filter(F.col("canon_url").isNull()).select(
        "canon_url",
        "url_host",
        F.col(id_col).alias("keeper_id"),
        F.lit(1).cast("long").alias("n_variants"),
    )
    return grouped.unionByName(singletons)
