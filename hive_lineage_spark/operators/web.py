"""Host/URL-level curation — the RefinedWeb/CCNet PRE-text stage.

Web-scale pipelines (RefinedWeb §3.1, CCNet, C4) filter and deduplicate
on the URL before ever looking at the text: registrable-domain
extraction feeds per-host statistics (a host whose pages are mostly
duplicates is a mirror/boilerplate farm — drop the HOST, not just the
pages), and URL-pattern blocklists cut link farms / tag pages /
tracking-parameter variants for free. The reference models none of this
(no vector/text ops at all) — LLM-pipeline scope, same contract as
dd/tx/tp/dq: every op a (spark, sf_dir) -> DataFrame with a value-hash
DuckDB oracle.

The TESTDATA corpus carries no URL column, so each document's URL is
DERIVED deterministically from (source, lang, doc_id) with pure string
arithmetic — built character-identically in BOTH engines (the synthetic
analog of a crawl manifest; the parsing/dedup/gating machinery
downstream is the real thing and never sees the construction). URLs
exercise multi-level public suffixes (co.uk, com.cn), www/cdn
subdomains, tag-page paths, and tracking parameters.

Scale shape: URL synthesis + parsing + gating are pure whole-stage
codegen maps fused into the documents scan (zero exchanges, zero UDFs);
the only shuffles are per-host partial aggs onto host-count-sized
frames and web02's exact-dup text-hash agg (dd01's shape). At 100 TB:
hosts ≪ pages, so every post-scan frame is sublinear; the blocklist is
a constant set of codegen predicates (a production list of ~10^5
patterns becomes one broadcast join on reg_domain + a compiled regex
set — same plan shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import poly_hash, poly_hash_sql
from ..sources.registry import load_table

# two-level public suffixes the synthetic TLD mix exercises; a real
# deployment swaps in the full Mozilla PSL as a broadcast set
_PSL2 = ("co.uk", "com.cn")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _with_url(d: DataFrame) -> DataFrame:
    """Deterministic per-doc URL from (source, lang, doc_id) — the same
    expression tree `_URL_SQL` builds in DuckDB, character for
    character. Pure codegen: modulo CASEs + concat."""
    did = F.col("doc_id")
    s = did.cast("string")
    sub = (
        F.when(did % 3 == 0, F.lit(""))
        .when(did % 3 == 1, F.lit("www."))
        .otherwise(F.lit("cdn."))
    )
    tld = (
        F.when(did % 5 == 0, F.lit("com"))
        .when(did % 5 == 1, F.lit("org"))
        .when(did % 5 == 2, F.lit("co.uk"))
        .when(did % 5 == 3, F.lit("com.cn"))
        .otherwise(F.lit("net"))
    )
    host = F.concat(sub, F.col("lang"), F.lit("."), F.col("source"), F.lit("hub."), tld)
    path = F.concat(
        F.lit("/"),
        F.col("lang"),
        F.when(did % 4 >= 1, F.concat(F.lit("/s"), (did % 23).cast("string"))).otherwise(F.lit("")),
        F.when(did % 4 >= 2, F.concat(F.lit("/t"), (did % 7).cast("string"))).otherwise(F.lit("")),
        F.when(did % 4 >= 3, F.concat(F.lit("/p"), (did % 11).cast("string"))).otherwise(F.lit("")),
        F.when(did % 13 == 0, F.concat(F.lit("/tag/"), (did % 5).cast("string"))).otherwise(F.lit("")),
    )
    q = (
        F.when((did % 6 == 0) & (did % 17 == 0), F.concat(F.lit("?sid="), s, F.lit("&ref=promo")))
        .when(did % 6 == 0, F.concat(F.lit("?sid="), s))
        .when(did % 17 == 0, F.lit("?ref=promo"))
        .otherwise(F.lit(""))
    )
    return d.withColumn("url", F.concat(F.lit("https://"), host, path, q))


# the identical construction in DuckDB (|| concat, same CASE order)
_URL_SQL = """
    'https://'
    || CASE WHEN doc_id % 3 = 0 THEN '' WHEN doc_id % 3 = 1 THEN 'www.' ELSE 'cdn.' END
    || lang || '.' || source || 'hub.'
    || CASE WHEN doc_id % 5 = 0 THEN 'com' WHEN doc_id % 5 = 1 THEN 'org'
            WHEN doc_id % 5 = 2 THEN 'co.uk' WHEN doc_id % 5 = 3 THEN 'com.cn'
            ELSE 'net' END
    || '/' || lang
    || CASE WHEN doc_id % 4 >= 1 THEN '/s' || CAST(doc_id % 23 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 4 >= 2 THEN '/t' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 4 >= 3 THEN '/p' || CAST(doc_id % 11 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN '/tag/' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 6 = 0 AND doc_id % 17 = 0
                 THEN '?sid=' || CAST(doc_id AS VARCHAR) || '&ref=promo'
            WHEN doc_id % 6 = 0 THEN '?sid=' || CAST(doc_id AS VARCHAR)
            WHEN doc_id % 17 = 0 THEN '?ref=promo'
            ELSE '' END
"""


def _parsed(d: DataFrame) -> DataFrame:
    """Parse host / path / query OUT of the url string (the op's real
    work — downstream never touches the construction columns):
    registrable domain via a public-suffix check on the last two
    labels, path depth from segment count, parameter count from the
    query string."""
    host = F.regexp_extract("url", r"^https://([^/]+)", 1)
    path = F.regexp_extract("url", r"^https://[^/]+([^?]*)", 1)
    qs = F.regexp_extract("url", r"\?(.*)$", 1)
    d = (
        d.withColumn("host", host)
        .withColumn("path", path)
        .withColumn("qs", qs)
        .withColumn("parts", F.split(F.col("host"), r"\."))
    )
    n = F.size("parts")
    last2 = F.concat_ws(".", F.element_at("parts", -2), F.element_at("parts", -1))
    reg2 = F.concat_ws(".", F.element_at("parts", -3), F.element_at("parts", -2), F.element_at("parts", -1))
    return (
        d.withColumn(
            "reg_domain", F.when(last2.isin(*_PSL2), reg2).otherwise(last2)
        )
        .withColumn("path_depth", (F.size(F.split(F.col("path"), "/")) - 1).cast("int"))
        .withColumn(
            "n_params",
            F.when(F.col("qs") == "", F.lit(0)).otherwise(F.size(F.split(F.col("qs"), "&"))).cast("int"),
        )
    )


_PARSE_SQL = f"""
        regexp_extract(url, '^https://([^/]+)', 1) AS host,
        regexp_extract(url, '^https://[^/]+([^?]*)', 1) AS path,
        regexp_extract(url, '\\?(.*)$', 1) AS qs
"""


def _reg_domain_sql(host: str = "host") -> str:
    parts = f"string_split({host}, '.')"
    last2 = f"({parts}[-2] || '.' || {parts}[-1])"
    reg2 = f"({parts}[-3] || '.' || {parts}[-2] || '.' || {parts}[-1])"
    in_psl = " OR ".join(f"{last2} = '{s}'" for s in _PSL2)
    return f"CASE WHEN {in_psl} THEN {reg2} ELSE {last2} END"


def web01_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document URL decomposition: host, registrable domain
    (public-suffix aware: co.uk/com.cn keep three labels), path depth,
    query-parameter count. The manifest every host-level curation
    stage starts from.

    Scale shape: one codegen map fused into the documents scan — zero
    exchanges, zero UDFs; output is corpus-sized but column-pruned to
    the slim parse columns."""
    d = _parsed(_with_url(_docs(spark, sf_dir).select("doc_id", "source", "lang")))
    return d.select(
        "doc_id", "url", "host", "reg_domain", "path_depth", "n_params"
    )


WEB01_SQL = f"""
    SELECT doc_id, url, host,
           {_reg_domain_sql()} AS reg_domain,
           CAST(len(string_split(path, '/')) - 1 AS INT) AS path_depth,
           CAST(CASE WHEN qs = '' THEN 0 ELSE len(string_split(qs, '&')) END AS INT) AS n_params
    FROM (
        SELECT doc_id, url, {_PARSE_SQL}
        FROM (SELECT doc_id, {_URL_SQL} AS url FROM documents)
    )
"""


def web02_host_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain duplication profile: page count, count of
    pages whose EXACT text occurs more than once corpus-wide (dd01's
    signal lifted to the host level), and the dup rate — RefinedWeb's
    mirror/boilerplate-farm detector: a host whose pages are mostly
    copies is dropped wholesale before any text processing.

    Scale shape: one text-hash partial agg (dd01's shape, map-side
    combined), the dup flag joins back on the 8-byte hash, then ONE
    partial agg onto the host-count-sized frame. Nothing post-scan is
    corpus-sized except the hash stream. Cross-engine note: Spark
    groups on xxhash64(text), the oracle on DuckDB's hash(text) —
    DIFFERENT 64-bit functions, but neither hash value surfaces in the
    output; the dup flag depends only on text equality, so results are
    identical absent a 64-bit collision within one engine."""
    d = _parsed(
        _with_url(_docs(spark, sf_dir).select("doc_id", "source", "lang", "text"))
    ).select("doc_id", "reg_domain", F.xxhash64("text").alias("th"))
    dupes = (
        d.groupBy("th").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("th", F.lit(1).alias("is_dup"))
    )
    return (
        d.join(dupes, "th", "left")
        .groupBy("reg_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("is_dup", F.lit(0))).alias("n_dup_docs"),
        )
        .select(
            "reg_domain",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_dup_docs").cast("long").alias("n_dup_docs"),
            F.round(F.col("n_dup_docs") / F.col("n_docs") + 1e-9, 4).alias("dup_rate"),
        )
    )


WEB02_SQL = f"""
    WITH p AS (
        SELECT doc_id, {_reg_domain_sql(f"regexp_extract({_URL_SQL}, '^https://([^/]+)', 1)")} AS reg_domain,
               hash(text) AS th
        FROM documents
    ),
    dupes AS (SELECT th FROM p GROUP BY th HAVING count(*) > 1)
    SELECT reg_domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN d.th IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           round(sum(CASE WHEN d.th IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*) + 1e-9, 4) AS dup_rate
    FROM p LEFT JOIN (SELECT th, 1 AS flag FROM dupes) d USING (th)
    GROUP BY reg_domain
"""


def web03_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-pattern blocklist gate: per document, which curation rules
    fire and the drop verdict — C4/RefinedWeb's cheapest filter, run
    before a single byte of text is read. Rules (each a production
    stand-in): tag/category listing pages, tracking-parameter
    variants (the URL-canonicalization dedup signal), a domain
    blocklist entry, and path-depth traps (infinite calendar/crawler
    holes).

    Scale shape: four codegen predicates fused into the scan; reasons
    concatenate in fixed rule order (deterministic string both
    engines); zero exchanges."""
    d = _parsed(_with_url(_docs(spark, sf_dir).select("doc_id", "source", "lang")))
    r_tag = F.col("path").contains("/tag/")
    r_track = F.col("qs").contains("ref=promo")
    r_domain = F.col("reg_domain").endswith(".net")
    r_deep = F.col("path_depth") >= 4
    reasons = F.concat_ws(
        ",",
        F.when(r_tag, F.lit("tag_page")),
        F.when(r_track, F.lit("tracking_param")),
        F.when(r_domain, F.lit("blocked_domain")),
        F.when(r_deep, F.lit("deep_path")),
    )
    return d.select(
        "doc_id",
        "url",
        (r_tag | r_track | r_domain | r_deep).cast("int").alias("blocked"),
        reasons.alias("reasons"),
    )


WEB03_SQL = f"""
    SELECT doc_id, url,
           CAST(tag_page OR tracking_param OR blocked_domain OR deep_path AS INT) AS blocked,
           concat_ws(',',
               CASE WHEN tag_page THEN 'tag_page' END,
               CASE WHEN tracking_param THEN 'tracking_param' END,
               CASE WHEN blocked_domain THEN 'blocked_domain' END,
               CASE WHEN deep_path THEN 'deep_path' END) AS reasons
    FROM (
        SELECT doc_id, url,
               contains(path, '/tag/') AS tag_page,
               contains(qs, 'ref=promo') AS tracking_param,
               {_reg_domain_sql()} LIKE '%.net' AS blocked_domain,
               len(string_split(path, '/')) - 1 >= 4 AS deep_path
        FROM (
            SELECT doc_id, url, {_PARSE_SQL}
            FROM (SELECT doc_id, {_URL_SQL} AS url FROM documents)
        )
    )
"""


# ---------------------------------------------------------------------------
# web04/web05: HTML -> text extraction (the missing pre-text stage).
# RefinedWeb §3.1 runs trafilatura, C4/CCNet run jusText-style block
# gates, BEFORE any of the tx/dd text ops see a byte: raw crawl payloads
# are markup, and the extraction quality decides everything downstream.
# The TESTDATA corpus carries no HTML column, so each document's page is
# SYNTHESIZED deterministically (the web01 URL pattern): the doc's text
# becomes the content block, wrapped in a realistic boilerplate frame —
# head/title, a link-farm <nav>, an optional link-heavy "related" box
# (doc_id % 3 == 0), a <footer> — with an in-content anchor on the first
# word for even doc_ids so content link density is nonzero. The
# EXTRACTION machinery downstream (tag stripping, anchor-text
# accounting, block segmentation, the density gate) is the real thing
# and never sees the construction.
# ---------------------------------------------------------------------------

WEB05_MIN_BLOCK_CHARS = 30  # jusText's "short block" cut
WEB05_MIN_EXTRACT = 40  # doc keep verdict: extracted main text floor


def _with_html(d: DataFrame) -> DataFrame:
    """Deterministic per-doc HTML, character-identical to `_HTML_SQL`."""
    did = F.col("doc_id")
    fw = F.element_at(F.split("text", " "), 1)
    body_text = F.when(
        did % 2 == 0,
        F.concat(
            F.lit('<a href="/w">'), fw, F.lit("</a>"),
            F.expr("substring(text, length(element_at(split(text, ' '), 1)) + 1)"),
        ),
    ).otherwise(F.col("text"))
    related = F.when(
        did % 3 == 0,
        F.lit('<div class="rel"><a href="/r1">read more</a> <a href="/r2">also this</a> tiny</div>'),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>"), F.col("lang"), F.lit(" page</title></head><body>"),
        F.lit('<nav><a href="/">home</a> <a href="/tag/0">tags</a> <a href="/arch">archive</a></nav>'),
        F.lit('<div id="main"><p>'), body_text, F.lit("</p></div>"),
        related,
        F.lit('<footer><a href="/about">about</a> <a href="/legal">legal</a> copyright '),
        F.col("source"), F.lit("</footer></body></html>"),
    )
    return d.withColumn("html", html)


_HTML_SQL = """
    '<html><head><title>' || lang || ' page</title></head><body>'
    || '<nav><a href="/">home</a> <a href="/tag/0">tags</a> <a href="/arch">archive</a></nav>'
    || '<div id="main"><p>'
    || CASE WHEN doc_id % 2 = 0
            THEN '<a href="/w">' || string_split(text, ' ')[1] || '</a>'
                 || substr(text, length(string_split(text, ' ')[1]) + 1)
            ELSE text END
    || '</p></div>'
    || CASE WHEN doc_id % 3 = 0
            THEN '<div class="rel"><a href="/r1">read more</a> <a href="/r2">also this</a> tiny</div>'
            ELSE '' END
    || '<footer><a href="/about">about</a> <a href="/legal">legal</a> copyright '
    || source || '</footer></body></html>'
"""

# anchor-text character count of a fragment (the link-density numerator
# trafilatura/jusText gate on) — sum of lengths of <a ...>text</a> bodies
_ANCHOR_RE = "<a [^>]*>([^<]*)</a>"


def _anchor_chars(col: Column) -> Column:
    return F.aggregate(
        F.transform(
            F.regexp_extract_all(col, F.lit(_ANCHOR_RE), 1), lambda x: F.length(x)
        ),
        F.lit(0),
        lambda a, x: a + x,
    )


def _anchor_chars_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0, list_transform("
        f"regexp_extract_all({expr}, '{_ANCHOR_RE}', 1), x -> CAST(length(x) AS INT))), "
        f"(a, b) -> a + b)"
    )


def web04_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document HTML extraction metrics — the trafilatura-style
    document report: title, markup size vs visible-text size
    (text-to-markup ratio — near-zero means a script/markup shell with
    no prose), link count, anchor-text character share (link density —
    the single strongest boilerplate signal), all from pure string
    expressions.

    Scale shape: one codegen map fused into the documents scan — tag
    stripping, anchor accounting and the ratios are whole-stage-codegen
    string ops; ZERO exchanges, zero UDFs (the web01 pattern; pinned).
    Integer-first FP contract: every count is exact; the two ratios
    divide exact integers and round at 4 dp with the house nudge."""
    d = _with_html(_docs(spark, sf_dir).select("doc_id", "source", "lang", "text"))
    plain = F.regexp_replace("html", "<[^>]*>", "")
    n_links = (
        (F.length("html") - F.length(F.regexp_replace("html", "<a href", "")))
        / F.length(F.lit("<a href"))
    ).cast("int")
    return d.select(
        "doc_id",
        F.regexp_extract("html", "<title>([^<]*)</title>", 1).alias("title"),
        F.length("html").cast("int").alias("html_chars"),
        F.length(plain).cast("int").alias("text_chars"),
        n_links.alias("n_links"),
        _anchor_chars(F.col("html")).cast("int").alias("anchor_chars"),
        F.round(
            _anchor_chars(F.col("html")) / F.length(plain) + 1e-9, 4
        ).alias("link_density"),
        F.round(F.length(plain) / F.length("html") + 1e-9, 4).alias("markup_ratio"),
    )


WEB04_SQL = f"""
    SELECT doc_id,
           regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
           CAST(length(html) AS INT) AS html_chars,
           CAST(length(plain) AS INT) AS text_chars,
           CAST((length(html) - length(replace(html, '<a href', ''))) / length('<a href') AS INT) AS n_links,
           CAST({_anchor_chars_sql('html')} AS INT) AS anchor_chars,
           round({_anchor_chars_sql('html')} * 1.0 / length(plain) + 1e-9, 4) AS link_density,
           round(length(plain) * 1.0 / length(html) + 1e-9, 4) AS markup_ratio
    FROM (
        SELECT doc_id, html, regexp_replace(html, '<[^>]*>', '', 'g') AS plain
        FROM (SELECT doc_id, {_HTML_SQL} AS html FROM documents)
    )
"""


def web05_boilerplate_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText-shaped boilerplate removal as a per-doc verdict: segment
    the page into blocks at block-level closing tags, score each block
    (stripped text length, anchor-text chars), DROP link-dominated or
    too-short blocks (link density > 1/2 — compared in INTEGERS as
    2*anchor <= text — or text < {WEB05_MIN_BLOCK_CHARS} chars), and
    report what extraction would keep: block counts, extracted main-text
    size, its share of all visible text, and the page-level keep gate
    (>= {WEB05_MIN_EXTRACT} extracted chars). The nav/related/footer
    frames die to the density rule, the head/title to the short rule —
    exactly the jusText/C4 behavior the synthetic page plants.

    Scale shape: the ENTIRE segment->score->gate->reassemble pipeline
    runs inside one row via higher-order functions (transform / filter /
    aggregate over the block array) — one codegen map fused into the
    scan, ZERO exchanges (pinned), no per-block explode/groupBy shuffle:
    at 100 TB block-level extraction costs exactly one pass over the
    payload bytes."""
    d = _with_html(_docs(spark, sf_dir).select("doc_id", "source", "lang", "text"))
    blocks = F.split("html", "</(nav|div|footer)>")
    feats = F.transform(
        blocks,
        lambda b: F.struct(
            F.length(F.regexp_replace(b, "<[^>]*>", "")).alias("tc"),
            _anchor_chars(b).alias("ac"),
        ),
    )
    kept = F.filter(
        feats,
        lambda s: (s["tc"] >= WEB05_MIN_BLOCK_CHARS) & (2 * s["ac"] <= s["tc"]),
    )
    total = F.aggregate(feats, F.lit(0), lambda a, s: a + s["tc"])
    extract = F.aggregate(kept, F.lit(0), lambda a, s: a + s["tc"])
    return d.select(
        "doc_id",
        F.size(feats).cast("int").alias("n_blocks"),
        F.size(kept).cast("int").alias("n_kept"),
        extract.cast("int").alias("extract_chars"),
        F.round(extract / total + 1e-9, 4).alias("main_ratio"),
        (extract >= WEB05_MIN_EXTRACT).cast("int").alias("keep"),
    )


WEB05_SQL = f"""
    SELECT doc_id,
           CAST(len(feats) AS INT) AS n_blocks,
           CAST(len(kept) AS INT) AS n_kept,
           CAST(extract_chars AS INT) AS extract_chars,
           round(extract_chars * 1.0 / total_chars + 1e-9, 4) AS main_ratio,
           CAST(extract_chars >= {WEB05_MIN_EXTRACT} AS INT) AS keep
    FROM (
        SELECT doc_id, feats, kept,
               list_reduce(list_prepend(0, list_transform(kept, s -> s.tc)), (a, b) -> a + b) AS extract_chars,
               list_reduce(list_prepend(0, list_transform(feats, s -> s.tc)), (a, b) -> a + b) AS total_chars
        FROM (
            SELECT doc_id, feats,
                   list_filter(feats, s -> s.tc >= {WEB05_MIN_BLOCK_CHARS} AND 2 * s.ac <= s.tc) AS kept
            FROM (
                SELECT doc_id,
                       list_transform(
                           string_split_regex(html, '</(nav|div|footer)>'),
                           b -> struct_pack(
                               tc := CAST(length(regexp_replace(b, '<[^>]*>', '', 'g')) AS INT),
                               ac := {_anchor_chars_sql('b')})
                       ) AS feats
                FROM (SELECT doc_id, {_HTML_SQL} AS html FROM documents)
            )
        )
    )
"""


def web06_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + URL-variant dedup — the crawl-frontier
    dedup every pipeline runs before fetching twice (and RefinedWeb's
    first dedup pass): strip the query string (tracking/session
    parameters: the `?sid=`/`ref=promo` variants web03 flags) and the
    serving-subdomain prefix (www./cdn. mirrors of one origin), then
    group documents whose URLs collapse to the same canonical form.
    Downstream keeps one fetch per canonical URL; the `is_url_dup` flag
    is the cheap upstream sibling of web02's content-hash dup signal
    (URL-level catches mirrors BEFORE paying for the bytes; text-level
    catches what URL-level structurally cannot).

    Scale shape: canonicalization is a codegen regex map fused into the
    scan; the group count keys on the 8-byte xxhash64 of the canonical
    form (web02's discipline — never a corpus-sized wide-string
    exchange), one partial agg + one hash-keyed join back. Cross-engine
    note: the oracle groups on DuckDB's hash() — a DIFFERENT 64-bit
    function, invisible in the output (the flag depends only on
    canonical-string equality, identical absent an in-engine collision)."""
    u = _with_url(_docs(spark, sf_dir).select("doc_id", "source", "lang")).select(
        "doc_id", "url"
    )
    canon = F.regexp_replace(
        F.regexp_replace("url", r"\?.*$", ""), "^https://(www\\.|cdn\\.)", "https://"
    )
    c = u.withColumn("canon_url", canon).withColumn("ch", F.xxhash64("canon_url"))
    groups = c.groupBy("ch").agg(F.count(F.lit(1)).alias("n_variants"))
    return c.join(groups, "ch").select(
        "doc_id",
        "url",
        "canon_url",
        F.col("n_variants").cast("long").alias("n_variants"),
        (F.col("n_variants") > 1).cast("int").alias("is_url_dup"),
    )


WEB06_SQL = f"""
    WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
    c AS (
        SELECT doc_id, url,
               regexp_replace(regexp_replace(url, '\\?.*$', ''),
                              '^https://(www\\.|cdn\\.)', 'https://') AS canon_url,
               hash(regexp_replace(regexp_replace(url, '\\?.*$', ''),
                                   '^https://(www\\.|cdn\\.)', 'https://')) AS ch
        FROM u
    ),
    g AS (SELECT ch, CAST(count(*) AS BIGINT) AS n_variants FROM c GROUP BY ch)
    SELECT doc_id, url, canon_url, n_variants,
           CAST(n_variants > 1 AS INT) AS is_url_dup
    FROM c JOIN g USING (ch)
"""


# ---------------------------------------------------------------------------
# web07: robots / licence / opt-out compliance gate — the filter every
# crawl pipeline runs between the URL gate (web03) and fetch. C4 §2.1
# and RefinedWeb §3.1 both document it: RFC 9309 robots-exclusion rules
# per host, plus per-page licence and meta opt-out (noai/noindex)
# signals. The TESTDATA corpus carries neither a robots cache nor page
# metadata, so BOTH are synthesized deterministically (the web01/web04
# fixture pattern): per-host rules derive from the registrable domain's
# cross-engine polynomial hash, per-doc signals from doc_id residues.
# The COMPLIANCE machinery — longest-match rule resolution, the
# allow-override, licence classes, the verdict/reason assembly — is the
# real thing and never sees the construction.
# ---------------------------------------------------------------------------

# licence classes a crawl manifest carries; nc/all-rights are dropped
# (the C4/RefinedWeb compliance posture: train only on permissive or
# unasserted licences)
_LIC_BLOCKED = ("cc-by-nc", "all-rights-reserved")


def web07_robots_compliance_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots / licence / opt-out compliance gate: per document, which
    compliance rules fire and the fetch-allowed verdict.

    Synthesized rule set per registrable domain (h = poly_hash(domain)):
    ``h % 3 == 0`` → a wildcard disallow on ``*/tag/*`` listing pages;
    ``h % 5 == 0`` → a host-wide ``Disallow: /``; of those, odd ``h % 2``
    hosts re-allow the ``/<lang>/s*`` section (``Allow`` override).
    Resolution is RFC 9309 longest-match: the tag wildcard (longest
    pattern) beats the section allow, which beats the 1-char host-wide
    disallow; no match → allowed. Per-doc signals: licence class from
    ``doc_id % 7`` (cc-by / cc-by-sa / cc-by-nc / all-rights-reserved /
    none), blocked for {_LIC_BLOCKED}; ``doc_id % 19 == 0`` carries a
    noai meta opt-out. Reasons concatenate in fixed rule order.

    Scale shape (web03's precedent): the whole gate — URL synthesis,
    parse, the host-hash rule derivation, longest-match resolution,
    licence/opt-out CASEs, reason assembly — is ONE map fused into the
    documents scan: zero exchanges, zero UDFs, zero joins. A production
    robots cache (per-host fetched rules) swaps the hash-derived rules
    for a broadcast join on reg_domain; the resolution expressions are
    unchanged. The SAME expression tree gates a document STREAM
    unchanged (``streaming.events.streaming_compliance_gate``) — a
    stateless codegen map needs no watermark or state."""
    return compliance_gate_cols(
        _docs(spark, sf_dir).select("doc_id", "source", "lang")
    )


def _compliance_flags(d: DataFrame) -> tuple[DataFrame, dict[str, Column]]:
    """The gate's rule expressions over a parsed frame — ONE source of
    truth for web07 (the per-doc report), web08 (which schedules only
    the ALLOWED frontier) and the streaming face. Returns the parsed
    frame plus the flag expressions (all pure codegen)."""
    d = _parsed(_with_url(d))
    h = poly_hash(F.col("reg_domain"))
    allow_pfx = F.concat(F.lit("/"), F.col("lang"), F.lit("/s"))
    tag_hit = (h % 3 == 0) & F.col("path").contains("/tag/")
    allow_hit = (h % 5 == 0) & (h % 2 == 1) & F.col("path").startswith(allow_pfx)
    disall_hit = h % 5 == 0
    robots_blocked = tag_hit | (disall_hit & ~allow_hit)
    licence = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("cc-by"))
        .when(F.col("doc_id") % 7 == 1, F.lit("cc-by-sa"))
        .when(F.col("doc_id") % 7 == 2, F.lit("cc-by-nc"))
        .when(F.col("doc_id") % 7 == 3, F.lit("all-rights-reserved"))
        .otherwise(F.lit("none"))
    )
    lic_blocked = licence.isin(*_LIC_BLOCKED)
    meta_optout = F.col("doc_id") % 19 == 0
    flags = {
        "tag_hit": tag_hit,
        "disall_hit": disall_hit,
        "allow_hit": allow_hit,
        "robots_blocked": robots_blocked,
        "licence": licence,
        "lic_blocked": lic_blocked,
        "meta_optout": meta_optout,
        "allowed": ~(robots_blocked | lic_blocked | meta_optout),
    }
    return d, flags


def compliance_gate_cols(d: DataFrame) -> DataFrame:
    """web07's full gate as a pure column-expression pipeline over any
    frame with (doc_id, source, lang) — batch and streaming share it
    verbatim (it is one stateless codegen map)."""
    d, fl = _compliance_flags(d)
    reasons = F.concat_ws(
        ",",
        F.when(fl["tag_hit"], F.lit("robots_tag_rule")),
        F.when(
            fl["disall_hit"] & ~fl["allow_hit"] & ~fl["tag_hit"],
            F.lit("robots_disallow_all"),
        ),
        F.when(fl["lic_blocked"], F.lit("licence")),
        F.when(fl["meta_optout"], F.lit("meta_noai")),
    )
    return d.select(
        "doc_id",
        "url",
        "reg_domain",
        fl["licence"].alias("licence"),
        fl["robots_blocked"].cast("int").alias("robots_blocked"),
        fl["meta_optout"].cast("int").alias("meta_optout"),
        fl["allowed"].cast("int").alias("allowed"),
        reasons.alias("reasons"),
    )


def _gate_flagged_sql() -> str:
    """Shared DuckDB subquery: parsed URLs + the gate's rule flags —
    WEB07_SQL reports them per doc, WEB08_SQL filters on the allowed
    verdict before scheduling (one source of truth, mirroring
    ``_compliance_flags``)."""
    return f"""
        SELECT doc_id, url, reg_domain, path, lang, h,
               h % 3 = 0 AND contains(path, '/tag/') AS tag_hit,
               h % 5 = 0 AND h % 2 = 1
                   AND starts_with(path, '/' || lang || '/s') AS allow_hit,
               h % 5 = 0 AS disall_hit,
               CASE WHEN doc_id % 7 = 0 THEN 'cc-by'
                    WHEN doc_id % 7 = 1 THEN 'cc-by-sa'
                    WHEN doc_id % 7 = 2 THEN 'cc-by-nc'
                    WHEN doc_id % 7 = 3 THEN 'all-rights-reserved'
                    ELSE 'none' END AS licence,
               doc_id % 7 = 2 OR doc_id % 7 = 3 AS lic_blocked,
               doc_id % 19 = 0 AS meta_optout,
               h % 3 = 0 AND contains(path, '/tag/')
                   OR (h % 5 = 0 AND NOT (h % 5 = 0 AND h % 2 = 1
                       AND starts_with(path, '/' || lang || '/s'))) AS robots_blocked,
               NOT (h % 3 = 0 AND contains(path, '/tag/')
                    OR (h % 5 = 0 AND NOT (h % 5 = 0 AND h % 2 = 1
                        AND starts_with(path, '/' || lang || '/s')))
                    OR doc_id % 7 = 2 OR doc_id % 7 = 3
                    OR doc_id % 19 = 0) AS allowed
        FROM (
            SELECT doc_id, url, lang, reg_domain, path,
                   {poly_hash_sql('reg_domain')} AS h
            FROM (
                SELECT doc_id, url, lang,
                       {_reg_domain_sql()} AS reg_domain, path
                FROM (
                    SELECT doc_id, lang, url, {_PARSE_SQL}
                    FROM (SELECT doc_id, lang, {_URL_SQL} AS url FROM documents)
                )
            )
        )"""


WEB07_SQL = f"""
    SELECT doc_id, url, reg_domain, licence,
           CAST(robots_blocked AS INT) AS robots_blocked,
           CAST(meta_optout AS INT) AS meta_optout,
           CAST(allowed AS INT) AS allowed,
           concat_ws(',',
               CASE WHEN tag_hit THEN 'robots_tag_rule' END,
               CASE WHEN disall_hit AND NOT allow_hit AND NOT tag_hit
                    THEN 'robots_disallow_all' END,
               CASE WHEN lic_blocked THEN 'licence' END,
               CASE WHEN meta_optout THEN 'meta_noai' END) AS reasons
    FROM ({_gate_flagged_sql()})
"""


def web08_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-politeness frontier scheduling WITH the compliance gate
    composed: only documents web07's robots/licence/opt-out gate ALLOWS
    enter the frontier (the gate expressions are shared, one source of
    truth), and the allowed frontier becomes a per-host FETCH SCHEDULE
    that honours each host's crawl delay. RFC 9309's Crawl-delay (and every polite crawler's default
    rate limit) is per HOST, so the frontier partitions by registrable
    domain: within a host, pages are fetched shallow-first (path_depth
    asc, doc_id tiebreak — the BFS frontier prioritization crawlers
    default to), the k-th fetch is scheduled at ``k·crawl_delay_ms``,
    and hosts shard across ``WEB08_WORKERS`` fetch workers by domain
    hash (every host's requests serialize on one worker — politeness
    holds under parallelism by construction). Crawl delays derive
    deterministically from the domain hash (500·(1 + h mod 4) ms — the
    500 ms–2 s production band); a real deployment joins fetched
    robots.txt delays instead, same plan.

    Scale shape: ONE exchange on reg_domain for the per-host rank
    window; the compliance gate (web07's expressions — shared via
    ``_compliance_flags``, ONE source of truth), the delay/worker
    derivation and the schedule arithmetic are codegen over the
    URL-synthesis scan; output is allowed-frontier-sized with
    all-integer scheduling columns (bit-identical oracle)."""
    from pyspark.sql import Window

    d, fl = _compliance_flags(_docs(spark, sf_dir).select("doc_id", "source", "lang"))
    d = d.filter(fl["allowed"])
    h = poly_hash(F.col("reg_domain"))
    delay = (500 * (1 + h % 4)).cast("long")
    w = Window.partitionBy("reg_domain").orderBy(F.asc("path_depth"), F.asc("doc_id"))
    rank = F.row_number().over(w) - 1
    return d.select(
        "doc_id",
        "url",
        "reg_domain",
        delay.alias("crawl_delay_ms"),
        (h % WEB08_WORKERS).cast("int").alias("worker"),
        rank.cast("int").alias("fetch_rank"),
        (rank * delay).cast("long").alias("scheduled_ms"),
    )


WEB08_WORKERS = 16

WEB08_SQL = f"""
    WITH fl AS ({_gate_flagged_sql()}),
    allowed AS (
        SELECT doc_id, url, reg_domain, h,
               CAST(len(string_split(path, '/')) - 1 AS INT) AS path_depth
        FROM fl
        WHERE allowed
    ),
    ranked AS (
        SELECT doc_id, url, reg_domain,
               CAST(500 * (1 + h % 4) AS BIGINT) AS crawl_delay_ms,
               CAST(h % {WEB08_WORKERS} AS INT) AS worker,
               CAST(row_number() OVER (
                   PARTITION BY reg_domain ORDER BY path_depth ASC, doc_id ASC
               ) - 1 AS INT) AS fetch_rank
        FROM allowed
    )
    SELECT doc_id, url, reg_domain, crawl_delay_ms, worker, fetch_rank,
           CAST(fetch_rank * crawl_delay_ms AS BIGINT) AS scheduled_ms
    FROM ranked
"""

# ---------------------------------------------------------------------------
# web09: WARC container ingestion — the actual CommonCrawl entry path a
# production pipeline hits FIRST: crawl output ships as WARC 1.0
# containers (ISO 28500), one warcinfo record leading a stream of
# framed response records, optionally gzip-compressed. web01-web08
# start from an already-split page stream; web09 closes the gap with a
# pure-stdlib record walker (`functions/warc.py`) over the binaryFile
# source (`sources/binary.py`), composing each response payload
# straight into web04's extraction expressions.
#
# Fixture (`warc_documents_m<mtime>_s<size>_v2` — the mm23 clone-fixture pattern,
# source-fingerprinted like the IVF index tag): the
# documents table re-serialized as real WARC shards, one response
# record per doc carrying the web04 synthetic page as its HTTP body,
# sharded docs-0000..0007 by doc_id % 8 with shard 0 gzipped (the
# CommonCrawl .warc.gz face; offsets describe the decompressed stream).
# Docs with doc_id % 5 == 0 additionally carry a `metadata` record
# BEFORE their response (CommonCrawl interleaves request/metadata/
# response records), so the type dispatch runs against genuinely mixed
# containers, not just the warcinfo lead. The WALKER — header parse,
# Content-Length framing, warc-type dispatch, gzip handling, HTTP
# split — is the real thing and never sees the construction; the
# DuckDB oracle RECONSTRUCTS every record's framing (header/block byte
# lengths, per-shard running offsets INCLUDING the skipped metadata
# records) in closed form from the same documents rows.
# ---------------------------------------------------------------------------

W09_SHARDS = 8
W09_SCHEMA = (
    "doc_id long, file string, rec_offset long, rec_len long, "
    "url string, http_status int, html string"
)


def _py_url(doc_id: int, source: str, lang: str) -> str:
    """`_with_url`/`_URL_SQL`'s construction in Python, character for
    character — the fixture encoder's side of the cross-engine contract."""
    sub = ("", "www.", "cdn.")[doc_id % 3]
    tld = ("com", "org", "co.uk", "com.cn", "net")[doc_id % 5]
    path = f"/{lang}"
    if doc_id % 4 >= 1:
        path += f"/s{doc_id % 23}"
    if doc_id % 4 >= 2:
        path += f"/t{doc_id % 7}"
    if doc_id % 4 >= 3:
        path += f"/p{doc_id % 11}"
    if doc_id % 13 == 0:
        path += f"/tag/{doc_id % 5}"
    if doc_id % 6 == 0 and doc_id % 17 == 0:
        q = f"?sid={doc_id}&ref=promo"
    elif doc_id % 6 == 0:
        q = f"?sid={doc_id}"
    elif doc_id % 17 == 0:
        q = "?ref=promo"
    else:
        q = ""
    return f"https://{sub}{lang}.{source}hub.{tld}{path}{q}"


def _py_html(doc_id: int, source: str, lang: str, text: str) -> str:
    """`_with_html`/`_HTML_SQL`'s page in Python, character for character."""
    if doc_id % 2 == 0:
        fw = text.split(" ")[0]
        body = f'<a href="/w">{fw}</a>' + text[len(fw):]
    else:
        body = text
    rel = (
        '<div class="rel"><a href="/r1">read more</a> <a href="/r2">also this</a> tiny</div>'
        if doc_id % 3 == 0
        else ""
    )
    return (
        f"<html><head><title>{lang} page</title></head><body>"
        '<nav><a href="/">home</a> <a href="/tag/0">tags</a> <a href="/arch">archive</a></nav>'
        f'<div id="main"><p>{body}</p></div>{rel}'
        '<footer><a href="/about">about</a> <a href="/legal">legal</a> copyright '
        f"{source}</footer></body></html>"
    )


def _warc_shard_name(shard: int) -> str:
    return f"docs-{shard:04d}.warc" + (".gz" if shard == 0 else "")


def _warc_fixture(sf_dir: str) -> str:
    """The documents table as real WARC containers, built once per
    sf_dir under .scratch (atomic tmp-dir + rename, the
    `_ivf_index_stored` lifecycle). Shard 0 is gzipped with mtime=0 so
    the fixture bytes are deterministic."""
    import gzip
    import os
    import shutil

    import pyarrow.parquet as pq

    from ..functions.warc import (
        CRLF,
        encode_response_record,
        encode_warc_record,
        encode_warcinfo,
    )
    from ..sources.registry import scratch_key, table_path

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # the fixture name folds in the source parquet's (mtime, size) —
    # the `_ivf_index_stored` fingerprint discipline — so regenerating
    # the documents table in place invalidates the shards instead of
    # silently serving stale bytes while the oracle reads fresh rows
    # (hook.default_table_resolver strips the fingerprint back out)
    st = os.stat(table_path(sf_dir, "documents"))
    out_dir = os.path.join(
        repo,
        ".scratch",
        scratch_key(sf_dir),
        f"warc_documents_m{int(st.st_mtime)}_s{st.st_size}_v2",
    )
    if not os.path.isdir(out_dir):
        tbl = pq.read_table(
            table_path(sf_dir, "documents"), columns=["doc_id", "source", "lang", "text"]
        )
        rows = sorted(
            zip(
                tbl.column("doc_id").to_pylist(),
                tbl.column("source").to_pylist(),
                tbl.column("lang").to_pylist(),
                tbl.column("text").to_pylist(),
            )
        )
        shards: dict[int, list[bytes]] = {}
        for did, src, lang, text in rows:  # doc_id-ascending within each shard
            url = _py_url(did, src, lang)
            recs = shards.setdefault(did % W09_SHARDS, [])
            if did % 5 == 0:  # interleaved non-response record (skipped)
                recs.append(
                    encode_warc_record(
                        "metadata",
                        [("WARC-Target-URI", url)],
                        f"fetchTimeMs: {did % 1000}{CRLF}".encode("utf-8"),
                    )
                )
            recs.append(
                encode_response_record(
                    url,
                    f"<urn:hls:doc:{did}>",
                    _py_html(did, src, lang, text).encode("utf-8"),
                )
            )
        tmp = f"{out_dir}.tmp-{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        for s in range(W09_SHARDS):
            data = encode_warcinfo() + b"".join(shards.get(s, []))
            if s == 0:
                data = gzip.compress(data, mtime=0)
            with open(os.path.join(tmp, _warc_shard_name(s)), "wb") as f:
                f.write(data)
        try:
            os.rename(tmp, out_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(out_dir):  # see _ivf_index_stored
                raise
    return out_dir


def _doc_id_of_record_id(rid: str):
    """doc_id out of the FIXTURE's record-id grammar
    (``<urn:hls:doc:N>``) — None for any other id scheme (real WARCs
    use ``<urn:uuid:...>``; those records still flow through with a
    null doc_id instead of crashing the walker)."""
    tail = rid.rsplit(":", 1)[-1].rstrip(">")
    return int(tail) if tail.isdigit() else None


def _warc_record_batches(batches):
    """mapInPandas worker: one linear walk per container — gunzip if
    the name says so, split records by Content-Length framing, keep the
    responses, split HTTP status from body. O(file bytes), no state
    across files. Payloads decode with replacement (real crawls carry
    mislabeled charsets; a mojibake row beats a dead container)."""
    import pandas as pd

    from ..functions.warc import maybe_gunzip, split_http_response, walk_warc

    cols = ["doc_id", "file", "rec_offset", "rec_len", "url", "http_status", "html"]
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            name = str(path).rsplit("/", 1)[-1]
            data = maybe_gunzip(name, bytes(content))
            for rec in walk_warc(data):
                if rec["type"] != "response":
                    continue
                status, body = split_http_response(rec["block"])
                rid = rec["headers"].get("warc-record-id", "")
                rows.append(
                    (
                        _doc_id_of_record_id(rid),
                        name,
                        rec["offset"],
                        rec["length"],
                        rec["headers"].get("warc-target-uri", ""),
                        status,
                        body.decode("utf-8", "replace"),
                    )
                )
        yield pd.DataFrame(rows, columns=cols)


def warc_records(files: DataFrame) -> DataFrame:
    """The record barrier over a binaryFile frame (batch OR streaming —
    the walk is per-container stateless, so the same stage serves both
    faces): one Arrow pass per container row, one output row per
    response record."""
    return files.select("path", "content").mapInPandas(
        _warc_record_batches, schema=W09_SCHEMA
    )


def warc_extract_cols(recs: DataFrame) -> DataFrame:
    """web04's extraction metrics over the record stream's HTML payload
    — pure codegen string expressions, shared verbatim by the batch op
    and the streaming face."""
    plain = F.regexp_replace("html", "<[^>]*>", "")
    return recs.select(
        "doc_id",
        "file",
        "rec_offset",
        "rec_len",
        "url",
        "http_status",
        F.regexp_extract("html", "<title>([^<]*)</title>", 1).alias("title"),
        F.octet_length("html").cast("int").alias("html_bytes"),
        F.octet_length(plain).cast("int").alias("text_bytes"),
        F.round(F.octet_length(plain) / F.octet_length("html") + 1e-9, 4).alias(
            "markup_ratio"
        ),
    )


def web09_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion composed into web04's extraction: split real WARC
    containers into response records (framing offsets/lengths, target
    URI, HTTP status), then run the extraction metrics over each
    record's HTML payload — the end-to-end CommonCrawl entry stage.

    Scale shape: the binaryFile scan parallelizes across containers
    (CommonCrawl ships ~1 GB .warc.gz files in the tens of thousands
    per snapshot — file-count ≫ executor-count, and the 2 GiB
    JVM-byte-array bound is `sources/binary.py`'s documented boundary);
    the walker is ONE linear Arrow-batched pass per container with no
    state across files and output ∝ record count, never payload-squared;
    the extraction metrics are the SAME whole-stage-codegen string
    expressions web04 runs (octet_length/regexp on the payload column)
    — no shuffle anywhere in the plan (record streams feed downstream
    gates/dedup exactly where web04's output does today)."""
    from ..sources.binary import read_binary_dir

    files = read_binary_dir(spark, _warc_fixture(sf_dir), "*.warc*")
    return warc_extract_cols(warc_records(files))


# the oracle reconstructs every record's BYTE FRAMING in closed form:
# build the same header/block strings the fixture encoder writes
# (strlen = UTF-8 bytes, matching Spark's octet_length), then running
# per-shard offsets behind the constant warcinfo lead record
_W09_CRLF = "chr(13) || chr(10)"
_W09_WINFO_BODY = (
    f"'software: hive-lineage-spark/0.1' || {_W09_CRLF} "
    f"|| 'format: WARC File Format 1.0' || {_W09_CRLF}"
)
_W09_BLOCK = (
    f"'HTTP/1.1 200 OK' || {_W09_CRLF} || 'Content-Type: text/html' "
    f"|| {_W09_CRLF} || {_W09_CRLF} || html"
)
_W09_META_BODY = f"'fetchTimeMs: ' || CAST(doc_id % 1000 AS VARCHAR) || {_W09_CRLF}"

WEB09_SQL = f"""
    WITH base AS (
        SELECT doc_id, {_URL_SQL} AS url, {_HTML_SQL} AS html,
               'docs-' || lpad(CAST(doc_id % {W09_SHARDS} AS VARCHAR), 4, '0')
                       || CASE WHEN doc_id % {W09_SHARDS} = 0 THEN '.warc.gz' ELSE '.warc' END AS file
        FROM documents
    ),
    framed AS (
        SELECT doc_id, url, html, file,
               strlen({_W09_BLOCK}) AS blen,
               strlen('WARC/1.0' || {_W09_CRLF} || 'WARC-Type: response' || {_W09_CRLF}
                      || 'WARC-Target-URI: ' || url || {_W09_CRLF}
                      || 'WARC-Record-ID: <urn:hls:doc:' || CAST(doc_id AS VARCHAR) || '>' || {_W09_CRLF}
                      || 'Content-Type: application/http;msgtype=response' || {_W09_CRLF}
                      || 'Content-Length: ' || CAST(strlen({_W09_BLOCK}) AS VARCHAR)
                      || {_W09_CRLF} || {_W09_CRLF}) AS hlen,
               CASE WHEN doc_id % 5 = 0 THEN strlen(
                   'WARC/1.0' || {_W09_CRLF} || 'WARC-Type: metadata' || {_W09_CRLF}
                   || 'WARC-Target-URI: ' || url || {_W09_CRLF}
                   || 'Content-Length: ' || CAST(strlen({_W09_META_BODY}) AS VARCHAR)
                   || {_W09_CRLF} || {_W09_CRLF} || {_W09_META_BODY}
                   || {_W09_CRLF} || {_W09_CRLF}) ELSE 0 END AS mlen,
               strlen('WARC/1.0' || {_W09_CRLF} || 'WARC-Type: warcinfo' || {_W09_CRLF}
                      || 'Content-Type: application/warc-fields' || {_W09_CRLF}
                      || 'Content-Length: ' || CAST(strlen({_W09_WINFO_BODY}) AS VARCHAR)
                      || {_W09_CRLF} || {_W09_CRLF} || {_W09_WINFO_BODY}
                      || {_W09_CRLF} || {_W09_CRLF}) AS wlen
        FROM base
    )
    SELECT doc_id, file,
           CAST(wlen + mlen + coalesce(sum(mlen + hlen + blen + 4) OVER (
               PARTITION BY file ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rec_offset,
           CAST(hlen + blen + 4 AS BIGINT) AS rec_len,
           url, CAST(200 AS INT) AS http_status,
           regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
           CAST(strlen(html) AS INT) AS html_bytes,
           CAST(strlen(regexp_replace(html, '<[^>]*>', '', 'g')) AS INT) AS text_bytes,
           round(strlen(regexp_replace(html, '<[^>]*>', '', 'g')) * 1.0 / strlen(html) + 1e-9, 4) AS markup_ratio
    FROM framed
"""


# operator-authored lineage through the walker barrier: every record
# column derives from the container bytes, the shard name from the path
DECLARED = {
    "web09_warc_extract": {
        "doc_id": ["content"],
        "file": ["path"],
        "rec_offset": ["content"],
        "rec_len": ["content"],
        "url": ["content"],
        "http_status": ["content"],
        "html": ["content"],
    },
}


def web10_frontier_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """web08's politeness schedule with a PER-HOST FRONTIER CAP — the
    mega-host escape hatch: a wikipedia-class host with 10^7 frontier
    URLs makes web08's per-host rank window one straggler partition,
    and scheduling past the politeness horizon is useless anyway (the
    k-th fetch waits k·delay; past k = W10_CAP the next crawl cycle
    re-frontiers the rest). Capping top-H shallow-first per host turns
    the full-window sort into WindowGroupLimit partial/final: every
    map task sheds rows past rank H BEFORE the reg_domain exchange, so
    the shuffle carries at most H rows per host per task instead of
    the mega-host's whole frontier. web08 stays the exact default;
    this is the documented hot-host swap (dd13/ss21's
    production-twin pattern).

    Scale shape: identical to web08 (gate filters before the single
    reg_domain exchange) plus the group-limit prune; plan-pinned:
    WindowGroupLimit present AND the partial mode runs before the
    exchange."""
    from pyspark.sql import Window

    d, fl = _compliance_flags(_docs(spark, sf_dir).select("doc_id", "source", "lang"))
    d = d.filter(fl["allowed"])
    h = poly_hash(F.col("reg_domain"))
    delay = (500 * (1 + h % 4)).cast("long")
    w = Window.partitionBy("reg_domain").orderBy(F.asc("path_depth"), F.asc("doc_id"))
    rank = F.row_number().over(w)
    return (
        d.withColumn("rn", rank)
        .filter(F.col("rn") <= W10_CAP)  # row_number filter → WindowGroupLimit
        .select(
            "doc_id",
            "url",
            "reg_domain",
            delay.alias("crawl_delay_ms"),
            (h % WEB08_WORKERS).cast("int").alias("worker"),
            (F.col("rn") - 1).cast("int").alias("fetch_rank"),
            ((F.col("rn") - 1) * delay).cast("long").alias("scheduled_ms"),
        )
    )


W10_CAP = 8  # per-host frontier budget (politeness horizon: 8·delay)


# ---------------------------------------------------------------------------
# web11: frontier refresh — the stage that closes the crawl OPERATIONS
# loop: discover (web01) → gate (web03) → comply (web07) → schedule
# (web08/web10) → fetch → ...and next cycle, decide WHICH known URLs
# are due for refetch. Production crawlers (the Googlebot scheduling
# literature; Cho & Garcia-Molina 2003 "Effective page refresh
# policies") budget refreshes by per-host freshness class and each
# page's observed change rate: news-class hosts re-crawl in hours,
# archives in months, and a page that never changes earns a longer
# TTL. The TESTDATA corpus carries no fetch ledger, so last-fetch age
# and change class derive deterministically (the web01/web07 fixture
# pattern): age from the URL's polynomial hash, host class from the
# registrable domain's hash, change class from doc_id residues. The
# POLICY machinery — class TTLs, change-rate TTL stretch, due verdict,
# overdue prioritization — is the real thing and never sees the
# construction.
# ---------------------------------------------------------------------------

# freshness TTL (hours) by host class: news / active / static / archive
_W11_TTLS = (6, 24, 168, 720)


def web11_frontier_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-driven refresh gate over the known-URL ledger: per
    ALLOWED url (web07's gate composed — refetching a disallowed URL
    is both wasted budget and non-compliant), the host's freshness
    class and TTL, the page's change-class TTL stretch (a page
    observed never to change earns 2×/4× its class TTL), the hours
    since last fetch, the due-for-refetch verdict and the overdue
    ratio the next cycle's scheduler (web08/web10) sorts by.

    Scale shape (web07's precedent): the ledger scan IS the plan — the
    gate, class derivation, TTL arithmetic and verdict are one
    whole-stage-codegen map fused into the scan; zero exchanges, zero
    joins (plan-pinned). A real deployment joins a fetch-history table
    keyed by url hash instead of the hash-derived stand-ins — one
    broadcast-or-bucketed join, policy expressions unchanged. Exact
    integer contract: ages/TTLs are integer hours, the due verdict an
    integer compare; only the overdue ratio divides (rounded 4 dp with
    the house nudge)."""
    d, fl = _compliance_flags(_docs(spark, sf_dir).select("doc_id", "source", "lang"))
    d = d.filter(fl["allowed"])
    hh = poly_hash(F.col("reg_domain"))
    host_class = F.pmod(hh, F.lit(4))
    ttl = (
        F.when(host_class == 0, F.lit(_W11_TTLS[0]))
        .when(host_class == 1, F.lit(_W11_TTLS[1]))
        .when(host_class == 2, F.lit(_W11_TTLS[2]))
        .otherwise(F.lit(_W11_TTLS[3]))
    )
    # change class 0/1/2 → TTL × 1/2/4 (slower-changing pages wait);
    # a CASE multiplier, not F.shiftleft — the Python shiftleft only
    # takes a literal bit count (the r12 gotcha)
    change_mult = (
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.lit(1))
        .when(F.pmod(F.col("doc_id"), F.lit(3)) == 1, F.lit(2))
        .otherwise(F.lit(4))
    )
    eff_ttl = (ttl * change_mult).cast("long")
    age_h = F.pmod(poly_hash(F.col("url")), F.lit(721)).cast("long")
    return d.select(
        "doc_id",
        "url",
        "reg_domain",
        host_class.cast("int").alias("host_class"),
        eff_ttl.alias("ttl_h"),
        age_h.alias("age_h"),
        (age_h >= eff_ttl).cast("int").alias("due"),
        F.round(age_h / eff_ttl + 1e-9, 4).alias("overdue_ratio"),
    )


WEB11_SQL = f"""
    WITH fl AS ({_gate_flagged_sql()}),
    allowed AS (
        SELECT doc_id, url, reg_domain, h FROM fl WHERE allowed
    ),
    policy AS (
        SELECT doc_id, url, reg_domain,
               h % 4 AS host_class,
               CAST((CASE WHEN h % 4 = 0 THEN {_W11_TTLS[0]}
                          WHEN h % 4 = 1 THEN {_W11_TTLS[1]}
                          WHEN h % 4 = 2 THEN {_W11_TTLS[2]}
                          ELSE {_W11_TTLS[3]} END)
                    * (CASE WHEN doc_id % 3 = 0 THEN 1
                            WHEN doc_id % 3 = 1 THEN 2
                            ELSE 4 END) AS BIGINT) AS ttl_h,
               CAST(({poly_hash_sql('url')}) % 721 AS BIGINT) AS age_h
        FROM allowed
    )
    SELECT doc_id, url, reg_domain,
           CAST(host_class AS INT) AS host_class, ttl_h, age_h,
           CAST(age_h >= ttl_h AS INT) AS due,
           round(age_h * 1.0 / ttl_h + 1e-9, 4) AS overdue_ratio
    FROM policy
"""

# web08's schedule, capped: identical rank/delay/worker derivation, the
# survivors are exactly the top-W10_CAP shallow-first rows per host
WEB10_SQL = f"""
    SELECT * FROM ({WEB08_SQL}) WHERE fetch_rank < {W10_CAP}
"""


QUERIES = {
    "web01_url_parse": web01_url_parse,
    "web02_host_dup_rate": web02_host_dup_rate,
    "web03_url_blocklist": web03_url_blocklist,
    "web04_html_extract": web04_html_extract,
    "web05_boilerplate_gate": web05_boilerplate_gate,
    "web06_url_canonical_dedup": web06_url_canonical_dedup,
    "web07_robots_compliance_gate": web07_robots_compliance_gate,
    "web08_politeness_schedule": web08_politeness_schedule,
    "web09_warc_extract": web09_warc_extract,
    "web10_frontier_cap": web10_frontier_cap,
    "web11_frontier_refresh": web11_frontier_refresh,
}

ORACLES = {
    "web01_url_parse": WEB01_SQL,
    "web02_host_dup_rate": WEB02_SQL,
    "web03_url_blocklist": WEB03_SQL,
    "web04_html_extract": WEB04_SQL,
    "web05_boilerplate_gate": WEB05_SQL,
    "web06_url_canonical_dedup": WEB06_SQL,
    "web07_robots_compliance_gate": WEB07_SQL,
    "web08_politeness_schedule": WEB08_SQL,
    "web09_warc_extract": WEB09_SQL,
    "web10_frontier_cap": WEB10_SQL,
    "web11_frontier_refresh": WEB11_SQL,
}
