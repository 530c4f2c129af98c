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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


QUERIES = {
    "web01_url_parse": web01_url_parse,
    "web02_host_dup_rate": web02_host_dup_rate,
    "web03_url_blocklist": web03_url_blocklist,
}

ORACLES = {
    "web01_url_parse": WEB01_SQL,
    "web02_host_dup_rate": WEB02_SQL,
    "web03_url_blocklist": WEB03_SQL,
}
