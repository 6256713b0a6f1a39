"""URL/domain heuristics for corpus filtering — the C4/RefinedWeb gate.

Web-scale training corpora are filtered by where a document CAME FROM
before anything looks at its text: parse the source URL into host /
registered domain / TLD / path shape, drop documents whose domain sits on
a blocklist (or whose TLD class is unwanted), and cap the volume any one
domain may contribute so a single crawl-heavy site cannot dominate the
mixture (C4, Raffel et al. 2020 §2.2; RefinedWeb, Penedo et al. 2023 §3.1
"URL filtering").  These three operators provide that gate over the
``documents`` table.

The synthetic corpus carries no URL column, so each document gets a
DETERMINISTIC synthetic URL derived from (doc_id, source) — same posture
as the multimodal battery's synthesized BMP/WAV payloads
(``llm/multimodal.py``): the construction is replayed relationally in the
DuckDB oracle, while the Spark side must recover every attribute by
actually PARSING the URL string, so a parser bug hash-mismatches.

Reference analog: none — the reference ingests a closed satellite catalog
(``sources/meteosat.py:105-122``); provenance filtering is part of the
[EXT] training-data mandate, like ``llm/sampling.py``.

Scale shape: parsing is a pure projection (no shuffle, whole-stage
codegen string ops); the blocklist is a broadcast anti-join (the list is
human-curated — thousands of rows, never corpus-sized); the volume cap is
one shuffle on the domain key with a ``row_number <= K`` predicate that
Spark plans as WindowGroupLimit (per-partition top-K heaps BEFORE the
exchange), so hot domains ship at most K candidate rows per input
partition instead of their whole crawl — the property that keeps the cap
viable when one domain owns 1% of a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_SUBS = ["www.", "blog.", ""]
_TLDS = ["com", "org", "net", "biz"]
_DOMAIN_CAP = 3
_BLOCKED_DOMAINS = ["src1.com", "src2.org", "src5.net", "src7.com", "src11.org"]
_BLOCKED_TLD = "biz"

# DuckDB replay of the URL synthesis (the oracle's input CTE).  Keep in
# exact lockstep with _with_url below — both engines must produce
# byte-identical strings.
_URLS_CTE = """
WITH urls AS (
  SELECT doc_id, source,
         'https://'
         || (['www.','blog.',''])[CAST(doc_id % 3 AS INT) + 1]
         || source || '.'
         || (['com','org','net','biz'])[CAST(doc_id % 4 AS INT) + 1]
         || repeat('/p', CAST(doc_id % 5 AS INT))
         || CASE WHEN doc_id % 7 = 0 THEN '?ref=feed' ELSE '' END AS url
  FROM documents
)
"""

# DuckDB replay of the PARSE (host / domain / tld from the url string
# only, mirroring _parsed) — shared by the blocklist and cap oracles.
_PARSED_CTE = _URLS_CTE + """
, parsed AS (
  SELECT doc_id, url,
         regexp_extract(url, '^https://([^/?#]+)', 1) AS host
  FROM urls
), attrs AS (
  SELECT doc_id, url, host,
         array_to_string((string_split(host, '.'))[-2:], '.') AS domain,
         regexp_extract(host, '\\.([a-z]+)$', 1) AS tld
  FROM parsed
)
"""


def _with_url(docs: DataFrame) -> DataFrame:
    """Attach the deterministic synthetic URL (see module docstring)."""
    sub = F.element_at(
        F.array(*[F.lit(s) for s in _SUBS]), (F.col("doc_id") % 3).cast("int") + 1
    )
    tld = F.element_at(
        F.array(*[F.lit(t) for t in _TLDS]), (F.col("doc_id") % 4).cast("int") + 1
    )
    path = F.repeat(F.lit("/p"), (F.col("doc_id") % 5).cast("int"))
    query = F.when(F.col("doc_id") % 7 == 0, F.lit("?ref=feed")).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), sub, F.col("source"), F.lit("."), tld, path, query
        ).alias("url"),
    )


def _host(url: Column) -> Column:
    return F.regexp_extract(url, r"^https://([^/?#]+)", 1)


def _parsed(docs: DataFrame) -> DataFrame:
    """Parse host / subdomain / registered domain / TLD / path depth /
    query flag from the URL STRING — never from the synthesis variables,
    so the parser itself is what the oracle checks."""
    with_host = _with_url(docs).withColumn("host", _host(F.col("url")))
    labels = F.split("host", r"\.")
    path = F.regexp_extract("url", r"^https://[^/?#]+([^?#]*)", 1)
    return with_host.select(
        "doc_id",
        "url",
        "host",
        F.when(F.size(labels) == 3, F.element_at(labels, 1))
        .otherwise(F.lit(""))
        .alias("subdomain"),
        F.array_join(F.slice(labels, -2, 2), ".").alias("domain"),
        F.regexp_extract("host", r"\.([a-z]+)$", 1).alias("tld"),
        (
            F.length(path) - F.length(F.regexp_replace(path, "/", ""))
        ).cast("long").alias("path_depth"),
        F.col("url").contains("?").alias("has_query"),
    )


@register(
    "ext_url_parse",
    oracle=_URLS_CTE + """
SELECT doc_id, url,
       host,
       CASE WHEN len(string_split(host, '.')) = 3
            THEN (string_split(host, '.'))[1] ELSE '' END AS subdomain,
       array_to_string((string_split(host, '.'))[-2:], '.') AS domain,
       regexp_extract(host, '\\.([a-z]+)$', 1) AS tld,
       CAST(length(path) - length(replace(path, '/', '')) AS BIGINT) AS path_depth,
       contains(url, '?') AS has_query
FROM (
  SELECT doc_id, url,
         regexp_extract(url, '^https://([^/?#]+)', 1) AS host,
         regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1) AS path
  FROM urls
)
""",
)
def ext_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document URL anatomy: host, optional subdomain, registered
    domain (last two labels), TLD, path depth, query-string flag — the
    feature set every URL-level corpus gate keys on (C4 drops by
    blocklist domain; RefinedWeb scores subdomain + path shape).

    Execution: pure projection — regexp/string ops inside whole-stage
    codegen, no shuffle, no UDF; at 100 TB this pushes through the scan
    at I/O speed like ``ext_text_stats``."""
    return _parsed(table(spark, sf_dir, "documents"))


@register(
    "ext_url_blocklist",
    oracle=_PARSED_CTE + f"""
SELECT a.doc_id, a.domain, a.tld
FROM attrs a
WHERE a.tld <> '{_BLOCKED_TLD}'
  AND a.domain NOT IN ({", ".join(f"'{d}'" for d in _BLOCKED_DOMAINS)})
""",
)
def ext_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4-style provenance gate: drop every document whose registered
    domain sits on a curated blocklist, plus a TLD class rule (the
    '.{biz}' spam heuristic) — documents surviving BOTH remain.

    Execution: the blocklist (human-curated, thousands of rows at worst)
    becomes a BROADCAST anti-join — no corpus shuffle, each task filters
    its partition against the in-memory list; the TLD rule is a plain
    codegen predicate on the same pass.  The realistic 100 TB layout
    (millions of blocked domains) still broadcasts: 10M domains x ~30
    bytes is ~300 MB — chunk the list or bloom-prefilter if it outgrows
    the broadcast budget, but it never justifies shuffling the corpus."""
    parsed = _parsed(table(spark, sf_dir, "documents"))
    block = spark.createDataFrame(
        [(d,) for d in _BLOCKED_DOMAINS], "domain string"
    )
    return (
        parsed.filter(F.col("tld") != _BLOCKED_TLD)
        .join(F.broadcast(block), "domain", "left_anti")
        .select("doc_id", "domain", "tld")
    )


@register(
    "ext_domain_volume_cap",
    oracle=_PARSED_CTE + f"""
SELECT doc_id, domain, rk
FROM (
  SELECT doc_id, domain,
         CAST(row_number() OVER (
           PARTITION BY domain
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM attrs
)
WHERE rk <= {_DOMAIN_CAP}
""",
)
def ext_domain_volume_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb's per-domain volume cap: keep at most _DOMAIN_CAP
    documents per registered domain, chosen by content-hash order (a
    deterministic uniform draw — never ``rand()``, which is unverifiable
    and epoch-unstable).  Composes with the per-SOURCE cap
    ``ext_group_sample`` (llm/sampling.py:48): domain first (provenance
    skew), source second (mixture weights).

    Execution: one shuffle on the domain key; the ``row_number <= K``
    predicate plans as WindowGroupLimit, so every input partition ships
    at most K rows per domain into the exchange — a domain owning 1% of
    a 100 TB corpus contributes K x n_partitions candidate rows, not
    10^9; no salting needed because the limit does the skew-clipping."""
    parsed = _parsed(table(spark, sf_dir, "documents"))
    key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("domain").orderBy(key, F.col("doc_id"))
    return (
        parsed.select("doc_id", "domain")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _DOMAIN_CAP)
    )


@register(
    "ext_url_dedup",
    oracle=_URLS_CTE + r"""
SELECT regexp_replace(regexp_replace(url, '^https://(www\.)?', ''), '\?.*$', '') AS curl,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*)    AS BIGINT) AS n_copies
FROM urls
GROUP BY 1
""",
)
def ext_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact URL dedup after canonicalization — the first gate of every
    web-crawl pipeline (CommonCrawl re-crawls the same page across
    snapshots): strip the scheme, a leading ``www.``, and the query
    string, then keep the lowest doc_id per canonical URL.  Different
    subdomain forms and tracking-parameter variants of one page collapse
    to one representative; ``n_copies`` is the crawl-dup multiplicity.

    Scale shape: one groupBy on the canonical URL (short string key;
    for 100 TB key volume swap in the 16-byte md5 of the canonical form
    — the ``ext_dedup_exact`` discipline, llm/dedup.py:132) with
    map-side combine; payloads never move, only (key, id) pairs."""
    urls = _with_url(table(spark, sf_dir, "documents"))
    curl = F.regexp_replace(
        F.regexp_replace("url", r"^https://(www\.)?", ""), r"\?.*$", ""
    )
    return (
        urls.select("doc_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )
