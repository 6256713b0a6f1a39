"""Declarative data-quality expectations — the Deequ/Great-Expectations
gate a production lakehouse runs before publishing a table version.

A rule set (completeness, uniqueness, value domain, numeric range,
referential integrity) is evaluated against the TPC-H-ish tables in ONE
aggregate pass per table plus one key join for the foreign-key rule; the
result is a small (rule, metric, threshold, passed) report — the thing a
CI gate or a Delta commit hook asserts on before data goes live.

Reference analog: the reference pipeline trusts its catalog blindly
(``sources/meteosat.py:105-122`` ingests whatever the availability query
returns); a validation gate is [EXT] pipeline-hardening territory, the
batch twin of the constraint enforcement the Delta layer already does
per-commit (``sources/delta_log.py`` CHECK constraints).

Scale shape: every per-table rule folds into a single
map-side-combined aggregate over that table (4 metrics for orders cost
one scan, not four); the referential-integrity rule is a distinct on
the child key followed by one equi-join against the parent key — both
key-column-only, so at 100 TB the join moves two key columns, never
payloads.  The report itself is |rules| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_SEG_NULL_TH = 0.01


@register(
    "ext_data_expectations",
    oracle=f"""
WITH o AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(o_orderkey) AS BIGINT) AS nn_key,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd_key,
         CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_price,
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
  FROM orders
), l AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS oob_qty
  FROM lineitem
), c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(c_mktsegment) AS BIGINT) AS nn_seg
  FROM customer
), r AS (
  SELECT CAST(count(*) AS BIGINT) AS nk,
         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphans
  FROM (SELECT DISTINCT l_orderkey FROM lineitem) lk
  LEFT JOIN orders o ON lk.l_orderkey = o.o_orderkey
)
SELECT rule, round(metric, 6) AS metric,
       CAST(threshold AS DOUBLE) AS threshold,
       round(metric, 6) <= CAST(threshold AS DOUBLE) AS passed
FROM (
  SELECT 'orders.o_orderkey.not_null' AS rule,
         1.0 - CAST(nn_key AS DOUBLE) / n AS metric, 0.0 AS threshold FROM o
  UNION ALL
  SELECT 'orders.o_orderkey.unique',
         1.0 - CAST(nd_key AS DOUBLE) / n, 0.0 FROM o
  UNION ALL
  SELECT 'orders.o_totalprice.non_negative',
         CAST(neg_price AS DOUBLE) / n, 0.0 FROM o
  UNION ALL
  SELECT 'orders.o_orderstatus.domain',
         CAST(bad_status AS DOUBLE) / n, 0.0 FROM o
  UNION ALL
  SELECT 'lineitem.l_quantity.range_1_50',
         CAST(oob_qty AS DOUBLE) / n, 0.0 FROM l
  UNION ALL
  SELECT 'customer.c_mktsegment.complete',
         1.0 - CAST(nn_seg AS DOUBLE) / n, {_SEG_NULL_TH} FROM c
  UNION ALL
  SELECT 'lineitem.l_orderkey.ref_orders',
         CAST(orphans AS DOUBLE) / nk, 0.0 FROM r
)
""",
)
def ext_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the declared expectation suite; returns one row per rule
    with the measured violation metric, its threshold, and pass/fail —
    the publish gate of a data pipeline (Deequ's ``Check`` /
    Great Expectations' suite, re-expressed as plain aggregates).

    Cost model: orders' four rules share ONE aggregate (one scan),
    lineitem's range rule one, customer's completeness one; the
    referential-integrity rule joins the DISTINCT child keys against the
    parent keys (key columns only).  The report is |rules| rows — a
    bounded artifact safe to collect, alert on, or commit."""
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    customer = table(spark, sf_dir, "customer")

    o = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("o_orderkey").cast("long").alias("nn_key"),
        F.countDistinct("o_orderkey").cast("long").alias("nd_key"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0))
        .cast("long")
        .alias("neg_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        )
        .cast("long")
        .alias("bad_status"),
    )
    l = lineitem.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("oob_qty"),
    )
    c = customer.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("c_mktsegment").cast("long").alias("nn_seg"),
    )
    lk = lineitem.select("l_orderkey").distinct()
    r = (
        lk.join(
            orders.select("o_orderkey"),
            lk.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("nk"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("orphans"),
        )
    )

    n = F.col("n").cast("double")
    rules = [
        o.select(
            F.lit("orders.o_orderkey.not_null").alias("rule"),
            (1.0 - F.col("nn_key").cast("double") / n).alias("metric"),
            F.lit(0.0).alias("threshold"),
        ),
        o.select(
            F.lit("orders.o_orderkey.unique").alias("rule"),
            (1.0 - F.col("nd_key").cast("double") / n).alias("metric"),
            F.lit(0.0).alias("threshold"),
        ),
        o.select(
            F.lit("orders.o_totalprice.non_negative").alias("rule"),
            (F.col("neg_price").cast("double") / n).alias("metric"),
            F.lit(0.0).alias("threshold"),
        ),
        o.select(
            F.lit("orders.o_orderstatus.domain").alias("rule"),
            (F.col("bad_status").cast("double") / n).alias("metric"),
            F.lit(0.0).alias("threshold"),
        ),
        l.select(
            F.lit("lineitem.l_quantity.range_1_50").alias("rule"),
            (F.col("oob_qty").cast("double") / n).alias("metric"),
            F.lit(0.0).alias("threshold"),
        ),
        c.select(
            F.lit("customer.c_mktsegment.complete").alias("rule"),
            (1.0 - F.col("nn_seg").cast("double") / n).alias("metric"),
            F.lit(_SEG_NULL_TH).alias("threshold"),
        ),
        r.select(
            F.lit("lineitem.l_orderkey.ref_orders").alias("rule"),
            (F.col("orphans").cast("double") / F.col("nk").cast("double")).alias(
                "metric"
            ),
            F.lit(0.0).alias("threshold"),
        ),
    ]
    report = rules[0]
    for extra in rules[1:]:
        report = report.unionByName(extra)
    return report.select(
        "rule",
        F.round("metric", 6).alias("metric"),
        "threshold",
        (F.round("metric", 6) <= F.col("threshold")).alias("passed"),
    )


_K_ANON = 5


@register(
    "ext_k_anonymity",
    oracle=f"""
WITH qi AS (
  SELECT lang, source,
         CAST(n_chars // 100 AS BIGINT) AS len_bucket,
         CAST(count(*) AS BIGINT) AS group_size
  FROM documents
  GROUP BY 1, 2, 3
)
SELECT lang, source, len_bucket, group_size,
       group_size < {_K_ANON} AS violates_k
FROM qi
""",
)
def ext_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY audit over the quasi-identifier tuple (lang, source,
    length bucket): any combination shared by fewer than k = {k}
    documents re-identifies its members through the metadata alone —
    the privacy check a dataset release runs BEFORE publication
    (Sweeney 2002), complementing content-level ``ext_pii_mask``.
    The remediation pipeline exists here too: generalize the bucket
    (coarser len_bucket), or suppress via ``ext_group_sample``-style
    caps on the violating groups.

    Scale shape: ONE map-side-combined groupBy on the quasi-identifier
    tuple; the report is |QI-combination|-sized.  At 100 TB with
    high-cardinality QIs the same aggregate stands — violating groups
    are BY DEFINITION the small ones, so the report stays skew-free."""
    docs = table(spark, sf_dir, "documents")
    qi = docs.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("group_size"))
    return qi.select(
        "lang",
        "source",
        "len_bucket",
        "group_size",
        (F.col("group_size") < _K_ANON).alias("violates_k"),
    )


ext_k_anonymity.__doc__ = ext_k_anonymity.__doc__.format(k=_K_ANON)


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


@register(
    "ext_column_profile",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{c}' AS col,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count({c}) AS BIGINT) AS n_nonnull,
       CAST(count(DISTINCT {c}) AS BIGINT) AS ndv,
       CAST(min({c}) AS VARCHAR) AS min_val,
       CAST(max({c}) AS VARCHAR) AS max_val
FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def ext_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN PROFILE — the ANALYZE TABLE statistics surface (row count,
    non-null count, NDV, min/max per column, values rendered as strings
    so one report covers mixed types): what a cost-based optimizer's
    catalog stores, what a data catalog displays, and the input to the
    selectivity math ``agg_histogram_equidepth`` refines.

    All five columns profile in ONE aggregate pass (count/ndv/min/max
    accumulators side by side — one scan, not five); NDV here is exact
    (count distinct via expand) — at 100 TB swap approx_count_distinct,
    the agg_approx_distinct path, same plan shape."""
    o = table(spark, sf_dir, "orders")
    one = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            x
            for c in _PROFILE_COLS
            for x in (
                F.count(c).cast("long").alias(f"nn_{c}"),
                F.countDistinct(c).cast("long").alias(f"ndv_{c}"),
                F.min(c).cast("string").alias(f"min_{c}"),
                F.max(c).cast("string").alias(f"max_{c}"),
            )
        ],
    )
    stack = "stack({}, {}) as (col, n_nonnull, ndv, min_val, max_val)".format(
        len(_PROFILE_COLS),
        ", ".join(
            f"'{c}', nn_{c}, ndv_{c}, min_{c}, max_{c}" for c in _PROFILE_COLS
        ),
    )
    return one.select("n_rows", F.expr(stack)).select(
        "col", "n_rows", "n_nonnull", "ndv", "min_val", "max_val"
    )


_L_DIVERSITY = 3


@register(
    "ext_l_diversity",
    oracle=f"""
WITH g AS (
  SELECT source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
         CAST(count(*) AS BIGINT) AS group_size,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(max(cnt) AS BIGINT) AS top_lang_n
  FROM (
    SELECT source, n_chars, lang,
           count(*) OVER (PARTITION BY source, n_chars // 100, lang) AS cnt
    FROM documents
  )
  GROUP BY 1, 2
)
SELECT source, len_bucket, group_size, n_langs,
       floor(CAST(top_lang_n AS DOUBLE) / group_size * 10000 + 0.5)
         / 10000.0 AS top_lang_share,
       n_langs < {_L_DIVERSITY} AS violates_l
FROM g
""",
)
def ext_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-DIVERSITY audit (Machanavajjhala 2006) — the k-anonymity
    follow-on: a quasi-identifier group can be large (k-anonymous) yet
    still leak its SENSITIVE attribute if nearly every member shares
    one value.  QI = (source, length bucket), sensitive = lang; each
    group reports its distinct-language count, the dominant language's
    share (the homogeneity-attack surface), and the l = {l} violation
    flag.  ``ext_k_anonymity`` says "is the group big enough?"; this
    says "is it MIXED enough?".

    Scale shape: one groupBy to the (QI, lang) grain, one rollup to the
    QI grain carrying max/1-distinct counts — both map-side combined;
    the window in the oracle is Spark-side a two-level aggregate (no
    per-row window at all).  Report is |QI-combination|-sized."""
    docs = table(spark, sf_dir, "documents")
    per_lang = docs.groupBy(
        "source",
        F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        "lang",
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    g = per_lang.groupBy("source", "len_bucket").agg(
        F.sum("cnt").cast("long").alias("group_size"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.max("cnt").cast("long").alias("top_lang_n"),
    )
    return g.select(
        "source",
        "len_bucket",
        "group_size",
        "n_langs",
        (
            F.floor(F.col("top_lang_n").cast("double") / F.col("group_size") * 10000 + 0.5)
            / 10000.0
        ).alias("top_lang_share"),
        (F.col("n_langs") < _L_DIVERSITY).alias("violates_l"),
    )


ext_l_diversity.__doc__ = ext_l_diversity.__doc__.format(l=_L_DIVERSITY)


_DP_EPSILON = 1.0  # Laplace privacy budget for the released histogram


@register(
    "agg_dp_histogram",
    oracle=f"""
WITH h AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
u AS (
  SELECT event_type, n,
         (CAST(('0x' || substr(md5(event_type), 1, 8)) AS BIGINT) % 1000000
          + 0.5) / 1000000.0 AS uni
  FROM h
)
SELECT event_type,
       floor((n - (CASE WHEN uni < 0.5 THEN -1.0 ELSE 1.0 END)
                  * ln(1.0 - 2.0 * abs(uni - 0.5)) / {_DP_EPSILON})
             * 10000 + 0.5) / 10000.0 AS noisy_n,
       CAST({_DP_EPSILON} AS DOUBLE) AS epsilon,
       TRUE AS deterministic_demo
FROM u
ORDER BY event_type
""",
)
def agg_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIALLY-PRIVATE histogram release of the event-type counts:
    Laplace mechanism (Dwork et al. 2006), sensitivity 1 (event-level
    neighboring datasets), epsilon = {eps} — the privacy-preserving
    publication shape for usage statistics over user data.

    The Laplace draw inverts the CDF at a uniform derived from the
    shared cross-engine md5 recipe (demo posture: a DETERMINISTIC
    keyed draw makes the release hash-verifiable across engines; a
    production release would use a CSPRNG — the mechanism, budget
    accounting, and release shape are what this op pins).  |u-0.5| >=
    5e-7 by construction (integer micro-grid + half-offset), so the ln
    argument never hits 0.  One map-side-combined count aggregate; the
    noise is a |types|-row projection."""
    ev = table(spark, sf_dir, "events")
    h = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    uni = (
        F.conv(F.substring(F.md5(F.col("event_type")), 1, 8), 16, 10).cast("long")
        % 1000000
        + 0.5
    ) / 1000000.0
    lap = (
        F.when(uni < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.log(1.0 - 2.0 * F.abs(uni - 0.5))
        / F.lit(_DP_EPSILON)
    )
    return h.select(
        "event_type",
        (F.floor((F.col("n") - lap) * 10000 + 0.5) / 10000.0).alias("noisy_n"),
        F.lit(float(_DP_EPSILON)).alias("epsilon"),
        # The caveat rides IN the release itself: this draw is a public
        # deterministic function of event_type (hash-verifiable demo), so
        # it provides zero actual privacy — any consumer can recompute and
        # subtract the noise.  A real release flips this to False and
        # draws from a CSPRNG (or a secret per-release seed).
        F.lit(True).alias("deterministic_demo"),
    ).orderBy("event_type")


agg_dp_histogram.__doc__ = agg_dp_histogram.__doc__.format(eps=_DP_EPSILON)


_BAL_BUCKET = 1000  # dollars per balance generalization bucket


@register(
    "fn_pseudonymize",
    oracle=f"""
WITH p AS (
  SELECT c_custkey,
         'user_' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS pseudonym,
         c_mktsegment AS segment,
         CAST(floor(c_acctbal / {_BAL_BUCKET}) AS BIGINT) * {_BAL_BUCKET}
           AS bal_bucket
  FROM customer
)
SELECT pseudonym, segment, bal_bucket,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM p LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY 1, 2, 3
ORDER BY pseudonym
""",
)
def fn_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSISTENT PSEUDONYMIZATION: names become stable md5-derived
    surrogates, balances generalize to ${b} buckets, and the surrogate
    still JOINS (order counts survive the masking) — the analytics-
    preserving de-identification that completes the privacy battery
    (``ext_pii_mask`` redacts free text, ``ext_k_anonymity``/
    ``ext_l_diversity`` audit the result, ``agg_dp_histogram`` releases
    aggregates; this is the record-level masking step itself).
    Same-input → same-surrogate is the whole point (longitudinal
    analysis works) and also its re-identification caveat — a keyed
    HMAC replaces the bare hash in production; the shape is what this
    op pins.

    One hash projection (the shared cross-engine md5 recipe), one
    key join to orders, one count aggregate."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    p = c.select(
        "c_custkey",
        F.concat(
            F.lit("user_"),
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8),
        ).alias("pseudonym"),
        F.col("c_mktsegment").alias("segment"),
        (F.floor(F.col("c_acctbal") / _BAL_BUCKET).cast("long") * _BAL_BUCKET).alias(
            "bal_bucket"
        ),
    )
    return (
        p.join(o, p.c_custkey == o.o_custkey, "left")
        .groupBy("pseudonym", "segment", "bal_bucket")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
        .orderBy("pseudonym")
    )


fn_pseudonymize.__doc__ = fn_pseudonymize.__doc__.format(b=_BAL_BUCKET)


_AES_KEY = "0123456789abcdef"  # fixture key; production uses a KMS secret


@register(
    "fn_aes_roundtrip",
    oracle="""
SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(length(c_name)) AS BIGINT) AS name_chars
FROM customer GROUP BY 1 ORDER BY 1
""",
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN-LEVEL ENCRYPTION round-trip (Spark ``aes_encrypt`` /
    ``aes_decrypt``): customer names encrypt at rest, decrypt on read,
    and the post-decrypt census must equal the plain-column oracle — a
    single flipped byte anywhere in the encrypt/serialize/decrypt chain
    changes name_chars and breaks the hash.  The application-layer
    crypto surface the pseudonymization/PII battery lacks: masking is
    one-way; encryption keeps reversibility for the key holder.

    ECB mode here because the fixture needs DETERMINISM for the oracle;
    the docstring carries the production caveat — GCM (random IV,
    authenticated) is the real mode, at the cost of value-level
    determinism (equal plaintexts leak equality under ECB).  Encrypt
    and decrypt are per-row JVM expressions; no UDF, no shuffle before
    the census."""
    c = table(spark, sf_dir, "customer")
    enc = c.select(
        "c_mktsegment",
        F.expr(f"aes_encrypt(c_name, '{_AES_KEY}', 'ECB')").alias("name_enc"),
    )
    dec = enc.select(
        "c_mktsegment",
        F.expr(f"CAST(aes_decrypt(name_enc, '{_AES_KEY}', 'ECB') AS STRING)").alias(
            "name"
        ),
    )
    return (
        dec.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.length("name")).cast("long").alias("name_chars"),
        )
        .orderBy("segment")
    )


_DPM_EPSILON = 1.0  # Laplace budget for the released mean
_DPM_LO, _DPM_HI = 0.0, 400.0  # public clipping bounds


@register(
    "agg_dp_mean",
    oracle=f"""
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         sum(least(greatest(CAST(value AS DOUBLE), {_DPM_LO}), {_DPM_HI}))
           AS s
  FROM events GROUP BY 1
),
u AS (
  SELECT event_type, n, s,
         (CAST(('0x' || substr(md5(event_type || ':sum'), 1, 8)) AS BIGINT)
          % 1000000 + 0.5) / 1000000.0 AS us,
         (CAST(('0x' || substr(md5(event_type || ':cnt'), 1, 8)) AS BIGINT)
          % 1000000 + 0.5) / 1000000.0 AS uc
  FROM g
),
noisy AS (
  SELECT event_type,
         s - (CASE WHEN us < 0.5 THEN -1.0 ELSE 1.0 END)
             * ln(1.0 - 2.0 * abs(us - 0.5))
             * ({_DPM_HI} - {_DPM_LO}) / ({_DPM_EPSILON} / 2) AS ns,
         n - (CASE WHEN uc < 0.5 THEN -1.0 ELSE 1.0 END)
             * ln(1.0 - 2.0 * abs(uc - 0.5)) / ({_DPM_EPSILON} / 2) AS nn
  FROM u
)
SELECT event_type,
       floor(ns / greatest(nn, 1.0) * 10000 + 0.5) / 10000.0 AS dp_mean,
       CAST({_DPM_EPSILON} AS DOUBLE) AS epsilon,
       TRUE AS deterministic_demo
FROM noisy
ORDER BY event_type
""",
)
def agg_dp_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIALLY-PRIVATE MEAN of the event values per type: the
    clip-then-noise mechanism (Dwork et al. 2006) — values clipped to
    the public bounds [{lo}, {hi}], Laplace noise on BOTH the clipped
    sum (sensitivity hi−lo, budget ε/2) and the count (sensitivity 1,
    budget ε/2), released as noisy_sum / max(noisy_n, 1) — the standard
    composition for a private average.

    Same demo posture as ``agg_dp_histogram`` (and the same honest
    label riding the output): the draws invert the Laplace CDF at
    md5-derived uniforms so the release hash-verifies across engines;
    ``deterministic_demo = TRUE`` tells every consumer this provides
    zero actual privacy — production swaps in a CSPRNG.  One map-side
    combined aggregate; noise is a |types|-row projection."""
    ev = table(spark, sf_dir, "events")
    clipped = F.least(
        F.greatest(F.col("value").cast("double"), F.lit(_DPM_LO)), F.lit(_DPM_HI)
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(clipped).alias("s"),
    )

    def uni(tag: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("event_type"), F.lit(":" + tag))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 1000000
            + 0.5
        ) / 1000000.0

    def lap(u, scale):
        return (
            F.when(u < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
            * F.log(1.0 - 2.0 * F.abs(u - 0.5))
            * scale
        )

    ns = F.col("s") - lap(uni("sum"), F.lit((_DPM_HI - _DPM_LO) / (_DPM_EPSILON / 2)))
    nn = F.col("n") - lap(uni("cnt"), F.lit(1.0 / (_DPM_EPSILON / 2)))
    return g.select(
        "event_type",
        (F.floor(ns / F.greatest(nn, F.lit(1.0)) * 10000 + 0.5) / 10000.0).alias(
            "dp_mean"
        ),
        F.lit(float(_DPM_EPSILON)).alias("epsilon"),
        F.lit(True).alias("deterministic_demo"),
    ).orderBy("event_type")


agg_dp_mean.__doc__ = agg_dp_mean.__doc__.format(lo=_DPM_LO, hi=_DPM_HI)


_T_CLOSE = 0.25  # max allowed EMD between group and global distributions


@register(
    "ext_t_closeness",
    oracle=f"""
WITH docs2 AS (
  SELECT source, lang, CAST(n_chars // 100 AS BIGINT) AS b FROM documents
),
buckets AS (SELECT DISTINCT b FROM docs2),
grp AS (SELECT DISTINCT source, lang FROM docs2),
cnt AS (
  SELECT source, lang, b, CAST(count(*) AS BIGINT) AS n_gb
  FROM docs2 GROUP BY 1, 2, 3
),
grid AS (
  SELECT g.source, g.lang, bk.b, coalesce(c.n_gb, 0) AS n_gb
  FROM grp g CROSS JOIN buckets bk
  LEFT JOIN cnt c ON c.source = g.source AND c.lang = g.lang AND c.b = bk.b
),
cum AS (
  SELECT source, lang, b,
         CAST(sum(n_gb) OVER (PARTITION BY source, lang ORDER BY b)
              AS BIGINT) AS cum_g,
         CAST(sum(n_gb) OVER (PARTITION BY source, lang) AS BIGINT) AS n_g
  FROM grid
),
gcum AS (
  SELECT b,
         CAST(sum(sum(n_gb)) OVER (ORDER BY b) AS BIGINT) AS cum_q,
         CAST(sum(sum(n_gb)) OVER () AS BIGINT) AS n_all
  FROM grid GROUP BY b
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM buckets),
emd AS (
  SELECT c.source, c.lang, max(c.n_g) AS n_g,
         sum(CASE WHEN c.b < (SELECT max(b) FROM buckets)
                  THEN abs(c.cum_g * g.n_all - g.cum_q * c.n_g) ELSE 0 END)
           AS num
  FROM cum c JOIN gcum g USING (b)
  GROUP BY 1, 2
)
SELECT e.source, e.lang, CAST(e.n_g AS BIGINT) AS group_size,
       floor(CAST(e.num AS DOUBLE)
             / (CAST(e.n_g AS DOUBLE) * g2.n_all * (m.m - 1))
             * 1000000 + 0.5) / 1000000.0 AS t_emd,
       CAST(e.num AS DOUBLE)
         / (CAST(e.n_g AS DOUBLE) * g2.n_all * (m.m - 1))
         > {_T_CLOSE} AS violates_t
FROM emd e CROSS JOIN (SELECT max(n_all) AS n_all FROM gcum) g2
CROSS JOIN m
ORDER BY e.source, e.lang
""",
)
def ext_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-CLOSENESS audit (Li et al. 2007) — the third rung of the
    release-privacy ladder after ``ext_k_anonymity`` (group size) and
    ``ext_l_diversity`` (sensitive-value variety): each quasi-identifier
    group's distribution over the ORDERED sensitive attribute (length
    bucket) must sit within t of the GLOBAL distribution in Earth
    Mover's Distance, else the group leaks (a group whose members are
    all long documents reveals "long" even at k-anonymous size).

    Ordered-attribute EMD with equal bucket distances is the normalized
    sum of |cumulative differences|; both cumulatives stay EXACT
    integers cross-multiplied (|Cum_g·N − Cum_Q·n_g|, < 2^63 up to
    n_g·N ~ 9e18 — beyond that swap the inner abs to doubles), divided
    once at the end.  Grain: |groups| × |buckets| dense grid, all
    bounded; windows partition by group."""
    docs = table(spark, sf_dir, "documents")
    d2 = docs.select(
        "source", "lang", (F.col("n_chars") / 100).cast("long").alias("b")
    )
    buckets = d2.select("b").distinct()
    grp = d2.select("source", "lang").distinct()
    cnt = d2.groupBy("source", "lang", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_gb")
    )
    grid = (
        grp.crossJoin(F.broadcast(buckets))
        .join(cnt, ["source", "lang", "b"], "left")
        .select(
            "source", "lang", "b", F.coalesce("n_gb", F.lit(0)).alias("n_gb")
        )
    )
    from pyspark.sql import Window as W

    wg = W.partitionBy("source", "lang").orderBy("b")
    cum = grid.select(
        "source",
        "lang",
        "b",
        F.sum("n_gb").over(
            wg.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("long").alias("cum_g"),
        F.sum("n_gb").over(W.partitionBy("source", "lang")).cast("long").alias("n_g"),
    )
    gb = grid.groupBy("b").agg(F.sum("n_gb").cast("long").alias("n_b"))
    # |buckets|-row frame: the bounded case where an unpartitioned window
    # is correct by construction.
    wq = W.orderBy("b")
    gcum = gb.select(
        "b",
        F.sum("n_b").over(
            wq.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("long").alias("cum_q"),
        F.sum("n_b").over(
            wq.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).cast("long").alias("n_all"),
    )
    bmax = buckets.agg(
        F.max("b").alias("b_max"), F.count(F.lit(1)).cast("long").alias("m")
    )
    emd = (
        cum.join(F.broadcast(gcum), "b")
        .crossJoin(F.broadcast(bmax))
        .groupBy("source", "lang")
        .agg(
            F.max("n_g").cast("long").alias("group_size"),
            F.sum(
                F.when(
                    F.col("b") < F.col("b_max"),
                    F.abs(
                        F.col("cum_g") * F.col("n_all")
                        - F.col("cum_q") * F.col("n_g")
                    ),
                ).otherwise(F.lit(0))
            ).cast("long").alias("num"),
            F.max("n_all").cast("long").alias("n_all"),
            F.max("m").cast("long").alias("m"),
        )
    )
    t = F.col("num").cast("double") / (
        F.col("group_size").cast("double") * F.col("n_all") * (F.col("m") - 1)
    )
    return emd.select(
        "source",
        "lang",
        "group_size",
        (F.floor(t * 1000000 + 0.5) / 1000000.0).alias("t_emd"),
        (t > F.lit(_T_CLOSE)).alias("violates_t"),
    ).orderBy("source", "lang")


def _ig_feature(src: DataFrame, name: str, vcol, out_label) -> DataFrame:
    """One information-gain row: H(label) - Σ_v p(v)·H(label|v) with every
    entropy term folded sequentially over the VALUE-SORTED bounded value
    frame (the agg_anova_f fold recipe) from exact integer counts."""
    cells = src.groupBy(vcol.alias("v")).agg(
        F.sum(F.when(out_label, 1).otherwise(0)).cast("long").alias("pos"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )

    def h2(p_num, n_tot):
        p = p_num.cast("double") / n_tot
        return F.when(p > 0, -p * F.log(p)).otherwise(F.lit(0.0))

    term = (F.col("nv").cast("double") / F.col("n")) * (
        h2(F.col("pos"), F.col("nv")) + h2(F.col("nv") - F.col("pos"), F.col("nv"))
    )
    tot = cells.agg(
        F.sum("nv").cast("long").alias("n"), F.sum("pos").cast("long").alias("p")
    )
    t = cells.crossJoin(F.broadcast(tot)).select(
        "v", "n", "p", term.alias("term")
    )
    agg = t.groupBy("n", "p").agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("v"), F.col("term")))),
                lambda s: s.getField("term"),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("h_cond"),
    )
    hy = h2(F.col("p"), F.col("n")) + h2(F.col("n") - F.col("p"), F.col("n"))
    return agg.select(
        F.lit(name).alias("feature"),
        "n_values",
        (F.floor(hy * 1000000 + 0.5) / 1000000.0).alias("h_label"),
        (F.floor((hy - F.col("h_cond")) * 1000000 + 0.5) / 1000000.0).alias(
            "info_gain"
        ),
    )


_IG_ORACLE_ONE = """
  SELECT '{name}' AS feature, v, CAST(count(*) AS BIGINT) AS nv,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM (SELECT {expr} AS v, o_orderstatus FROM orders) GROUP BY 2
"""


@register(
    "ext_feature_info_gain",
    oracle=f"""
WITH cells AS (
  {_IG_ORACLE_ONE.format(name="priority", expr="o_orderpriority")}
  UNION ALL
  {_IG_ORACLE_ONE.format(name="order_month", expr="CAST(month(o_orderdate) AS BIGINT)")}
  UNION ALL
  {_IG_ORACLE_ONE.format(name="cust_bucket", expr="o_custkey % 10")}
), tot AS (
  SELECT feature, CAST(sum(nv) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
  FROM cells GROUP BY 1
), t AS (
  SELECT c.feature, c.v,
         (CAST(c.nv AS DOUBLE) / t.n) * (
           (CASE WHEN CAST(c.pos AS DOUBLE) / c.nv > 0
                 THEN -(CAST(c.pos AS DOUBLE) / c.nv) * ln(CAST(c.pos AS DOUBLE) / c.nv)
                 ELSE 0.0 END)
           + (CASE WHEN CAST(c.nv - c.pos AS DOUBLE) / c.nv > 0
                   THEN -(CAST(c.nv - c.pos AS DOUBLE) / c.nv)
                        * ln(CAST(c.nv - c.pos AS DOUBLE) / c.nv)
                   ELSE 0.0 END)) AS term,
         t.n, t.p
  FROM cells c JOIN tot t ON c.feature = t.feature
), agg AS (
  SELECT feature, n, p, CAST(count(*) AS BIGINT) AS n_values,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(term ORDER BY v)),
                     (a, x) -> a + x) AS h_cond
  FROM t GROUP BY 1, 2, 3
)
SELECT feature, n_values,
       floor(((CASE WHEN CAST(p AS DOUBLE) / n > 0
               THEN -(CAST(p AS DOUBLE) / n) * ln(CAST(p AS DOUBLE) / n) ELSE 0.0 END)
              + (CASE WHEN CAST(n - p AS DOUBLE) / n > 0
                 THEN -(CAST(n - p AS DOUBLE) / n) * ln(CAST(n - p AS DOUBLE) / n)
                 ELSE 0.0 END)) * 1000000 + 0.5) / 1000000.0 AS h_label,
       floor(((CASE WHEN CAST(p AS DOUBLE) / n > 0
               THEN -(CAST(p AS DOUBLE) / n) * ln(CAST(p AS DOUBLE) / n) ELSE 0.0 END)
              + (CASE WHEN CAST(n - p AS DOUBLE) / n > 0
                 THEN -(CAST(n - p AS DOUBLE) / n) * ln(CAST(n - p AS DOUBLE) / n)
                 ELSE 0.0 END)
              - h_cond) * 1000000 + 0.5) / 1000000.0 AS info_gain
FROM agg ORDER BY feature
""",
)
def ext_feature_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INFORMATION GAIN of three categorical features (order priority,
    order month, customer bucket) against the fully-shipped label —
    decision-stump feature ranking, the supervised cousin of
    ``agg_mutual_information`` (same H(y) − H(y|f) quantity, framed as
    a per-feature scoring sweep the way feature-selection passes and
    data-card label-leakage audits run it; a feature whose IG ≈ H(y)
    IS the label leaking through a column).

    Exactness: all cell/marginal counts are exact int64; each feature's
    Σ_v p(v)H(y|v) folds sequentially over the value-sorted bounded
    value frame (native value type preserves the sort order DuckDB
    uses), the two binary-entropy terms are a fixed-order expression,
    and IG is closed-form from there — full value oracle despite the
    ln()s.

    Scale shape: one map-side-combined groupBy per feature to its
    bounded value grain (5/12/10 values), 1-row totals broadcast back,
    |values|-row folds.  A v-column pivot would do it in one scan;
    three scans keep each feature's plan independently prunable."""
    o = table(spark, sf_dir, "orders")
    lbl = F.col("o_orderstatus") == "F"
    parts = [
        _ig_feature(o, "priority", F.col("o_orderpriority"), lbl),
        _ig_feature(o, "order_month", F.month("o_orderdate").cast("long"), lbl),
        _ig_feature(o, "cust_bucket", F.col("o_custkey") % 10, lbl),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("feature")
