"""Item-item collaborative filtering over order baskets — the classic
"customers who bought X also bought Y" recommender primitive
(Sarwar et al. 2001, Linden et al. 2003 item-to-item CF).

Relational shape, the co-occurrence discipline this repo uses everywhere
(ext_pmi_cooccurrence, ext_audience_overlap): pair volume is bounded by
Σ items-per-basket² (TPC-H baskets hold ≤ 13 distinct parts), NEVER
|items|² — the self-join runs keyed on the basket id, so a 100 TB order
history shuffles basket-local pairs only.  Marginals join WITHOUT a
broadcast hint (the per-item frame is |items|-sized, key-proportional;
AQE broadcasts it when it measures small).

Float discipline: cosine = n_both / sqrt(n_a · n_b) — the integer product
is exact below 2^53 and IEEE-754 sqrt is CORRECTLY ROUNDED, so both
engines produce the identical double; one half-up micro quantization
makes the hash-compare exact.

Reference analog: none (satellite ETL has no recommender surface);
[EXT] mandate territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_CF_TOP_K = 3  # recommendations reported per item
_CF_MIN_BOTH = 2  # support floor: a single shared basket is noise


@register(
    "ext_item_cf",
    oracle=f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), m AS (
  SELECT p, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1
), pairs AS (
  SELECT a.p AS pa, c.p AS pb, CAST(count(*) AS BIGINT) AS n_both
  FROM b a JOIN b c ON a.o = c.o
  WHERE a.p < c.p
  GROUP BY 1, 2
  HAVING count(*) >= {_CF_MIN_BOTH}
), sym AS (
  SELECT pa AS item, pb AS rec, n_both FROM pairs
  UNION ALL
  SELECT pb AS item, pa AS rec, n_both FROM pairs
), scored AS (
  SELECT item, rec, n_both,
         floor(CAST(n_both AS DOUBLE)
               / sqrt(CAST(ma.n * mb.n AS DOUBLE)) * 1000000 + 0.5)
           / 1000000.0 AS cosine
  FROM sym
  JOIN m ma ON ma.p = sym.item
  JOIN m mb ON mb.p = sym.rec
)
SELECT item, rec, n_both, cosine
FROM (SELECT *, row_number() OVER (PARTITION BY item
                                   ORDER BY cosine DESC, rec) AS rk
      FROM scored)
WHERE rk <= {_CF_TOP_K}
ORDER BY item, cosine DESC, rec
""",
)
def ext_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITEM-ITEM CF: top-{k} "also bought" recommendations per part by
    basket-cosine similarity n_ab / sqrt(n_a·n_b), support floor
    {f} shared baskets.  Pair generation is basket-keyed (volume
    Σ basket², never |items|²); the rank<={k} predicate plans as
    WindowGroupLimit on both sides of the item exchange."""
    li = table(spark, sf_dir, "lineitem")
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    m = b.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = b.select("o", F.col("p").alias("pa"))
    c = b.select("o", F.col("p").alias("pb"))
    pairs = (
        a.join(c, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= _CF_MIN_BOTH)
    )
    sym = pairs.select(
        F.col("pa").alias("item"), F.col("pb").alias("rec"), "n_both"
    ).unionAll(
        pairs.select(F.col("pb").alias("item"), F.col("pa").alias("rec"), "n_both")
    )
    ma = m.select(F.col("p").alias("item"), F.col("n").alias("na"))
    mb = m.select(F.col("p").alias("rec"), F.col("n").alias("nb"))
    scored = (
        sym.join(ma, "item")
        .join(mb, "rec")
        .select(
            "item",
            "rec",
            "n_both",
            (
                F.floor(
                    F.col("n_both").cast("double")
                    / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
                    * 1000000
                    + 0.5
                )
                / 1000000.0
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), "rec")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CF_TOP_K)
        .select("item", "rec", "n_both", "cosine")
        .orderBy("item", F.desc("cosine"), "rec")
    )


ext_item_cf.__doc__ = ext_item_cf.__doc__.format(k=_CF_TOP_K, f=_CF_MIN_BOTH)
