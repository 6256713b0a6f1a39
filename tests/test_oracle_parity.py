"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's sf0.01 gate (same comparison, smaller data for
speed); queries without an oracle are smoke-run for rows>=0 and a stable
schema.
"""

from __future__ import annotations

import pytest

from satellite_data_ingestion_spark import registry
from tests.conftest import SF_SMOKE
from tests.oracle import compare

registry.load_all()
ALL = sorted(registry.queries())

# Oracles that read raw FILES (not the registered views) embed the driver's
# sf0.01 directory literally; compare those at sf0.01 like the driver does.
_DRIVER_SF_ONLY = {"scan_binary", "scan_parquet_metadata"}


@pytest.mark.parametrize("name", ALL)
def test_query(name, spark, duck):
    spec = registry.spec(name)
    if name in _DRIVER_SF_ONLY:
        from tests.conftest import SF_ORACLE
        from tests.oracle import duck_con

        con = duck_con(SF_ORACLE)
        try:
            errs = compare(spec.fn(spark, SF_ORACLE), con, spec.oracle)
        finally:
            con.close()
        assert not errs, f"{name}: " + "; ".join(errs[:10])
        return
    df = spec.fn(spark, SF_SMOKE)
    if spec.oracle is None:
        from tests.oracle import _check_spark_types

        # Rows-only queries still pass through the driver's pandas
        # canonicalizer in its rows check — non-scalar columns crash it
        # (the round-10 ERR class), so they are banned everywhere.
        errs = _check_spark_types(df)
        assert not errs, f"{name}: " + "; ".join(errs)
        rows = df.collect()
        assert rows is not None
        assert len(df.columns) > 0
    else:
        errs = compare(df, duck, spec.oracle)
        assert not errs, f"{name}: " + "; ".join(errs[:10])


def test_compare_rejects_non_spark_types(duck):
    """An un-cast DuckDB integer SUM is HUGEINT — no Spark equivalent, and the
    driver's type-sensitive value hash would mismatch even on identical values.
    compare() must flag it before any value comparison (r03 verdict item 2)."""
    from tests.oracle import _check_duck_types

    errs = _check_duck_types(duck, "SELECT sum(CAST(l_quantity AS BIGINT)) AS s FROM lineitem")
    assert errs and "HUGEINT" in errs[0]
    assert not _check_duck_types(
        duck, "SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s FROM lineitem"
    )


def test_compare_rejects_non_scalar_spark_columns(spark):
    """The driver's _canon does a pandas sort_values over every output
    column; an array cell arrives as an ndarray, which is unhashable, and
    the whole query records ERR (seen twice in round 10:
    ext_embedding_quantize / ext_multimodal_resize).  compare() must flag
    any ArrayType/MapType/StructType column before values are compared."""
    import pyspark.sql.functions as F

    from tests.oracle import _check_spark_types

    bad = spark.range(3).select(F.array(F.col("id")).alias("a"))
    errs = _check_spark_types(bad)
    assert errs and "non-scalar" in errs[0]
    good = bad.select(
        F.array_join(F.transform("a", lambda x: x.cast("string")), ",").alias("a")
    )
    assert not _check_spark_types(good)


def test_compare_rejects_cross_dtype_class(spark, duck):
    """Spark BIGINT vs DuckDB DOUBLE hash-mismatches in the driver even on
    identical values (r11's ext_kmv_intersection: bare floor() is DOUBLE in
    DuckDB, BIGINT via F.floor), but compare()'s 1e-9 float coercion used to
    hide it.  The dtype-class guard must flag integral-vs-floating column
    pairs in BOTH directions before any value comparison."""
    import pyspark.sql.functions as F

    from tests.oracle import _check_dtype_class

    spark_int = spark.range(3).select(F.floor(F.col("id") + 0.5).alias("v"))
    errs = _check_dtype_class(spark_int, duck, "SELECT floor(1 + 0.5e0) AS v")
    assert errs and "dtype class" in errs[0]
    assert not _check_dtype_class(
        spark_int, duck, "SELECT CAST(floor(1 + 0.5) AS BIGINT) AS v"
    )
    spark_float = spark.range(3).select((F.col("id") + 0.5).alias("v"))
    errs = _check_dtype_class(spark_float, duck, "SELECT CAST(1 AS BIGINT) AS v")
    assert errs and "dtype class" in errs[0]
    assert not _check_dtype_class(spark_float, duck, "SELECT CAST(1.5 AS DOUBLE) AS v")


def test_recursive_cte_lcs_oracle_property():
    """The ext_rouge_l ORACLE's novel recursive-CTE LCS (prefix-max row
    identity) is itself verified here against the textbook two-loop DP
    on random token pairs — oracle-correctness, independent of the
    corpus (a wrong oracle that happened to agree on the fixture would
    otherwise pin a wrong engine forever)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = st.sampled_from(["a", "b", "c", "d"])
    lists = st.lists(tok, min_size=1, max_size=12)

    def lcs_ref(a, b):
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = (
                    dp[i - 1][j - 1] + 1
                    if a[i - 1] == b[j - 1]
                    else max(dp[i - 1][j], dp[i][j - 1])
                )
        return dp[len(a)][len(b)]

    con = duckdb.connect()

    @settings(max_examples=40, deadline=None)
    @given(lists, lists)
    def check(a, b):
        got = con.execute(
            """
WITH RECURSIVE dp AS (
  SELECT 0 AS i, $a::VARCHAR[] AS ct, $b::VARCHAR[] AS rt,
         len($b::VARCHAR[]) AS n,
         list_transform(generate_series(0, len($b::VARCHAR[])), x -> 0) AS row
  UNION ALL
  SELECT i + 1, ct, rt, n,
         list_transform(generate_series(0, n), j ->
           CASE WHEN j = 0 THEN 0 ELSE
             greatest(row[j + 1],
               list_max(list_transform(generate_series(1, j), k ->
                 row[k] + CASE WHEN ct[i + 1] = rt[k] THEN 1 ELSE 0 END)))
           END)
  FROM dp WHERE i < len(ct)
)
SELECT row[n + 1] FROM dp WHERE i = len(ct)
""",
            {"a": a, "b": b},
        ).fetchone()[0]
        assert got == lcs_ref(a, b), (a, b, got)

    check()


def test_recursive_cte_dtw_oracle_property():
    """The ext_ts_dtw ORACLE's list_reduce row fold is verified against
    the textbook nested-loop DTW on random integer series — same
    oracle-correctness rationale as the LCS property test."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    series = st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=10)

    def dtw_ref(q, s):
        INF = float("inf")
        prev = [INF] * (len(s) + 1)
        prev[0] = 0.0
        for i in range(1, len(q) + 1):
            cur = [INF] * (len(s) + 1)
            for j in range(1, len(s) + 1):
                cur[j] = abs(q[i - 1] - s[j - 1]) + min(
                    prev[j], prev[j - 1], cur[j - 1]
                )
            prev = cur
        return prev[len(s)]

    con = duckdb.connect()

    @settings(max_examples=40, deadline=None)
    @given(series, series)
    def check(q, s):
        got = con.execute(
            """
WITH RECURSIVE dp AS (
  SELECT 0 AS i, $q::BIGINT[] AS qv, $s::BIGINT[] AS sv,
         len($s::BIGINT[]) AS n,
         list_concat([CAST(0 AS DOUBLE)],
                     list_transform(generate_series(1, len($s::BIGINT[])), x -> 1e18)) AS row
  UNION ALL
  SELECT i + 1, qv, sv, n,
         list_reduce(
           list_concat([[CAST(1e18 AS DOUBLE)]],
                       list_transform(generate_series(1, n), j -> [CAST(j AS DOUBLE)])),
           (acc, x) -> list_append(acc,
             abs(CAST(qv[i + 1] AS DOUBLE) - sv[CAST(x[1] AS INT)])
             + least(row[CAST(x[1] AS INT) + 1], row[CAST(x[1] AS INT)], acc[len(acc)])))
  FROM dp WHERE i < len(qv)
)
SELECT row[n + 1] FROM dp WHERE i = len(qv)
""",
            {"q": q, "s": s},
        ).fetchone()[0]
        assert got == dtw_ref(q, s), (q, s, got)

    check()


def test_recursive_cte_bpe_training_oracle_property():
    """The learned-BPE ORACLE's training recursion (_bpe_learn_sql) must
    reproduce learn_merges on RANDOM small corpora, not just the fixture
    — same oracle-correctness rationale as the LCS/DTW property tests:
    the candidate counting, TAB-serialized tie-break, and list_reduce
    word rewrites are each easy to get subtly wrong."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from satellite_data_ingestion_spark.llm.bpe import _bpe_learn_sql, learn_merges

    word = st.text(alphabet="abc", min_size=1, max_size=5)
    corpus = st.lists(word, min_size=1, max_size=8)

    sql = _bpe_learn_sql() + """
SELECT string_split(pair, chr(9))[1] AS l, string_split(pair, chr(9))[2] AS r
FROM (SELECT unnest(merges) AS pair, generate_subscripts(merges, 1) AS i
      FROM mtab)
ORDER BY i
"""

    @settings(max_examples=25, deadline=None)
    @given(corpus)
    def check(words):
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, lang VARCHAR, text VARCHAR)")
        for i, w in enumerate(words):
            con.execute("INSERT INTO documents VALUES (?, 'en', ?)", [i, w])
        got = [(l, r) for l, r in con.execute(sql).fetchall()]
        hist: dict = {}
        for w in words:
            hist[w] = hist.get(w, 0) + 1
        ref = learn_merges(sorted(hist.items(), key=lambda kv: (-kv[1], kv[0])))
        con.close()
        assert got == list(ref), (words, got, ref)

    check()


def test_recursive_cte_unigram_training_oracle_property():
    """The unigram-LM ORACLE's training recursion (_unigram_learn_sql)
    must reproduce train_unigram on RANDOM small corpora — the flat
    single-fold Viterbi (absolute accumulator indices, base markers,
    loses-everything sentinel instead of NULL), the stage machine, and
    the pid-list lexicographic tie-break are each easy to get subtly
    wrong, and the DuckDB 1.0.0 lambda-vectorizer hazards this oracle
    routes around only show up on shapes minimal repros miss."""
    import math

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from satellite_data_ingestion_spark.llm.unigram import (
        _UNIGRAM_TRAIN_TAIL,
        _unigram_learn_sql,
        train_unigram,
    )

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    corpus = st.lists(word, min_size=1, max_size=14)
    sql = _unigram_learn_sql() + _UNIGRAM_TRAIN_TAIL

    @settings(max_examples=20, deadline=None)
    @given(corpus)
    def check(words):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, lang VARCHAR, text VARCHAR)"
        )
        for i, w in enumerate(words):
            con.execute("INSERT INTO documents VALUES (?, 'en', ?)", [i, w])
        got = con.execute(sql).fetchall()
        hist: dict = {}
        for w in words:
            hist[w] = hist.get(w, 0) + 1
        ref = train_unigram(sorted(hist.items(), key=lambda kv: (-kv[1], kv[0])))
        want = [
            (rank, p, math.floor(lp * 1e10 + 0.5) / 1e10, len(p) == 1)
            for rank, (p, lp) in enumerate(ref)
        ]
        con.close()
        assert got == want, (words, got[:5], want[:5])

    check()
    # one fixed corpus big enough to force PRUNE rounds (vocab 64 needs
    # > 64-|chars| multi-char seed pieces), so the 100-stage branch and
    # the keep_n arithmetic are exercised deterministically, not only
    # when hypothesis happens to draw a dense corpus
    words = [a + b + c + a + b for a in "abcd" for b in "efg" for c in "hij"]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    for i, w in enumerate(words):
        con.execute("INSERT INTO documents VALUES (?, 'en', ?)", [i, w])
    got = con.execute(sql).fetchall()
    ref = train_unigram(sorted({w: words.count(w) for w in words}.items(),
                               key=lambda kv: (-kv[1], kv[0])))
    want = [
        (rank, p, math.floor(lp * 1e10 + 0.5) / 1e10, len(p) == 1)
        for rank, (p, lp) in enumerate(ref)
    ]
    con.close()
    assert got == want


def test_pav_minimax_equivalence_property():
    """The ext_isotonic_calibration verification rests on the PAV
    minimax theorem: the stack PAV (Spark side) and the closed-form
    max-min over prefix sums (oracle side) are the same function.
    Property-test that claim directly on random weighted bins — both
    implemented here in pure Python, independent of either engine."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    bins = st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 50)).map(
            lambda t: (t[0], min(t[1], t[0]))  # pos <= n
        ),
        min_size=1,
        max_size=12,
    )

    @given(bins)
    @settings(max_examples=200, deadline=None)
    def check(bs):
        ns = [b[0] for b in bs]
        ps = [b[1] for b in bs]
        # stack PAV (the Spark implementation's algorithm)
        stack = []
        for w, p in zip(ns, ps):
            w, p, c = float(w), float(p), 1
            while stack and stack[-1][1] * w > p * stack[-1][0]:
                pw, pp, pc = stack.pop()
                w += pw
                p += pp
                c += pc
            stack.append([w, p, c])
        pav = []
        for w, p, c in stack:
            pav.extend([p / w] * int(c))
        # minimax closed form (the oracle's algebra)
        B = len(bs)
        for j in range(B):
            iso = max(
                min(
                    sum(ps[i : k + 1]) / sum(ns[i : k + 1])
                    for k in range(j, B)
                )
                for i in range(j + 1)
            )
            assert pav[j] == iso, (bs, j, pav[j], iso)
        # monotone and mass-preserving
        assert all(a <= b + 1e-15 for a, b in zip(pav, pav[1:]))
        assert abs(sum(n * r for n, r in zip(ns, pav)) - sum(ps)) < 1e-9

    check()
