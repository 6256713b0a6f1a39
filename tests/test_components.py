"""Unit tests for engine components on constructed inputs — the edge cases
the corpus queries don't reach (empty payloads, tie timestamps, determinism
of hash signatures, atomic-commit crash shape)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from satellite_data_ingestion_spark.llm.dedup import minhash_signatures
from satellite_data_ingestion_spark.llm.multimodal import (
    decode_fake,
    decode_image_real,
    decoded_features,
)
from satellite_data_ingestion_spark.llm.simsearch import cosine, lsh_bucket, _hyperplanes
from satellite_data_ingestion_spark.streaming.state import atomic_write_json


def test_atomic_write_json_overwrites_atomically(tmp_path):
    dest = str(tmp_path / "state.json")
    atomic_write_json({"slot": 1}, dest)
    atomic_write_json({"slot": 2}, dest)
    with open(dest) as f:
        assert json.load(f) == {"slot": 2}
    # no stray temp files left behind
    assert os.listdir(tmp_path) == ["state.json"]


def test_decode_fake_empty_payload():
    feats = decode_fake(b"")
    assert feats["n_bytes"] == 0 and feats["first_byte"] is None


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_decoded_features_handles_empty_and_unicode(spark):
    df = spark.createDataFrame(
        [(1, b""), (2, "café".encode()), (3, b"abc")],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decoded_features(df).collect()}
    assert rows[1].n_bytes == 0 and rows[1].first_byte is None
    assert rows[2].n_bytes == 5  # é is 2 bytes in utf-8
    assert rows[3].first_byte == ord("a")


def test_minhash_signature_deterministic(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, toks=["a", "b", "c"]), Row(doc_id=2, toks=["a", "b", "c"])]
    )
    sigs = [r.sig for r in minhash_signatures(df).orderBy("doc_id").collect()]
    assert sigs[0] == sigs[1]  # identical token sets → identical signature
    assert len(sigs[0]) == 16


def test_minhash_signature_changes_with_content(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, toks=["a", "b"]), Row(doc_id=2, toks=["x", "y"])]
    )
    sigs = [r.sig for r in minhash_signatures(df).orderBy("doc_id").collect()]
    assert sigs[0] != sigs[1]


def test_cosine_known_vectors(spark):
    df = spark.createDataFrame(
        [Row(a=[1.0, 0.0], b=[1.0, 0.0]), Row(a=[1.0, 0.0], b=[0.0, 1.0])]
    )
    out = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert out[0].c == pytest.approx(1.0)
    assert out[1].c == pytest.approx(0.0)


def test_lsh_bucket_range_and_determinism(spark):
    planes = _hyperplanes(dim=4)
    df = spark.createDataFrame(
        [Row(v=[0.1, -0.2, 0.3, 0.4]), Row(v=[0.1, -0.2, 0.3, 0.4]), Row(v=[-1.0, 2.0, -3.0, 4.0])]
    )
    buckets = [r.b for r in df.select(lsh_bucket(F.col("v"), planes).alias("b")).collect()]
    assert buckets[0] == buckets[1]  # deterministic
    assert all(0 <= b < 256 for b in buckets)


def test_asof_tie_purchase_at_same_ts_matches(spark):
    """A purchase at exactly the error's timestamp must be matched (<=)."""
    from satellite_data_ingestion_spark.operators import joins  # noqa: F401
    import datetime

    t = datetime.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, t, 7, "purchase", 1.0, "{}"),
            (2, t, 7, "error", 1.0, "{}"),
            (3, t - datetime.timedelta(hours=1), 8, "error", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    # exercise the same union+window logic on a constructed frame
    from pyspark.sql import Window

    u = df.filter(F.col("event_type").isin("purchase", "error")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias("purchase_id"),
        F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = {
        r.event_id: r.matched_purchase
        for r in u.withColumn(
            "matched_purchase", F.last("purchase_id", ignorenulls=True).over(w)
        )
        .filter(F.col("side") == 1)
        .collect()
    }
    assert out[2] == 1  # same-ts purchase matched
    assert out[3] is None  # user with no purchase → null


def test_slot_reader_pushdown_prunes_partitions():
    """pushFilters must tighten the generated range: filtered slots are
    never materialized, and unsupported filters are handed back."""
    from pyspark.sql.datasource import GreaterThanOrEqual, IsNotNull, LessThan

    from satellite_data_ingestion_spark.sources.python_source import (
        SlotTimelineReader,
    )

    opts = {"start_epoch": "0", "end_epoch": "9000", "n_partitions": "4"}
    full = SlotTimelineReader(opts)
    n_full = sum(
        len(list(full.read(p))) for p in full.partitions()
    )
    assert n_full == 11  # slots 0..9000 step 900 inclusive

    pushed = SlotTimelineReader(opts)
    leftover = list(
        pushed.pushFilters(
            [
                GreaterThanOrEqual(("slot_epoch",), 3600),
                LessThan(("slot_epoch",), 8100),
                IsNotNull(("slot_epoch",)),  # unsupported → returned
            ]
        )
    )
    assert len(leftover) == 1 and isinstance(leftover[0], IsNotNull)
    rows = [r for p in pushed.partitions() for r in pushed.read(p)]
    assert [r[0] for r in rows] == [3600, 4500, 5400, 6300, 7200]
    # slot_idx stays anchored to the ORIGINAL start, not the tightened one
    assert [r[1] for r in rows] == [4, 5, 6, 7, 8]


def test_slot_reader_pushdown_non_aligned_literals():
    """Absorbed filters are never re-applied by Spark, so a literal that
    is NOT on the slot grid must round to the exact surviving slot set:
    >= rounds up, < keeps the largest strictly-below slot, = off the grid
    matches nothing.  (A floor on a >= bound once admitted one slot BELOW
    the predicate.)"""
    import operator

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    from satellite_data_ingestion_spark.sources.python_source import (
        SlotTimelineReader,
    )

    opts = {"start_epoch": "0", "end_epoch": "9000", "n_partitions": "4"}
    all_slots = list(range(0, 9001, 900))
    cases = [
        (GreaterThanOrEqual, operator.ge, 3601),   # just above a slot
        (GreaterThanOrEqual, operator.ge, 3599),   # just below a slot
        (GreaterThan, operator.gt, 3600),          # aligned, strict
        (GreaterThan, operator.gt, 3599),
        (LessThanOrEqual, operator.le, 8099),
        (LessThan, operator.lt, 8100),             # aligned, strict
        (LessThan, operator.lt, 8101),
        (EqualTo, operator.eq, 4500),              # aligned → one slot
        (EqualTo, operator.eq, 4501),              # off-grid → no slot
    ]
    for fcls, op, lit in cases:
        rdr = SlotTimelineReader(opts)
        leftover = list(rdr.pushFilters([fcls(("slot_epoch",), lit)]))
        assert leftover == []
        got = sorted(r[0] for p in rdr.partitions() for r in rdr.read(p))
        want = [s for s in all_slots if op(s, lit)]
        assert got == want, f"{fcls.__name__}({lit}): got {got} want {want}"


def test_minhash_recall_against_ground_truth(spark, duck):
    """LSH + verification must find ~all true near-dup pairs (>=0.95
    recall vs exact all-pairs Jaccard).  Guards the hot-bucket path: a
    cap that silently DROPS large duplicate clusters once collapsed
    recall to 4% while every other check stayed green."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_SMOKE

    truth = duck.execute(
        """
        WITH d AS (SELECT doc_id, list_distinct(str_split(text,' ')) toks
                   FROM documents)
        SELECT count(*) FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9
        """
    ).fetchone()[0]
    found = registry.spec("ext_dedup_minhash").fn(spark, SF_SMOKE).count()
    assert truth > 0, "corpus should contain near-dup pairs"
    assert found / truth >= 0.95, f"recall {found}/{truth} too low"


def test_ann_recall_vs_brute_force(spark):
    """Approximate NN must overlap the exact top-10 meaningfully; recall
    tracks the probed fraction on this weakly-clustered corpus (measured:
    IVF 0.9 at 128 lists / 32 probed, ~26% of rows).  The threshold sits
    below measurement noise but far above the broken-probe regime."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_SMOKE

    exact = {r.vec_id for r in registry.spec("ext_sim_cosine").fn(spark, SF_SMOKE).collect()}
    ivf = {r.vec_id for r in registry.spec("ext_sim_ivf").fn(spark, SF_SMOKE).collect()}
    assert len(exact & ivf) / 10 >= 0.6, f"IVF recall collapsed: {len(exact & ivf)}/10"


def test_ivf_pq_recall_and_refine_budget(spark):
    """The IVF-PQ contract at sf0.01: recall@10 >= 0.8 against the
    brute-force top-10 (measured 0.9/1.0/1.0 at sf0.001/0.01/0.1 with
    M=16 x KS=32 codes, nprobe 48, refine 20x) while raw vectors are
    re-read only for the constant REFINE*k ADC survivors — the refine
    set must stay exactly at that cap, independent of corpus size."""
    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.llm import simsearch
    from tests.conftest import SF_ORACLE

    exact = {r.vec_id for r in registry.spec("ext_sim_cosine").fn(spark, SF_ORACLE).collect()}
    pq = {r.vec_id for r in registry.spec("ext_sim_ivf_pq").fn(spark, SF_ORACLE).collect()}
    recall = len(exact & pq) / 10
    assert recall >= 0.8, f"IVF-PQ recall@10 {recall:.2f} below contract"
    # the refine budget is a constant, not a corpus fraction
    assert simsearch._PQ_REFINE * simsearch._TOP_K == 200


def test_lsh_recall_and_probe_budget(spark):
    """The multi-table LSH contract at sf0.01: recall@10 >= 0.8 against
    the brute-force top-10 while the candidate filter probes <= 20% of
    the corpus (round-6 64x28/h<=6 point: recall 0.9 / probe 18.2% at
    sf0.01, and >= 0.9 at every SF — thresholds leave margin for corpus
    regeneration, not for regression to the old single-table scheme's
    0.4-0.6)."""
    import numpy as np
    from pyspark.sql import functions as F

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.catalog import table as _table
    from satellite_data_ingestion_spark.llm import simsearch
    from tests.conftest import SF_ORACLE

    exact = {r.vec_id for r in registry.spec("ext_sim_cosine").fn(spark, SF_ORACLE).collect()}
    lsh = {r.vec_id for r in registry.spec("ext_sim_lsh").fn(spark, SF_ORACLE).collect()}
    recall = len(exact & lsh) / 10
    assert recall >= 0.8, f"LSH recall@10 {recall:.2f} below contract"

    # Probe budget: replicate the candidate filter and count survivors.
    emb = _table(spark, SF_ORACLE, "embeddings")
    rows = emb.select(F.col("embedding").cast("array<double>").alias("v"), "vec_id").collect()
    M = np.array([r.v for r in rows])
    ids = np.array([r.vec_id for r in rows])
    planes = simsearch._lsh_tables(M.shape[1])
    bits = (M @ planes.reshape(-1, M.shape[1]).T > 0).reshape(
        len(M), simsearch._N_TABLES, simsearch._N_PLANES
    )
    qbits = bits[ids == simsearch._QUERY_VEC_ID][0]
    ham = (bits ^ qbits[None]).sum(axis=2).min(axis=1)
    probed = float((ham[ids != simsearch._QUERY_VEC_ID] <= simsearch._PROBE_H).mean())
    assert probed <= 0.20, f"LSH probes {probed:.1%} of the corpus (budget 20%)"


def test_simhash_recall_against_ground_truth(spark, duck):
    """SimHash banded matching must recover most true near-dup pairs
    (measured ~0.83 at 8-bit bands / hamming<=10; was 0.30 with 16-bit
    bands).  Precision is intentionally looser — hamming<=10 is a
    cosine-style band, wider than Jaccard>=0.9 — so only recall is
    pinned."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_SMOKE

    truth_pairs = duck.execute(
        """
        WITH d AS (SELECT doc_id, list_distinct(str_split(text,' ')) toks
                   FROM documents)
        SELECT a.doc_id, b.doc_id FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9
        """
    ).fetchall()
    truth = set(map(tuple, truth_pairs))
    found = {
        (r.doc_a, r.doc_b)
        for r in registry.spec("ext_dedup_simhash").fn(spark, SF_SMOKE).collect()
    }
    assert truth, "corpus should contain near-dup pairs"
    recall = len(truth & found) / len(truth)
    assert recall >= 0.6, f"simhash recall {recall:.2f} too low"


def _brute_jaccard_pairs(docs: dict[int, set[str]], t: float = 0.9):
    out = set()
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(docs[a] & docs[b])
            union = len(docs[a] | docs[b])
            if union and inter / union >= t:
                out.add((a, b))
    return out


def test_prefix_filter_exact_at_threshold_boundaries(spark):
    """Prefix filtering must be EXACT: pairs sitting precisely at
    J = 0.9 (18-subset-of-20: 18/20) are found, pairs just below
    (17-subset-of-19: ~0.8947) are excluded, plus identical docs,
    disjoint docs, single-token docs, and shared-rare-token decoys."""
    from satellite_data_ingestion_spark.llm.dedup import jaccard_pairs

    base20 = [f"w{i}" for i in range(20)]
    base19 = [f"v{i}" for i in range(19)]
    docs = {
        1: set(base20),            # (1,2): J = 18/20 = 0.9 exactly -> IN
        2: set(base20[:18]),
        3: set(base19),            # (3,4): J = 17/19 ~ 0.8947 -> OUT
        4: set(base19[:17]),
        5: {"same", "tokens", "here"},   # (5,6): identical -> J = 1 -> IN
        6: {"same", "tokens", "here"},
        7: {"lonely"},             # single-token; (7,8) disjoint -> OUT
        8: {"hermit"},
        9: {"lonely", "extra"},    # shares rare 'lonely' with 7: J=0.5 -> OUT
    }
    df = spark.createDataFrame(
        [(k, sorted(v)) for k, v in docs.items()], "doc_id int, toks array<string>"
    )
    rows = jaccard_pairs(df).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert got == _brute_jaccard_pairs(docs)
    # VALUES too, not just the pair set — the coalesced within-group path
    # emits a literal 1.0 that must agree with the brute ratio.
    for r in rows:
        inter = len(docs[r.doc_a] & docs[r.doc_b])
        union = len(docs[r.doc_a] | docs[r.doc_b])
        assert r.jaccard == round(inter / union, 4), (r.doc_a, r.doc_b)


def test_prefix_filter_matches_brute_force_on_random_corpus(spark):
    """Deterministic pseudo-random corpus (overlapping token subsets at
    many sizes) — the planted generator hits prefix/length boundaries a
    hand-written case list can miss."""
    import random

    from satellite_data_ingestion_spark.llm.dedup import jaccard_pairs

    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(120)]
    docs: dict[int, set[str]] = {}
    did = 0
    for _ in range(25):
        n = rng.randint(1, 40)
        base = set(rng.sample(vocab, n))
        docs[did] = base
        did += 1
        # a family of perturbations around the base set
        for _ in range(rng.randint(0, 3)):
            mutated = set(base)
            for _ in range(rng.randint(0, 3)):
                if mutated and rng.random() < 0.5:
                    mutated.discard(rng.choice(sorted(mutated)))
                else:
                    mutated.add(rng.choice(vocab))
            if mutated:
                docs[did] = mutated
                did += 1
    df = spark.createDataFrame(
        [(k, sorted(v)) for k, v in docs.items()], "doc_id int, toks array<string>"
    )
    rows = jaccard_pairs(df).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    assert got == _brute_jaccard_pairs(docs)
    for r in rows:
        inter = len(docs[r.doc_a] & docs[r.doc_b])
        union = len(docs[r.doc_a] | docs[r.doc_b])
        assert r.jaccard == round(inter / union, 4), (r.doc_a, r.doc_b)


def test_cosine_zero_norm_vector_yields_null_not_crash(spark):
    """ANSI mode throws DIVIDE_BY_ZERO on double /0 — a zero-norm
    embedding must yield a null cosine (skipped by filters/ranking),
    not kill the query (regression for the try_divide guard)."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 1.0])],
        "vec_id int, v array<double>",
    )
    q = F.array(F.lit(1.0), F.lit(0.0))
    rows = {r.vec_id: r.c for r in df.select("vec_id", cosine(F.col("v"), q).alias("c")).collect()}
    assert rows[1] is None
    assert abs(rows[2] - 1.0) < 1e-12
    assert abs(rows[3] - 0.7071067811865475) < 1e-12


def test_ivf_quantizer_survives_tiny_corpus():
    """k-means training must not crash when the sample is smaller than
    the configured list count (choice with replace=False would raise)."""
    import numpy as np

    from satellite_data_ingestion_spark.llm import simsearch

    class _FakeDF:
        def __init__(self, X):
            self._X = X
        def orderBy(self, *_):
            return self
        def limit(self, *_):
            return self
        def select(self, *_):
            return self
        def collect(self):
            import types
            return [types.SimpleNamespace(v=list(row)) for row in self._X]

    X = np.random.default_rng(0).standard_normal((5, 8))
    cents = simsearch._train_centroids(_FakeDF(X))
    assert cents.shape == (5, 8)  # capped to the corpus size, not _IVF_K


def test_drain_deadline_raises_on_hung_query():
    """A hung processAllAvailable (e.g. dead python worker) must surface as
    TimeoutError so stream_python_datasource's retry loop gets control back
    instead of blocking the whole sweep (r03 verdict item 7)."""
    import threading

    from satellite_data_ingestion_spark.sources.python_source import _drain_with_deadline

    class HungQuery:
        def processAllAvailable(self):
            threading.Event().wait()  # blocks forever

    class PromptQuery:
        def processAllAvailable(self):
            return None

    import pytest as _pytest

    with _pytest.raises(TimeoutError):
        _drain_with_deadline(HungQuery(), 0.2)
    _drain_with_deadline(PromptQuery(), 5)  # must not raise


# ---------------------------------------------------------------- pipe


def test_pipe_transform_row_expanding_and_filtering(spark):
    """The child may emit more or fewer lines than it receives (RDD.pipe
    semantics): a filtering awk drops rows; a duplicating awk expands."""
    from satellite_data_ingestion_spark.operators.pipe import pipe_transform

    df = spark.createDataFrame([(i, i * 10) for i in range(20)], "id long, v long")
    kept = pipe_transform(
        df, ["awk", "-F", "\t", "$2 >= 100 { print $1 \"\\t\" $2 }"], "id long, v long"
    )
    rows = {r.id for r in kept.collect()}
    assert rows == set(range(10, 20))

    doubled = pipe_transform(
        df, ["awk", "-F", "\t", "{ print $1 \"\\t\" $2; print $1 \"\\t\" $2 }"],
        "id long, v long",
    )
    assert doubled.count() == 40


def test_pipe_transform_failing_command_raises(spark):
    from satellite_data_ingestion_spark.operators.pipe import pipe_transform

    df = spark.createDataFrame([(1,)], "id long")
    bad = pipe_transform(df, ["false"], "id long")
    with pytest.raises(Exception) as exc:
        bad.collect()
    assert "exited" in str(exc.value) or "PythonException" in type(exc.value).__name__


def test_pipe_transform_empty_input(spark):
    from satellite_data_ingestion_spark.operators.pipe import pipe_transform

    df = spark.createDataFrame([], "id long").filter("id > 0")
    out = pipe_transform(df, ["cat"], "id long")
    assert out.count() == 0


# ------------------------------------------------- events.ts encodings


def test_events_ts_normalizes_both_corpus_encodings(spark, tmp_path):
    """The corpus has shipped events.ts as TIMESTAMP(NANOS) (read as a
    nanos long under nanosAsLong) and as timestamp[us] (read as NTZ);
    both must surface as identical session-tz timestamps."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from satellite_data_ingestion_spark.catalog import _events_ts

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    us_path = str(tmp_path / "ev_us.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(micros, type=pa.timestamp("us"))}), us_path
    )
    ns_path = str(tmp_path / "ev_ns.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([m * 1000 for m in micros], type=pa.int64())}),
        ns_path,
    )

    got_us = [r.ts for r in _events_ts(spark.read.parquet(us_path)).collect()]
    got_ns = [r.ts for r in _events_ts(spark.read.parquet(ns_path)).collect()]
    assert sorted(got_us) == sorted(got_ns)
    assert str(_events_ts(spark.read.parquet(us_path)).schema["ts"].dataType) == (
        "TimestampType()"
    )


def test_connected_components_converges_on_30_doc_chain(spark):
    """Pointer doubling must collapse a 30-hop duplicate chain well inside
    the default round cap (plain min-label propagation would need 29
    rounds and raise); every node lands on component 0."""
    from satellite_data_ingestion_spark.llm.dedup import connected_components

    n = 30
    undirected = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        undirected + [(b, a) for a, b in undirected], "doc_a long, doc_b long"
    )
    labels = spark.range(n).select(
        F.col("id").alias("doc_id"), F.col("id").alias("component_id")
    )
    out = connected_components(labels, edges, max_iters=10)
    rows = {r.doc_id: r.component_id for r in out.collect()}
    assert rows == {i: 0 for i in range(n)}


def test_connected_components_still_raises_past_cap(spark, monkeypatch):
    """The loud non-convergence contract stays: with the local finish
    disabled, a chain too deep for the given cap must raise, not return
    non-minimal labels."""
    from satellite_data_ingestion_spark import settings
    from satellite_data_ingestion_spark.llm.dedup import connected_components

    monkeypatch.setattr(settings, "CC_LOCAL_EDGES", 0)
    n = 40
    undirected = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        undirected + [(b, a) for a, b in undirected], "doc_a long, doc_b long"
    )
    labels = spark.range(n).select(
        F.col("id").alias("doc_id"), F.col("id").alias("component_id")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(labels, edges, max_iters=2)


def test_connected_components_local_finish_solves_deep_chain(spark):
    """The local union-find finish: a chain far deeper than the iteration
    cap converges anyway once the (tiny) quotient graph collects — and
    every node gets the true component min."""
    from satellite_data_ingestion_spark.llm.dedup import connected_components

    n = 40
    undirected = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        undirected + [(b, a) for a, b in undirected], "doc_a long, doc_b long"
    )
    labels = spark.range(n).select(
        F.col("id").alias("doc_id"), F.col("id").alias("component_id")
    )
    out = connected_components(labels, edges, max_iters=2)
    got = {r.doc_id: r.component_id for r in out.collect()}
    assert got == {i: 0 for i in range(n)}


def test_rest_catalog_page_index_pruning():
    """A pushed ts_epoch range must prune whole pages via the index —
    pages outside [dtstart, dtend] are never fetched."""
    import json as _json

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from satellite_data_ingestion_spark.sources import rest_catalog as rc
    from tests.conftest import SF_ORACLE

    endpoint = rc._stage_catalog(SF_ORACLE)
    with open(os.path.join(endpoint, "index.json")) as f:
        index = _json.load(f)
    assert len(index) >= 10, "need enough pages for pruning to be visible"

    reader = rc.RestCatalogReader({"endpoint": endpoint})
    lo = index[3]["min_ts"]
    hi = index[5]["max_ts"]
    unsupported = list(
        reader.pushFilters(
            [GreaterThanOrEqual(("ts_epoch",), lo), LessThan(("ts_epoch",), hi)]
        )
    )
    assert unsupported == [], "range filters must be absorbed"
    parts = reader.partitions()
    assert 0 < len(parts) <= 4, f"expected ~3 surviving pages, got {len(parts)}"
    names = {p.fname for p in parts}
    assert index[0]["file"] not in names and index[-1]["file"] not in names

    # The absorbed bounds are row-exact at the fetch layer.
    rows = [r for p in parts for r in reader.read(p)]
    assert rows and all(lo <= r[1] < hi for r in rows)


def test_rest_catalog_filter_absorbed_in_plan(spark):
    """The registered query's plan must carry no ts_epoch comparison above
    the BatchScan — only the null-check Spark always keeps."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_SMOKE

    df = registry.spec("scan_rest_catalog").fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re as _re

    filters = _re.findall(r"Filter \(?([^\n]*)", plan)
    assert filters, plan
    for cond in filters:
        assert ">=" not in cond and "<" not in cond, plan


def test_urlencode_oracle_charset_assumption(duck):
    """fn_urlencode's oracle is a replace chain covering exactly the
    reserved characters present in the corpus ({#, /, space}); this pins
    that assumption so a corpus regeneration that introduces new reserved
    characters fails HERE with a clear message, not as a hash mismatch."""
    rows = duck.sql(
        "SELECT DISTINCT unnest(str_split(regexp_replace("
        "p_brand || '/' || p_name, '[a-zA-Z0-9]', '', 'g'), '')) FROM part"
    ).fetchall()
    assert {r[0] for r in rows} <= {"#", "/", " "}, rows


def test_rest_catalog_empty_range_yields_no_rows():
    """A pushed range matching no page must produce zero rows through the
    no-op partition path, not an error."""
    from pyspark.sql.datasource import EqualTo

    from satellite_data_ingestion_spark.sources import rest_catalog as rc
    from tests.conftest import SF_ORACLE

    endpoint = rc._stage_catalog(SF_ORACLE)
    reader = rc.RestCatalogReader({"endpoint": endpoint})
    list(reader.pushFilters([EqualTo(("ts_epoch",), -5)]))
    parts = reader.partitions()
    assert [r for p in parts for r in reader.read(p)] == []


def test_lsh_indexed_matches_inline(spark):
    """The stored-signature ANN variant must return EXACTLY the inline
    variant's top-k (same planes, same seed, same probe budget) — the
    index changes the IO shape, never the answer."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_ORACLE

    inline = [
        (r.vec_id, r.label, r.cos_sim)
        for r in registry.spec("ext_sim_lsh").fn(spark, SF_ORACLE).collect()
    ]
    indexed = [
        (r.vec_id, r.label, r.cos_sim)
        for r in registry.spec("ext_sim_lsh_indexed").fn(spark, SF_ORACLE).collect()
    ]
    assert inline == indexed


def test_banded_candidates_adversarial_hot_key(spark):
    """Worst-case skew: ONE band key owns >50% of all docs.  The
    candidate generator must (a) emit exactly n-1 star-link pairs for
    the hot bucket — linear, never n²/2 — and (b) never materialize the
    hot bucket into an array (the conditional collect keeps window state
    bounded by max_bucket), which we check by asserting total candidate
    count matches the exact linear+quadratic-only-under-cap bound."""
    from satellite_data_ingestion_spark.llm.dedup import banded_candidate_pairs

    hot_n, cold_n, cap = 600, 10, 20
    rows = [(i, 0, 777) for i in range(hot_n)]  # one key owns 98% of docs
    rows += [(1000 + i, 0, 888) for i in range(cold_n)]  # small all-pairs bucket
    bands = spark.createDataFrame(rows, "doc_id long, band_id int, band_key long")
    got = banded_candidate_pairs(bands, max_bucket=cap).collect()
    star = {(a, b) for a, b in [(r.doc_a, r.doc_b) for r in got] if b < 1000}
    allp = {(r.doc_a, r.doc_b) for r in got if r.doc_b >= 1000}
    # hot bucket: exactly n-1 pairs, all anchored at the min doc_id
    assert len(star) == hot_n - 1
    assert all(a == 0 and 0 < b < hot_n for a, b in star)
    # cold bucket under the cap: exact all-pairs
    assert len(allp) == cold_n * (cold_n - 1) // 2
    # global bound: nothing quadratic leaked from the hot key
    assert len(got) == (hot_n - 1) + cold_n * (cold_n - 1) // 2


def test_banded_candidates_doc_in_hot_and_cold_buckets(spark):
    """A doc appearing in BOTH a hot bucket (star-linked) and a small
    bucket (all-pairs) contributes to both regimes; the final distinct
    dedups pairs surfaced by multiple bands."""
    from satellite_data_ingestion_spark.llm.dedup import banded_candidate_pairs

    rows = [(i, 0, 1) for i in range(50)]  # hot under cap=10 → star
    rows += [(1, 1, 2), (2, 1, 2), (3, 1, 2)]  # small bucket in band 1
    rows += [(1, 2, 3), (2, 2, 3)]  # band 2 re-surfaces (1,2)
    bands = spark.createDataFrame(rows, "doc_id long, band_id int, band_key long")
    got = {(r.doc_a, r.doc_b) for r in banded_candidate_pairs(bands, max_bucket=10).collect()}
    assert {(0, i) for i in range(1, 50)} <= got  # star links
    assert {(1, 2), (1, 3), (2, 3)} <= got  # all-pairs (deduped across bands)
    assert len(got) == 49 + 3


def test_ivf_indexed_matches_inline(spark):
    """The cluster-partitioned IVF layout must return EXACTLY the inline
    variant's top-k (same quantizer, same seed, same probe set) — the
    partitioned layout changes which FILES are read, never the answer."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_ORACLE

    inline = [
        (r.vec_id, r.label, r.cos_sim)
        for r in registry.spec("ext_sim_ivf").fn(spark, SF_ORACLE).collect()
    ]
    indexed = [
        (r.vec_id, r.label, r.cos_sim)
        for r in registry.spec("ext_sim_ivf_indexed").fn(spark, SF_ORACLE).collect()
    ]
    assert inline == indexed


def test_zorder_layout_skips_row_groups(spark):
    """The Z-ordered layout must make the 32x32 bucket box (1/64 of the
    key space) skippable from parquet footers alone: the box's pushed
    range filters on (xb, yb) may intersect only a minority of row
    groups, while a one-dimensional date-sorted layout leaves the partkey
    axis unclustered (every row group spans ~the full xb range)."""
    import glob

    import pyarrow.parquet as pq

    from satellite_data_ingestion_spark.operators import layout

    staged = layout.stage_zorder(spark, "/root/testdata/sf0.001")

    # sanity: the adaptive bucketing must put data IN the box (a fixed
    # epoch once left the box empty and the skip assertions vacuous)
    assert (
        layout.ext_zorder_layout(spark, "/root/testdata/sf0.001").count() > 0
    )

    def intersecting_fraction(path_glob):
        total = hit = 0
        for path in glob.glob(path_glob):
            md = pq.ParquetFile(path).metadata
            cols = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                sx = row.column(cols["xb"]).statistics
                sy = row.column(cols["yb"]).statistics
                total += 1
                if (
                    sx.min <= layout._X_HI
                    and sx.max >= layout._X_LO
                    and sy.min <= layout._Y_HI
                    and sy.max >= layout._Y_LO
                ):
                    hit += 1
        assert total > 0
        return hit / total, total

    frac, total = intersecting_fraction(staged + "/part-*.parquet")
    assert total >= 16  # the layout actually fanned out into many files
    # 1/64 of the key space; Morton tiling keeps the touched fraction an
    # order of magnitude under "read everything".
    assert frac <= 0.35, f"z-order skipped too little: {frac:.2f} of {total}"

    # Baseline: same data sorted ONLY by shipdate bucket — the secondary
    # (partkey) axis stays unclustered, so footer stats cannot skip on it
    # and nearly every row group intersects the partkey range.
    import tempfile

    base = tempfile.mkdtemp(prefix="sdis_datesort_")
    (
        spark.read.parquet(staged)
        .repartitionByRange(32, "yb")
        .sortWithinPartitions("yb")
        .write.mode("overwrite")
        .parquet(base)
    )
    frac_1d, _ = intersecting_fraction(base + "/part-*.parquet")
    assert frac < frac_1d, (
        f"z-order ({frac:.2f}) must beat single-dim sort ({frac_1d:.2f})"
    )


def test_hilbert_layout_math_and_locality(spark):
    """Three pins on the Hilbert-clustered layout: (a) the unrolled SQL
    transform equals the classic xy→d reference algorithm exactly, (b)
    equal-size Hilbert key ranges have no worse mean (xb, yb) bounding
    boxes than the Morton layout's (curve continuity is the whole point),
    and (c) the 32x32 box predicate still prunes most row groups from
    parquet footers alone."""
    import glob

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.operators import layout

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    # (a) exact math: a deterministic 1/16 sample of the 256x256 grid
    grid = spark.range(4096).selectExpr(
        "cast((id * 16 + 7) div 256 as int) as xb",
        "cast((id * 16 + 7) % 256 as int) as yb",
    )
    got = layout.hilbert_key(grid, "xb", "yb").collect()
    assert all(r.hval == xy2d(256, r.xb, r.yb) for r in got)

    sf = "/root/testdata/sf0.001"
    hz = spark.read.parquet(layout.stage_hilbert(spark, sf))
    mz = spark.read.parquet(layout.stage_zorder(spark, sf))
    W = layout._H_BUCKET_WIDTH

    def mean_area(df, key):
        per = df.groupBy(F.expr(f"{key} div {W}").alias("b")).agg(
            (
                (F.max("xb") - F.min("xb") + 1)
                * (F.max("yb") - F.min("yb") + 1)
            ).alias("area")
        )
        return per.agg(F.avg("area")).collect()[0][0]

    h_area, m_area = mean_area(hz, "hval"), mean_area(mz, "zval")
    assert h_area <= m_area, (
        f"hilbert bucket footprint {h_area} worse than morton {m_area}"
    )

    # (c) footer-stat pruning of the same box the zorder test uses
    staged = layout._HILBERT_DIR_CACHE[__import__("os").path.abspath(sf)]
    total = hit = 0
    for path in glob.glob(staged + "/part-*.parquet"):
        md = pq.ParquetFile(path).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            sx = row.column(cols["xb"]).statistics
            sy = row.column(cols["yb"]).statistics
            total += 1
            if (
                sx.min <= layout._X_HI
                and sx.max >= layout._X_LO
                and sy.min <= layout._Y_HI
                and sy.max >= layout._Y_LO
            ):
                hit += 1
    assert total >= 16
    assert hit / total <= 0.35, f"hilbert skipped too little: {hit}/{total}"


def test_segment_dedup_reconstruction_invariants(spark):
    """Documents that lost no segments must reconstruct EXACTLY; exact
    duplicate documents (the corpus plants them) must lose all their
    segments to the first copy; kept segments across the corpus equal the
    number of DISTINCT segments."""
    from satellite_data_ingestion_spark.llm.dedup import ext_segment_dedup
    from satellite_data_ingestion_spark.catalog import table

    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    out = ext_segment_dedup(spark, sf)
    docs = table(spark, sf, "documents").select("doc_id", "text")
    j = out.join(docs, "doc_id").cache()

    # untouched docs round-trip byte-for-byte
    untouched = j.filter(F.col("n_removed") == 0)
    assert untouched.count() > 0
    assert untouched.filter(F.col("clean_text") != F.col("text")).count() == 0

    # when the corpus contains exact duplicate docs, the later copy of a
    # duplicated text must come back fully emptied (every segment already
    # seen in the first copy) — conditional: not every SF plants exact
    # dups (sf0.001 has none; near-dups only)
    dup_losers = (
        docs.groupBy("text")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keep"))
        .filter(F.col("n") > 1)
    )
    if dup_losers.count() > 0:
        emptied = (
            docs.join(dup_losers, "text")
            .filter(F.col("doc_id") != F.col("keep"))
            .join(out, "doc_id")
        )
        assert emptied.filter(F.col("clean_text") != "").count() == 0

    # global accounting: kept segments == distinct segments
    n_words = 10
    chunks = docs.select(
        F.explode(
            F.expr(
                f"""transform(sequence(0, cast(ceil(size(split(text, ' '))/{n_words}.0) as int) - 1),
                    i -> array_join(slice(split(text, ' '), i*{n_words}+1, {n_words}), ' '))"""
            )
        ).alias("c")
    )
    n_distinct = chunks.distinct().count()
    n_total = chunks.count()
    removed = out.agg(F.sum("n_removed")).collect()[0][0]
    assert n_total - removed == n_distinct
    j.unpersist()


def test_connected_components_deep_monotone_chain(spark):
    """Contraction's deterministic worst case at depth: a 4000-node
    MONOTONE id chain (min-hooking alone shifts labels one hop per
    round, so static-edge propagation would need ~4000 rounds).  Edge
    contraction + CC_DOUBLINGS pointer doubling must close it within the
    default 20-round cap — the shape of the sf0.1 corpus' ~2k-deep
    duplicate chains at 2x depth."""
    from satellite_data_ingestion_spark.llm.dedup import connected_components

    n = 4000
    undirected = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        undirected + [(b, a) for a, b in undirected], "doc_a long, doc_b long"
    )
    labels = spark.range(n).select(
        F.col("id").alias("doc_id"), F.col("id").alias("component_id")
    )
    out = connected_components(labels, edges)
    assert out.filter(F.col("component_id") != 0).count() == 0
    assert out.count() == n


def test_stream_ts_subseq_matches_offline_recompute(spark):
    """The streaming subsequence tracker must agree with a one-shot numpy
    recomputation over each full series — including windows that SPAN
    micro-batch boundaries (the carried m-1 buffer), and the batch
    operator's global top-1 must be the min over the streaming per-series
    minima."""
    import numpy as np
    import pyarrow.parquet as pq

    from satellite_data_ingestion_spark.operators.timeseries import (
        _TS_M,
        _TS_QUERY_TYPE,
    )
    from satellite_data_ingestion_spark.streaming.custom_state import (
        stream_ts_subseq,
    )

    sf = "/root/testdata/sf0.001"
    out = {r.event_type: r for r in stream_ts_subseq(spark, sf).collect()}

    t = pq.read_table(sf + "/events.parquet").to_pandas()
    t = t.sort_values(["ts", "event_id"])
    m = _TS_M
    q = t[t.event_type == _TS_QUERY_TYPE]["value"].to_numpy(np.float64)[:m]
    mq = q.sum() / m
    sq = max((q * q).sum() / m - mq * mq, 0.0) ** 0.5
    for etype, grp in t.groupby("event_type"):
        vals = grp["value"].to_numpy(np.float64)
        row = out[etype]
        assert row.n_points == len(vals)
        assert row.n_windows == max(0, len(vals) - m + 1)
        w = np.lib.stride_tricks.sliding_window_view(vals, m)
        sw1 = w.sum(axis=1) / m
        sw2 = (w * w).sum(axis=1) / m
        sw = np.sqrt(np.maximum(sw2 - sw1 * sw1, 0.0))
        denom = sw * sq
        rho = np.where(denom == 0, 0.0, ((w @ q) / m - sw1 * mq) / denom)
        dist = np.round(np.sqrt(np.maximum(2.0 * m * (1.0 - rho), 0.0)), 6)
        j = int(np.lexsort((np.arange(len(dist)), dist))[0])
        assert row.min_dist == pytest.approx(float(dist[j]), abs=1e-9)
        assert row.min_start == j


def test_stream_join_outer_matches_batch_semantics(spark):
    """The left-outer stream-stream join must emit (a) matched rows
    identical to the batch interval join and (b) a null row for exactly
    the unmatched signups the state store evicted — those whose match
    window closed before the final watermark.  The watermark tracks the
    FILTERED signup/purchase rows (not the whole event table), and the
    left state watermark subtracts the 30-minute range upper bound; both
    subtleties are recomputed batch-side here."""
    import pandas as pd
    import pyarrow.parquet as pq

    from satellite_data_ingestion_spark.streaming.joins import (
        _RANGE_MIN,
        stream_join_outer,
    )

    out = stream_join_outer(spark, "/root/testdata/sf0.001").cache()
    t = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
    sig = t[t.event_type == "signup"]
    pur = t[t.event_type == "purchase"]
    rng = pd.Timedelta(minutes=_RANGE_MIN)

    m = sig.merge(pur, on="user_id", suffixes=("_a", "_b"))
    m = m[(m.ts_b >= m.ts_a) & (m.ts_b <= m.ts_a + rng)]
    expect_matched = set(zip(m.event_id_a, m.event_id_b))
    got_matched = {
        (r.signup_event, r.purchase_event)
        for r in out.filter(F.col("purchase_event").isNotNull()).collect()
    }
    assert got_matched == expect_matched

    # the global watermark is the MIN across the two sides' watermark
    # operators (multipleWatermarkPolicy=min), each over its FILTERED
    # input — the slower side (signups here) gates eviction
    wm = min(sig.ts.max(), pur.ts.max()) - pd.Timedelta(hours=1)
    un = sig[~sig.event_id.isin({a for a, _ in expect_matched})]
    expect_null = set(un[un.ts + rng < wm].event_id)
    got_null = {
        r.signup_event
        for r in out.filter(F.col("purchase_event").isNull()).collect()
    }
    assert got_null == expect_null
    # the withheld tail is exactly the still-open windows
    assert set(un.event_id) - expect_null == set(
        un[un.ts + rng >= wm].event_id
    )


def test_bpe_learn_merges_hand_computed():
    """Classic-BPE semantics on a corpus small enough to merge by hand:
    'low'x5 + 'lower'x2.  Symbol stream: l o w </w> (x5), l o w e r </w>
    (x2).  Pair counts round 1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2,
    (e,r)=2, (r,</w>)=2 — top count 7, lexicographic tie-break picks
    (l,o).  Round 2: (lo,w)=7 wins.  Round 3: (low,</w>)=5."""
    from satellite_data_ingestion_spark.llm.bpe import learn_merges

    merges = learn_merges([("low", 5), ("lower", 2)], n_merges=3)
    assert merges == [("l", "o"), ("lo", "w"), ("low", "</w>")]


def test_bpe_matches_independent_reference():
    """learn_merges must agree with an independently-structured
    reference implementation (list-of-symbol-lists, no dict folding) on
    a many-word histogram, and tokenize_word must reproduce exactly the
    segmentation training ends with for every training word."""
    import itertools

    from satellite_data_ingestion_spark.llm.bpe import (
        _END,
        learn_merges,
        tokenize_word,
    )

    hist = [
        ("the", 50), ("then", 11), ("than", 9), ("that", 30),
        ("toast", 3), ("roast", 4), ("coast", 5), ("cost", 7),
        ("a", 40), ("at", 22), ("ate", 6), ("rate", 8), ("rat", 5),
    ]

    def ref_bpe(hist, n):
        words = [(list(w) + [_END], f) for w, f in hist]
        out = []
        for _ in range(n):
            counts = {}
            for sym, f in words:
                for pair in zip(sym, sym[1:]):
                    counts[pair] = counts.get(pair, 0) + f
            if not counts:
                break
            top = max(counts.values())
            pair = min(p for p, c in counts.items() if c == top)
            out.append(pair)
            for sym, _f in words:
                i = 0
                while i < len(sym) - 1:
                    if (sym[i], sym[i + 1]) == pair:
                        sym[i : i + 2] = [sym[i] + sym[i + 1]]
                    else:
                        i += 1
            # ref keeps words as mutable lists; engine folds dict keys —
            # different structures, same algorithm
        return out, words

    for n in (1, 5, 20):
        expect, final_words = ref_bpe(hist, n)
        got = learn_merges(hist, n_merges=n)
        assert got == expect, f"n={n}: {got} != {expect}"
        ranks = {p: i for i, p in enumerate(got)}
        for (word, _f), (sym, _f2) in zip(hist, final_words):
            assert tokenize_word(word, ranks) == sym


def test_bpe_tokenize_round_trip(spark):
    """Spark-side accounting must be internally consistent: token
    concatenation reproduces each word (checked via the counts: tokens
    per doc >= words per doc, equality iff every word fully merged), and
    the pandas-UDF path agrees with a driver-side recount on a sample."""
    import pyarrow.parquet as pq

    from satellite_data_ingestion_spark.llm.bpe import (
        ext_bpe_tokenize,
        ext_bpe_train,
        tokenize_word,
    )

    sf = "/root/testdata/sf0.001"
    out = {r.doc_id: r for r in ext_bpe_tokenize(spark, sf).collect()}
    ranks = {
        (r.left, r.right): r.rank
        for r in ext_bpe_train(spark, sf).collect()
    }
    t = pq.read_table(sf + "/documents.parquet").to_pandas()
    sample = t.head(25)
    for _, row in sample.iterrows():
        words = [w for w in (row.text or "").lower().split() if w]
        n_tokens = 0
        for w in words:
            toks = tokenize_word(w, ranks)
            # lossless: concatenating tokens reproduces word + sentinel
            assert "".join(toks) == w + "</w>"
            n_tokens += len(toks)
        got = out[row.doc_id]
        assert (got.n_words, got.n_tokens) == (len(words), n_tokens)


def test_pq_indexed_matches_inline(spark):
    """The stored-code PQ layout must return EXACTLY the inline
    ext_sim_ivf_pq top-k (same quantizer, codebooks, seed, probe set) —
    the layout changes which BYTES are read, never the answer."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_ORACLE

    inline = [
        (r.vec_id, r.label, r.cos_sim)
        for r in registry.spec("ext_sim_ivf_pq").fn(spark, SF_ORACLE).collect()
    ]
    indexed = [
        (r.vec_id, r.label, r.cos_sim)
        for r in registry.spec("ext_sim_pq_indexed").fn(spark, SF_ORACLE).collect()
    ]
    assert inline == indexed


def test_substring_dedup_alignment_and_threshold(spark, tmp_path):
    """Exact-substring dedup must catch a verbatim run at ANY alignment
    (the property segment dedup lacks) and ignore runs shorter than
    W + MIN_SHARED - 1 tokens (fewer than MIN_SHARED shingles)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from satellite_data_ingestion_spark.llm.dedup import (
        _SUBSTR_MIN_SHARED,
        _SUBSTR_W,
        ext_substring_dedup,
    )

    run = " ".join(f"tok{i}" for i in range(_SUBSTR_W + _SUBSTR_MIN_SHARED - 1))
    short = " ".join(f"sok{i}" for i in range(_SUBSTR_W + _SUBSTR_MIN_SHARED - 2))
    fillers = [" ".join(f"f{d}x{i}" for i in range(3 + 2 * d)) for d in range(4)]
    docs = [
        (0, fillers[0] + " " + run),         # run at offset 3
        (1, fillers[1] + " " + run),         # same run at offset 5
        (2, fillers[2] + " " + short),       # one shingle short of the gate
        (3, fillers[3] + " " + short),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": [d for d, _ in docs],
                "text": [t for _, t in docs],
                "source": ["t"] * len(docs),
                "lang": ["en"] * len(docs),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = [
        (r.doc_a, r.doc_b, r.n_shared)
        for r in ext_substring_dedup(spark, str(tmp_path)).collect()
    ]
    assert out == [(0, 1, _SUBSTR_MIN_SHARED)]


def test_stream_ts_anomaly_matches_batch_operator(spark):
    """The streaming anomaly gate must emit EXACTLY the batch
    ext_ts_anomaly rows — including points whose 20-value baseline spans
    a micro-batch boundary (the carried buffer)."""
    from satellite_data_ingestion_spark.operators.timeseries import (
        ext_ts_anomaly,
    )
    from satellite_data_ingestion_spark.streaming.custom_state import (
        stream_ts_anomaly,
    )

    sf = "/root/testdata/sf0.001"
    stream = sorted(
        (r.event_id, r.event_type, r.zscore)
        for r in stream_ts_anomaly(spark, sf).collect()
    )
    batch = sorted(
        (r.event_id, r.event_type, r.zscore)
        for r in ext_ts_anomaly(spark, sf).collect()
    )
    assert len(stream) == len(batch) > 0
    for (sid, sty, sz), (bid, bty, bz) in zip(stream, batch):
        assert (sid, sty) == (bid, bty)
        assert sz == pytest.approx(bz, abs=1e-6)


def _reader_rows(reader, partition):
    """Normalize a Python Data Source read() — tuples OR pyarrow
    RecordBatches (the Arrow fast path) — to a list of plain tuples."""
    out = []
    for item in reader.read(partition):
        if hasattr(item, "to_pylist"):  # RecordBatch
            out.extend(tuple(d.values()) for d in item.to_pylist())
        else:
            out.append(tuple(item))
    return out


def test_delta_stream_reader_offsets_and_append_only(spark, tmp_path):
    """The Delta streaming source's offset protocol at the reader level:
    versions advance per latestOffset call under a throttle, committed
    ranges replay identically, and a data-changing remove in-range
    fails the stream instead of re-emitting consumed rows."""
    from satellite_data_ingestion_spark.sources.delta_log import DeltaLogTable
    from satellite_data_ingestion_spark.sources.python_source import (
        DeltaStreamReader,
    )

    root = str(tmp_path / "tbl")
    t = DeltaLogTable(spark, root)
    for i in range(3):
        t.commit_append(
            spark.createDataFrame([(i, float(i))], "k long, v double").coalesce(1)
        )
    r = DeltaStreamReader({"path": root, "versions_per_batch": "1"})
    assert r.initialOffset() == {"version": -1}
    assert r.latestOffset() == {"version": 0}
    assert r.latestOffset() == {"version": 1}
    # batch (0, 1]: exactly version 1's rows
    (p,) = r.partitions({"version": 0}, {"version": 1})
    rows = _reader_rows(r, p)
    assert rows == [(1, 1.0)]
    # replayability: the same committed range reads identically
    (p2,) = r.partitions({"version": 0}, {"version": 1})
    assert _reader_rows(r, p2) == rows
    # append-only contract: a delete in-range fails the planner
    t.commit_delete("k", 0, 0)
    with pytest.raises(ValueError, match="not append-only"):
        r.partitions({"version": 2}, {"version": 3})


def test_stateful_trackers_restore_order_across_arrow_chunks():
    """applyInPandasWithState delivers a group's micro-batch as multiple
    Arrow chunks whose RELATIVE order is not guaranteed (the pre-stateful
    sort orders by key only).  The trackers must produce identical output
    and state no matter how the batch is chunked or in what order the
    chunks arrive (round-7 ADVICE finding; sf0.001 streams only ever
    exercised single-chunk groups)."""
    import numpy as np
    import pandas as pd

    from satellite_data_ingestion_spark.streaming.custom_state import (
        _make_anomaly_tracker,
        _make_subseq_tracker,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    rng = np.random.RandomState(7)
    n = 60
    full = pd.DataFrame(
        {
            "ts": np.arange(n, dtype=np.int64),
            "event_id": np.arange(n, dtype=np.int64),
            "value": rng.randn(n).round(3),
        }
    )
    parts = [full.iloc[0:20], full.iloc[20:40], full.iloc[40:60]]

    def run(make, chunks):
        st = FakeState()
        outs = list(make()(("t",), iter(chunks), st))
        return pd.concat(outs, ignore_index=True), st._v

    for make in (
        lambda: _make_anomaly_tracker(20, 1.0),
        lambda: _make_subseq_tracker(list(full["value"][:8]), 8),
    ):
        ordered, st_ordered = run(make, [full])
        scrambled, st_scrambled = run(make, [parts[2], parts[0], parts[1]])
        pd.testing.assert_frame_equal(
            ordered.sort_values(list(ordered.columns)).reset_index(drop=True),
            scrambled.sort_values(list(scrambled.columns)).reset_index(drop=True),
        )
        assert st_ordered == st_scrambled


def test_codec_registry_routes_by_mime_end_to_end(spark):
    """Registering a codec for a MIME type routes matching blobs through
    it INSIDE the Spark job (registry snapshot ships with the closure),
    while unmatched blobs fall back to the synthetic default — the
    pluggable-codec seam of the round-6 verdict, no module editing."""
    from satellite_data_ingestion_spark.llm import multimodal as mm

    png = bytes([0x89, 0x50, 0x4E]) + b"png-ish payload " * 8  # sniffs image/png
    txt = b"plain text payload, several frames long.." * 4
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(txt))], "doc_id long, payload binary"
    )

    def png_frames(payload):
        return [{"frame_idx": 0, "frame_offset": 0, "frame_bytes": len(payload)}]

    def png_features(payload):
        return {"n_bytes": len(payload), "width": 1920, "height": 1080,
                "first_byte": payload[0]}

    mm.register_frame_codec("image/png", png_frames)
    mm.register_codec("image/png", png_features)
    try:
        frames = mm.sampled_frames(df).collect()
        by_doc = {}
        for r in frames:
            by_doc.setdefault(r.doc_id, []).append(r)
        # doc 1 routed to the registered extractor: ONE frame, whole blob
        assert len(by_doc[1]) == 1 and by_doc[1][0].frame_bytes == len(png)
        # doc 2 fell back to the synthetic 32-byte/4:1 sampler
        assert len(by_doc[2]) == len(mm.fake_frames(txt))

        feats = {r.doc_id: r for r in mm.decoded_features(df).collect()}
        assert (feats[1].width, feats[1].height) == (1920, 1080)
        assert feats[2].width == len(txt) % 640  # synthetic fallback
    finally:
        mm._FRAME_CODECS.pop("image/png", None)
        mm._FEATURE_CODECS.pop("image/png", None)


def test_bmp_decoder_parses_real_headers():
    """The struct-only BMP decoder against hand-built golden files:
    exact (width, height), top-down (negative height) normalization,
    and a loud failure on a non-BMP payload."""
    import struct

    from satellite_data_ingestion_spark.llm.multimodal import decode_bmp

    def bmp(w, h):
        row = ((3 * w + 3) // 4) * 4
        hdr = b"BM" + struct.pack("<IHHI", 54 + row * abs(h), 0, 0, 54)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * abs(h), 2835, 2835, 0, 0
        )
        return hdr + dib + bytes(row * abs(h))

    out = decode_bmp(bmp(17, 9))
    assert (out["width"], out["height"]) == (17, 9)
    assert out["n_bytes"] == len(bmp(17, 9)) and out["first_byte"] == 0x42
    assert decode_bmp(bmp(5, -7))["height"] == 7  # top-down BMP
    with pytest.raises(ValueError, match="BM magic"):
        decode_bmp(b"PNGnot-a-bmp")


def test_wav_frame_sampler_walks_riff_chunks():
    """The struct-only WAV chunk walker: frames anchor at the data
    chunk's true offset even with an extra (odd-length, word-aligned)
    chunk before it; stereo blockAlign doubles the window bytes; a
    non-WAVE RIFF raises instead of emitting garbage frames."""
    import struct

    from satellite_data_ingestion_spark.llm.multimodal import (
        _SAMPLE_EVERY,
        _WAV_FRAME_SAMPLES,
        wav_frames,
    )

    def wav(n_samples, channels=1, extra_chunk=b""):
        block = 2 * channels
        data_len = n_samples * block
        body = (
            b"fmt "
            + struct.pack(
                "<IHHIIHH", 16, 1, channels, 8000, 8000 * block, block, 16
            )
            + extra_chunk
            + b"data"
            + struct.pack("<I", data_len)
            + bytes(data_len)
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    frames = wav_frames(wav(320))
    expect = list(range(0, 320 // _WAV_FRAME_SAMPLES, _SAMPLE_EVERY))
    assert [f["frame_idx"] for f in frames] == expect
    assert frames[0]["frame_offset"] == 44  # canonical header size
    assert frames[0]["frame_bytes"] == _WAV_FRAME_SAMPLES * 2

    # An odd-length LIST chunk before data: word alignment must hold.
    odd = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    shifted = wav_frames(wav(320, extra_chunk=odd))
    assert shifted[0]["frame_offset"] == 44 + len(odd)
    assert [f["frame_idx"] for f in shifted] == expect

    stereo = wav_frames(wav(320, channels=2))
    assert stereo[0]["frame_bytes"] == _WAV_FRAME_SAMPLES * 4

    with pytest.raises(ValueError, match="RIFF/WAVE"):
        wav_frames(b"RIFF\x10\x00\x00\x00AVI LIST")


def test_incremental_cluster_merges_standing_components(spark):
    """The hard incremental case: a batch doc similar to docs in TWO
    previously-separate standing components must merge them — all three
    docs land in one component keyed by the global min id, with the
    pair stage probing only the batch."""
    from satellite_data_ingestion_spark.llm.dedup import (
        _cluster_token_sets,
        _unique_set_pairs,
        connected_components,
    )

    a = [f"a{i}" for i in range(1, 10)]  # 9 shared tokens
    docs = {
        1: a + ["extraA"],      # standing comp {1}:  J(1,2) = 9/11 < 0.9
        2: a + ["extraB"],      # standing comp {2}
        10: list(a),            # batch doc: J(10,1) = J(10,2) = 9/10 = 0.9
        3: ["unrelated", "tokens", "entirely"],  # untouched standing comp
    }
    toks = spark.createDataFrame(
        [(k, sorted(set(v))) for k, v in docs.items()],
        "doc_id long, toks array<string>",
    )
    standing = toks.filter(F.col("doc_id") != 10)
    batch = toks.filter(F.col("doc_id") == 10)
    standing_labels = _cluster_token_sets(standing)
    assert {
        (r.doc_id, r.component_id) for r in standing_labels.collect()
    } == {(1, 1), (2, 2), (3, 3)}  # 1 and 2 genuinely separate
    new_pairs = _unique_set_pairs(
        toks, probe_ids=batch.select("doc_id")
    ).select("doc_a", "doc_b")
    got_pairs = {(r.doc_a, r.doc_b) for r in new_pairs.collect()}
    assert got_pairs == {(1, 10), (2, 10)}  # batch-touching pairs only
    edges = new_pairs.union(
        new_pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    labels0 = standing_labels.unionByName(
        batch.select("doc_id", F.col("doc_id").alias("component_id"))
    )
    final = {
        (r.doc_id, r.component_id)
        for r in connected_components(labels0, edges).collect()
    }
    assert final == {(1, 1), (2, 1), (10, 1), (3, 3)}


def test_incremental_cluster_equals_from_scratch(spark):
    """ext_dedup_cluster_incremental over the sf0.001 corpus must equal
    ext_dedup_cluster run from scratch, row for row."""
    from satellite_data_ingestion_spark.llm.dedup import (
        ext_dedup_cluster,
        ext_dedup_cluster_incremental,
    )
    from tests.conftest import SF_SMOKE

    sf = SF_SMOKE
    full = {
        (r.doc_id, r.component_id, r.is_canonical)
        for r in ext_dedup_cluster(spark, sf).collect()
    }
    inc = {
        (r.doc_id, r.component_id, r.is_canonical)
        for r in ext_dedup_cluster_incremental(spark, sf).collect()
    }
    assert inc == full


def test_connected_components_identity_start_equivalence(spark):
    """identity_start=True (skip round-1's identity contraction) must
    produce exactly the same labels as the general path on the same
    graph — it is a pure plan-shape optimization for callers that
    initialize component_id = doc_id over distinct a<b pair edges."""
    from pyspark.sql import functions as F

    from satellite_data_ingestion_spark.llm.dedup import connected_components

    # chain 1-2-3, pair (10,11), singleton 20, plus a 4-cycle 30..33
    base_pairs = [(1, 2), (2, 3), (10, 11), (30, 31), (31, 32), (32, 33), (30, 33)]
    pairs = spark.createDataFrame(base_pairs, "doc_a long, doc_b long")
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    nodes = spark.createDataFrame(
        [(n,) for n in (1, 2, 3, 10, 11, 20, 30, 31, 32, 33)], "doc_id long"
    )
    labels = nodes.select("doc_id", F.col("doc_id").alias("component_id"))
    general = {
        (r.doc_id, r.component_id)
        for r in connected_components(labels, edges).collect()
    }
    fast = {
        (r.doc_id, r.component_id)
        for r in connected_components(labels, edges, identity_start=True).collect()
    }
    assert fast == general
    assert {(20, 20), (1, 1), (3, 1), (33, 30)} <= fast


def test_knn_join_exact_contract(spark):
    """Every vector gets exactly K ranked neighbors (1..K, rounded-cosine
    descending) and its own id never appears among them."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_SMOKE

    from satellite_data_ingestion_spark.llm.simsearch import _KNN_K

    rows = registry.spec("ext_knn_join").fn(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for q, nbrs in by_q.items():
        assert sorted(n.rnk for n in nbrs) == list(range(1, _KNN_K + 1))
        assert all(n.nid != q for n in nbrs)
        ranked = sorted(nbrs, key=lambda n: n.rnk)
        sims = [n.cos_sim for n in ranked]
        assert sims == sorted(sims, reverse=True)


def test_knn_join_ivf_recall_and_coverage(spark):
    """The IVF kNN self-join must cover EVERY query vector with K
    neighbors and keep mean recall@K >= 0.8 vs the exact join (measured
    0.89 at sf0.01; sf0.001's tiny corpus caps the list count, so probes
    cover most of it)."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_SMOKE

    from satellite_data_ingestion_spark.llm.simsearch import _KNN_K

    exact = {}
    for r in registry.spec("ext_knn_join").fn(spark, SF_SMOKE).collect():
        exact.setdefault(r.qid, set()).add(r.nid)
    approx = {}
    for r in registry.spec("ext_knn_join_ivf").fn(spark, SF_SMOKE).collect():
        approx.setdefault(r.qid, set()).add(r.nid)
    assert set(approx) == set(exact), "every vector must be a query"
    assert all(len(v) == _KNN_K for v in approx.values())
    recall = sum(
        len(exact[q] & approx[q]) / len(exact[q]) for q in exact
    ) / len(exact)
    assert recall >= 0.8, f"recall@{_KNN_K} collapsed: {recall:.3f}"


def test_delta_cdf_stream_reader_dispatch_and_replay(spark, tmp_path):
    """The CDF streaming reader at the reader level: append commits read
    as inserts via the fallback, a MERGE commit's cdc files flow as
    pre/postimage + insert rows (carried-over rewrite rows absent), a
    DELETE commit flows as deletes instead of failing the stream, and a
    committed range replays identically."""
    from satellite_data_ingestion_spark.sources.delta_log import DeltaLogTable
    from satellite_data_ingestion_spark.sources.python_source import (
        DeltaCdfStreamReader,
    )

    root = str(tmp_path / "tbl")
    t = DeltaLogTable(spark, root, change_data_feed=True)
    t.commit_append(
        spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (3, 3.0)], "k long, v double"
        ).coalesce(1)
    )
    t.commit_merge(
        spark.createDataFrame([(2, 20.0), (4, 40.0)], "k long, v double"),
        keys=["k"],
    )
    t.commit_delete("k", 3, 4)
    r = DeltaCdfStreamReader({"path": root, "versions_per_batch": "1"})
    assert r.initialOffset() == {"version": -1}
    (p0,) = r.partitions({"version": -1}, {"version": 0})
    assert sorted(_reader_rows(r, p0)) == [
        (1, 1.0, "insert", 0), (2, 2.0, "insert", 0), (3, 3.0, "insert", 0),
    ]
    (p1,) = r.partitions({"version": 0}, {"version": 1})
    assert sorted(_reader_rows(r, p1), key=str) == sorted(
        [
            (2, 2.0, "update_preimage", 1),
            (2, 20.0, "update_postimage", 1),
            (4, 40.0, "insert", 1),
        ],
        key=str,
    )
    (p2,) = r.partitions({"version": 1}, {"version": 2})
    assert sorted(_reader_rows(r, p2)) == [
        (3, 3.0, "delete", 2), (4, 40.0, "delete", 2),
    ]
    # replay: same committed range reads identically
    (p1b,) = r.partitions({"version": 0}, {"version": 1})
    assert sorted(_reader_rows(r, p1b), key=str) == sorted(
        _reader_rows(r, p1), key=str
    )


def test_dsir_sample_tilts_toward_target(spark):
    """DSIR's whole point: the selected subset must be enriched in the
    target slice (lang='en') relative to the corpus base rate, and
    exactly K docs are selected."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_SMOKE

    from satellite_data_ingestion_spark.llm.sampling import (
        _DSIR_K,
        _DSIR_TARGET_LANG,
    )

    rows = registry.spec("ext_dsir_sample").fn(spark, SF_SMOKE).collect()
    sel = [r for r in rows if r.selected]
    assert len(sel) == min(_DSIR_K, len(rows))
    base = sum(r.lang == _DSIR_TARGET_LANG for r in rows) / len(rows)
    tilt = sum(r.lang == _DSIR_TARGET_LANG for r in sel) / len(sel)
    assert tilt > base, f"no enrichment: {tilt:.2f} vs base {base:.2f}"


def test_minhash_incremental_recall_vs_exact(spark, duck):
    """Batch-vs-corpus near-dup detection through the STORED index must
    find ~all true cross-set near-dup pairs (>= 0.95 recall vs exact
    batch x corpus Jaccard), and emit only cross-set pairs (corpus doc
    on the a side, batch doc on the b side)."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_SMOKE

    truth = duck.execute(
        """
        WITH d AS (
          SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks
          FROM documents
        )
        SELECT count(*) FROM d a JOIN d b
        ON a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9
        """
    ).fetchone()[0]
    rows = registry.spec("ext_dedup_minhash_incremental").fn(
        spark, SF_SMOKE
    ).collect()
    assert all(r.doc_a % 5 != 0 and r.doc_b % 5 == 0 for r in rows)
    assert truth > 0
    assert len(rows) / truth >= 0.95, f"recall {len(rows)}/{truth} too low"


@pytest.mark.parametrize("name", ["ext_dedup_embedding", "ext_knn_join"])
def test_cogroup_ops_survive_column_pruned_parents(spark, name):
    """Regression: a self-cogroup whose two sides share one plan lineage
    loses the RIGHT side's non-grouping columns under a column-pruned
    parent (count(), narrow selects) — Spark's attribute de-duplication
    mis-binds the right child.  Both cogrouped operators build their
    right side from a fresh scan (catalog.table_fresh) so pruned parents
    must work and agree with the unpruned row count."""
    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_SMOKE

    df = registry.spec(name).fn(spark, SF_SMOKE)
    assert df.count() == len(df.collect())


def test_knn_join_matches_numpy_brute_force(spark):
    """Partition-layout-independent ground truth: the distributed kNN
    join must equal a single-machine numpy brute force on the same
    ranking keys — catches tile co-location bugs (mixed-type cogroup
    keys once sent each side's groups to different partitions and
    silently dropped every cross-chunk tile)."""
    import numpy as np
    import pyarrow.parquet as pq

    from satellite_data_ingestion_spark import registry
    from tests.conftest import SF_SMOKE

    from satellite_data_ingestion_spark.llm.simsearch import _KNN_K

    t = pq.read_table(SF_SMOKE + "/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    S = np.round(X @ X.T, 6)
    np.fill_diagonal(S, -np.inf)
    truth = {}
    for i in range(len(ids)):
        order = np.lexsort((ids, -S[i]))[:_KNN_K]
        truth[ids[i]] = [(ids[j], S[i, j]) for j in order]
    got = {}
    for r in registry.spec("ext_knn_join").fn(spark, SF_SMOKE).collect():
        got.setdefault(r.qid, []).append((r.rnk, r.nid, r.cos_sim))
    assert set(got) == set(truth)
    for q, nbrs in truth.items():
        mine = [(n, c) for _, n, c in sorted(got[q])]
        assert mine == [(n, round(c, 6)) for n, c in nbrs], (q, mine, nbrs)


def test_incremental_embedding_cluster_equals_from_scratch(spark):
    """ext_dedup_embedding_cluster_incremental over the sf0.001 corpus
    must equal ext_dedup_embedding_cluster run from scratch, row for
    row (the no-drift contract for continuous semantic dedup)."""
    from satellite_data_ingestion_spark.llm.simsearch import (
        ext_dedup_embedding_cluster,
        ext_dedup_embedding_cluster_incremental,
    )
    from tests.conftest import SF_SMOKE

    full = {
        (r.vec_id, r.component_id, r.is_canonical)
        for r in ext_dedup_embedding_cluster(spark, SF_SMOKE).collect()
    }
    inc = {
        (r.vec_id, r.component_id, r.is_canonical)
        for r in ext_dedup_embedding_cluster_incremental(
            spark, SF_SMOKE
        ).collect()
    }
    assert inc == full


def test_embedding_quantize_reconstruction_bound(spark):
    """Int8 codes must decode back within one grid step of the original:
    |v - (mn + code * (mx - mn) / 255)| <= (mx - mn) / 255 per dimension
    — the floor-quantizer's worst case.  Pins that the codes are a valid
    encoder, not merely hash-stable integers."""
    import numpy as np

    from satellite_data_ingestion_spark.llm.simsearch import (
        ext_embedding_quantize,
    )
    from satellite_data_ingestion_spark.catalog import table

    sf = "/root/testdata/sf0.001"
    codes = {
        r.vec_id: r.codes for r in ext_embedding_quantize(spark, sf).collect()
    }
    raw = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in table(spark, sf, "embeddings").collect()
    }
    mat = np.stack([raw[k] for k in sorted(raw)])
    mn, mx = mat.min(axis=0), mat.max(axis=0)
    step = (mx - mn) / 255.0
    worst = 0.0
    for vid, v in raw.items():
        c = np.array(codes[vid].split(","), dtype=np.float64)
        assert c.min() >= 0 and c.max() <= 255
        recon = mn + c * step
        worst = max(worst, np.max(np.abs(v - recon) - step))
    assert worst <= 1e-12, f"reconstruction exceeded one grid step by {worst}"


def test_heavy_hitters_cms_one_sided_bound(spark):
    """Count-min never underestimates: est >= exact for every reported
    key, and every TRUE heavy hitter (exact frequency over the 0.1%
    threshold) must be reported — the sketch's one-sided guarantee
    means thresholding on estimates can only add keys, never lose one."""
    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.operators.scale import (
        ext_heavy_hitters,
    )
    from satellite_data_ingestion_spark.catalog import table

    sf = "/root/testdata/sf0.001"
    got = {r.l_partkey: (r.est_count, r.exact_count)
           for r in ext_heavy_hitters(spark, sf).collect()}
    assert got, "no heavy hitters reported"
    assert all(est >= exact for est, exact in got.values())

    li = table(spark, sf, "lineitem")
    total = li.count()
    true_heavy = {
        r.l_partkey
        for r in li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * 1000 >= total)
        .collect()
    }
    assert true_heavy <= set(got), "a true heavy hitter was lost"


def test_stream_heavy_hitters_state_is_sketch_bounded(spark):
    """The streaming CMS state store must hold EXACTLY depth x width =
    3,072 cells in every micro-batch — never a row more, at any arrival
    volume (the r14 sf1 profile measured 3,072 rows / ~0.5-1.0 MB at
    sf0.1 AND sf1; wall grows only with arrivals).  Pins the bound the
    BASELINE.md scale row documents: if a regression ever keys state by
    anything corpus-grained, numRowsTotal explodes and this fails."""
    import os
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.catalog import table
    from satellite_data_ingestion_spark.operators.scale import (
        _CMS_DEPTH,
        _CMS_WIDTH,
        _cms_bucket,
    )
    from satellite_data_ingestion_spark.streaming.state import (
        _few_shuffle_partitions,
    )

    staging = os.path.join(tempfile.gettempdir(), f"shh_state_{os.getpid()}")
    shutil.rmtree(staging, ignore_errors=True)
    li = table(spark, "/root/testdata/sf0.001", "lineitem").select(
        F.col("l_partkey").cast("string").alias("k")
    )
    li.repartition(3).write.mode("overwrite").parquet(staging)
    pos = F.explode(
        F.array(*[F.lit(i) for i in range(1, _CMS_DEPTH + 1)])
    ).alias("i")
    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
            .select("k", pos)
            .selectExpr("k", "i", _cms_bucket("k", "i", "spark") + " as bucket")
            .groupBy("i", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .writeStream.format("memory")
            .queryName(f"shh_state_{os.getpid()}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(180)
        progress = list(q.recentProgress)
    # The state is keyed by (i, bucket) CELLS: bounded above by
    # depth x width always, and at any SF the final store holds exactly
    # the distinct cells the corpus touches (3,072 of 3,072 from sf0.1
    # up, fewer at sf0.001's small key set) — a regression keying state
    # by anything corpus-grained would blow straight past `touched`.
    touched = (
        li.select("k", pos)
        .selectExpr(_cms_bucket("k", "i", "spark") + " as bucket", "i")
        .distinct()
        .count()
    )
    bound = _CMS_DEPTH * _CMS_WIDTH
    assert touched <= bound
    batches = 0
    last_rows = 0
    for p in progress:
        for s in p.get("stateOperators") or []:
            batches += 1
            assert s["numRowsTotal"] <= bound, (
                f"batch {p.get('batchId')}: state {s['numRowsTotal']} > {bound}"
            )
            assert s["numRowsTotal"] >= last_rows, "state shrank mid-stream"
            last_rows = s["numRowsTotal"]
            assert s["memoryUsedBytes"] < 8 * 1024 * 1024
    assert batches >= 3, f"expected >=3 stateful micro-batches, saw {batches}"
    assert last_rows == touched, (
        f"final state {last_rows} != distinct touched cells {touched}"
    )
    shutil.rmtree(staging, ignore_errors=True)


def test_stream_pattern_match_spans_batch_boundaries(spark):
    """The streaming CEP result must equal the batch window twin AND the
    fixture must actually exercise the carried state: at least one match
    must have its three events split across different time-sliced
    micro-batches (otherwise the cross-batch adjacency logic is
    untested vacuously)."""
    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.catalog import table
    from satellite_data_ingestion_spark.operators.windows import (
        win_pattern_match,
    )
    from satellite_data_ingestion_spark.streaming.custom_state import (
        stream_pattern_match,
    )

    sf = "/root/testdata/sf0.01"
    streamed = {
        tuple(r) for r in stream_pattern_match(spark, sf).collect()
    }
    batch = {tuple(r) for r in win_pattern_match(spark, sf).collect()}
    assert streamed == batch and streamed

    # which time slice (of 4) does each event land in?
    ev = table(spark, sf, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).collect()[0]
    width = (int(hi) - int(lo)) // 4 + 1
    slice_of = {
        r.event_id: (int(r.ts_us) - int(lo)) // width for r in ev.collect()
    }
    spanning = [
        m
        for m in streamed
        if slice_of[m[1]] != slice_of[m[3]]  # view vs purchase slice
    ]
    assert spanning, "no match crossed a micro-batch boundary"


def test_geohash_matches_bisection_reference(spark):
    """The interleave/base32 encoder must equal the classic bisection
    geohash algorithm character-for-character on every corpus point —
    a transposed axis or off-by-one quantization changes prefixes and
    would silently break geohash-prefix partitioning."""
    from satellite_data_ingestion_spark.functions.scalar import fn_geohash

    def gh_ref(lat, lon, p=6):
        b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        latr, lonr = [-90.0, 90.0], [-180.0, 180.0]
        bits = nb = 0
        even, out = True, ""
        while len(out) < p:
            r = lonr if even else latr
            mid = (r[0] + r[1]) / 2
            c = lon if even else lat
            d = 1 if c >= mid else 0
            bits = bits * 2 + d
            r[0 if d else 1] = mid
            even = not even
            nb += 1
            if nb == 5:
                out += b32[bits]
                bits = nb = 0
        return out

    sf = "/root/testdata/sf0.001"
    rows = fn_geohash(spark, sf).collect()
    from satellite_data_ingestion_spark.catalog import table

    coords = {
        r.event_id: (r.user_id % 180 - 90, r.event_id % 360 - 180)
        for r in table(spark, sf, "events").select("event_id", "user_id").collect()
    }
    for r in rows:
        lat, lon = coords[r.event_id]
        assert r.geohash == gh_ref(float(lat), float(lon)), r


def test_bloom_incremental_candidates_are_one_sided(spark):
    """Bloom prefilter soundness: every true duplicate must survive the
    bloom gate (no false negatives — the verify join can only REMOVE
    candidates), so the flagged set equals the exact anti-join
    complement."""
    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.llm.dedup import (
        ext_dedup_bloom_incremental,
        ext_dedup_incremental,
    )

    # sf0.1 is the smallest corpus that plants a cross-split exact dup,
    # so the dup-present half of the assertion is non-vacuous there.
    sf = "/root/testdata/sf0.1"
    flagged = {
        r.doc_id: r.is_dup
        for r in ext_dedup_bloom_incremental(spark, sf).collect()
    }
    admitted = {
        r.doc_id for r in ext_dedup_incremental(spark, sf).collect()
    }
    assert admitted == {d for d, dup in flagged.items() if not dup}
    assert any(flagged.values()), "fixture lost its planted cross-split dup"


def test_containment_is_directional_on_shingles(spark):
    """Shingle containment invariants: (a) identical-text doc pairs are
    mutually contained at 1.0; (b) the relation is genuinely asymmetric
    on this corpus — some contained->container pair has no reverse edge
    (the doc-in-doc signal symmetric Jaccard misses); (c) every emitted
    value respects the 0.9 threshold."""
    from satellite_data_ingestion_spark.llm.dedup import (
        ext_dedup_containment,
    )

    # sf0.1 is the smallest corpus with purely one-directional pairs
    # (7 of 505); at sf0.01 every emitted pair happens to be mutual.
    sf = "/root/testdata/sf0.1"
    pairs = {
        (r.doc_contained, r.doc_container): r.containment
        for r in ext_dedup_containment(spark, sf).collect()
    }
    assert pairs and all(v >= 0.9 for v in pairs.values())
    asym = [k for k in pairs if (k[1], k[0]) not in pairs]
    assert asym, "no asymmetric containment pair found"
    # mutual pairs at 1.0 exist (identical shingle sets — planted dups)
    mutual_ones = [
        k for k, v in pairs.items() if v == 1.0 and pairs.get((k[1], k[0])) == 1.0
    ]
    assert mutual_ones, "no mutual containment-1.0 pair found"


def test_fuzzy_join_recovers_every_dirty_record(spark):
    """Record-linkage ground truth: each dirty name (2nd char deleted)
    must match back to exactly its source name at edit distance 1 —
    recoverable because no two distinct master names are within ED 2 of
    each other on this corpus, which the test also verifies (if the
    generator ever plants closer names, the recovery claim must be
    re-examined, not silently weakened)."""
    import itertools

    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.catalog import table
    from satellite_data_ingestion_spark.operators.joins import join_fuzzy

    sf = "/root/testdata/sf0.01"
    truth = {
        r.p_partkey: r.p_name
        for r in table(spark, sf, "part")
        .filter(F.col("p_partkey") % 7 == 0)
        .collect()
    }
    got = {r.p_partkey: (r.matched_name, r.edit_dist)
           for r in join_fuzzy(spark, sf).collect()}
    assert set(got) == set(truth)
    assert all(got[k] == (truth[k], 1) for k in truth)

    # Separation assumption, scoped to the blocking: within a
    # first-letter block (the only place a dirty record looks), no two
    # distinct master names are within ED 2 — that is what makes the
    # ED-1 recovery unambiguous.  Globally closer names exist ("red
    # ring" / "old ring") but never share a block.
    def ed(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[lb]

    names = [r.p_name for r in
             table(spark, sf, "part").select("p_name").distinct().collect()]
    close = [
        (a, b)
        for a, b in itertools.combinations(names, 2)
        if a[0] == b[0] and ed(a, b) <= 2
    ]
    assert not close, f"block-mate master names within ED 2: {close[:3]}"


def test_url_gate_semantics(spark):
    """Ground-truth the URL battery against the synthesis variables:
    parse recovers host/domain/tld/path-depth exactly, the blocklist
    gate removes precisely the blocked domains + TLD class, and the
    volume cap never exceeds K per domain while keeping a deterministic
    hash-ordered prefix."""
    from satellite_data_ingestion_spark.llm.urlfilter import (
        _BLOCKED_DOMAINS,
        _BLOCKED_TLD,
        _DOMAIN_CAP,
        _SUBS,
        _TLDS,
        ext_domain_volume_cap,
        ext_url_blocklist,
        ext_url_parse,
    )

    sf = "/root/testdata/sf0.001"
    parsed = {r.doc_id: r for r in ext_url_parse(spark, sf).collect()}
    from satellite_data_ingestion_spark.catalog import table

    src = {r.doc_id: r.source for r in table(spark, sf, "documents").collect()}
    assert parsed.keys() == src.keys()
    for did, r in parsed.items():
        sub = _SUBS[did % 3]
        tld = _TLDS[did % 4]
        assert r.host == f"{sub}{src[did]}.{tld}"
        assert r.subdomain == sub.rstrip(".")
        assert r.domain == f"{src[did]}.{tld}"
        assert r.tld == tld
        assert r.path_depth == did % 5
        assert r.has_query == (did % 7 == 0)

    kept = {r.doc_id: r for r in ext_url_blocklist(spark, sf).collect()}
    expect_kept = {
        did
        for did, r in parsed.items()
        if r.tld != _BLOCKED_TLD and r.domain not in _BLOCKED_DOMAINS
    }
    assert set(kept) == expect_kept

    capped = ext_domain_volume_cap(spark, sf).collect()
    by_dom: dict = {}
    for r in capped:
        by_dom.setdefault(r.domain, []).append(r)
    import hashlib

    for dom, rows in by_dom.items():
        assert len(rows) <= _DOMAIN_CAP
        members = sorted(
            (did for did, p in parsed.items() if p.domain == dom),
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
        )
        assert sorted(r.doc_id for r in rows) == sorted(members[: _DOMAIN_CAP])


def test_kmv_estimates_within_sketch_error(spark):
    """KMV with k=64 carries ~1/sqrt(k-2) ≈ 12.7% standard error on set
    sizes (intersection compounds via rho): pin every estimate within
    3-sigma-ish bounds of its exact twin so the sketch is a real
    estimator, not merely hash-stable numbers."""
    from satellite_data_ingestion_spark.operators.scale import (
        ext_kmv_intersection,
    )

    r = ext_kmv_intersection(spark, "/root/testdata/sf0.01").collect()[0]
    assert abs(r.est_a - r.exact_a) / r.exact_a < 0.4
    assert abs(r.est_b - r.exact_b) / r.exact_b < 0.4
    u_exact = r.exact_a + r.exact_b - r.exact_intersection
    assert abs(r.est_union - u_exact) / u_exact < 0.4
    assert abs(r.est_intersection - r.exact_intersection) / r.exact_intersection < 0.5
    # set-algebra consistency of the estimates themselves
    assert r.est_union <= r.est_a + r.est_b
    assert r.est_intersection <= min(r.est_a, r.est_b) * 1.2


def test_mix_temperature_flattens_language_skew(spark):
    """alpha=0.5 sampling must shrink the dominant language's share
    toward sqrt-proportional: en's sample share sits strictly between
    the sqrt-flattened target and its raw corpus share, and every
    language's take matches floor(KEEP * sqrt(n)/sum(sqrt(n)))."""
    import math

    from satellite_data_ingestion_spark.catalog import table
    from satellite_data_ingestion_spark.llm.sampling import (
        _TEMP_KEEP,
        ext_mix_temperature,
    )

    sf = "/root/testdata/sf0.01"
    census = {
        r.lang: r.cnt
        for r in table(spark, sf, "documents").groupBy("lang").count()
        .withColumnRenamed("count", "cnt").collect()
    }
    denom = sum(math.sqrt(n) for n in census.values())
    out = ext_mix_temperature(spark, sf).collect()
    got = {}
    for r in out:
        got[r.lang] = got.get(r.lang, 0) + 1
    for lang, n in census.items():
        assert got.get(lang, 0) == int(_TEMP_KEEP * math.sqrt(n) / denom)
    total = sum(census.values())
    en_raw = census["en"] / total
    en_sample = got["en"] / sum(got.values())
    assert en_sample < en_raw, "temperature must flatten the head"


def test_point_in_polygon_matches_independent_raycast(spark):
    """Ground-truth the fixed-polygon even-odd test against an
    independent pure-Python ray caster, plus known inside/outside
    anchor points."""
    from satellite_data_ingestion_spark.functions.scalar import (
        _PIP_POLY,
        fn_point_in_polygon,
    )

    def ref_inside(px, py):
        n = len(_PIP_POLY)
        c = False
        for i in range(n):
            x1, y1 = _PIP_POLY[i]
            x2, y2 = _PIP_POLY[(i + 1) % n]
            if ((y1 > py) != (y2 > py)) and (
                px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
            ):
                c = not c
        return c

    assert ref_inside(5.0, 2.0) is True      # deep interior
    assert ref_inside(0.1, 0.1) is False     # far corner
    assert ref_inside(5.0, 5.5) is False     # inside the concave notch

    sf = "/root/testdata/sf0.001"
    rows = fn_point_in_polygon(spark, sf).collect()
    assert rows
    mism = [
        r.pt_id
        for r in rows
        if r.inside != ref_inside(r.px, r.py)
    ]
    assert not mism, f"{len(mism)} ray-cast mismatches, e.g. {mism[:5]}"


def test_changepoint_matches_numpy_cusum(spark):
    """The per-series argmax |CUSUM| must equal a numpy recomputation
    from the raw ordered values (exact cents discipline included)."""
    import numpy as np

    from satellite_data_ingestion_spark.catalog import table
    from satellite_data_ingestion_spark.operators.timeseries import (
        ext_ts_changepoint,
    )

    sf = "/root/testdata/sf0.001"
    got = {r.event_type: (r.cp_rn, r.max_dev) for r in
           ext_ts_changepoint(spark, sf).collect()}
    raw = table(spark, sf, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    series: dict = {}
    for r in raw:
        series.setdefault(r.event_type, []).append((r.ts, r.event_id, r.value))
    for et, rows in series.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        cents = np.array([round(v * 100) for _, _, v in rows], dtype=np.int64)
        rn = np.arange(1, len(cents) + 1, dtype=np.float64)
        dev = np.abs(np.cumsum(cents).astype(np.float64) - rn * (cents.sum() / len(cents)))
        best = int(np.argmax(dev))  # numpy argmax takes the first max = min rn
        assert got[et][0] == best + 1, et
        import math
        assert got[et][1] == math.floor((dev[best] / 100.0) * 10000 + 0.5) / 10000.0


def test_dtw_matches_independent_dp(spark):
    """ext_ts_dtw's distances must equal an INDEPENDENTLY-written
    plain-Python DTW (no numpy, no shared code) on the same decimated
    series — exact equality, since the DP over integer-cent costs is
    deterministic.  Also: DTW(q, q) == 0 and DTW >= |sum| lower bound
    sanity."""
    from satellite_data_ingestion_spark.operators.timeseries import (
        _DTW_QUERY_USER,
        _dtw_series,
        ext_ts_dtw,
    )

    sf = "/root/testdata/sf0.001"
    rows = _dtw_series(spark, sf).collect()
    series: dict = {}
    for r in rows:
        series.setdefault(r.user_id, []).append((r.rn, r.cents))
    q = [c for _, c in sorted(series[_DTW_QUERY_USER])]

    def ref_dtw(a, b):
        INF = float("inf")
        m, n = len(a), len(b)
        dp = [[INF] * (n + 1) for _ in range(m + 1)]
        dp[0][0] = 0.0
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                c = abs(a[i - 1] - b[j - 1])
                dp[i][j] = c + min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1])
        return dp[m][n]

    assert ref_dtw(q, q) == 0.0
    import math

    got = {r.user_id: r.dtw for r in ext_ts_dtw(spark, sf).collect()}
    assert got, "empty DTW result"
    for uid, d in got.items():
        s = [c for _, c in sorted(series[uid])]
        expect = math.floor(ref_dtw(q, s) * 100 + 0.5) / 100.0
        assert d == expect, (uid, d, expect)


def test_compression_ratio_invariants(spark):
    """The zlib quality signal must (a) reproduce exactly across runs,
    (b) stay within sane deflate bounds for token text, and (c) compress
    a repeated document FURTHER than its single copy — the property that
    makes it a repetition detector."""
    import zlib

    from satellite_data_ingestion_spark.llm.textstats import (
        ext_compression_ratio,
    )

    sf = "/root/testdata/sf0.001"
    a = {r.doc_id: (r.n_bytes, r.ratio_bp)
         for r in ext_compression_ratio(spark, sf).collect()}
    b = {r.doc_id: (r.n_bytes, r.ratio_bp)
         for r in ext_compression_ratio(spark, sf).collect()}
    assert a == b, "ratio must be deterministic across runs"
    assert a, "empty output"
    for did, (n, bp) in a.items():
        assert 0 < bp < 10000 + 2000, (did, bp)  # deflate overhead bound
    # repetition compresses further
    text = "the quick brown token stream " * 4
    one = len(zlib.compress(text.encode(), 6)) / len(text.encode())
    ten = len(zlib.compress((text * 10).encode(), 6)) / (len(text.encode()) * 10)
    assert ten < one


def test_distributed_rank_matches_single_task_window(spark):
    """ranking.distributed_rank must reproduce row_number / running sum /
    ntile from a plain unpartitioned window EXACTLY (the thing it exists
    to replace without the single-task WindowExec), including with a
    descending sort expression, skewed values, and n % k != 0 ntiles."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from satellite_data_ingestion_spark.operators.ranking import (
        distributed_rank,
        ntile_from_rank,
    )

    n = 1003  # deliberately not divisible by 5 or 32
    df = spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 2654435761) % 97).cast("long").alias("v"),
    )
    got = distributed_rank(df, [F.desc("v"), "k"], sum_cols=("v",)).select(
        "k",
        "_rk",
        "_n_total",
        F.col("_cum_v").cast("long").alias("cum"),
        F.col("_tot_v").cast("long").alias("tot"),
        ntile_from_rank(5, F.col("_rk"), F.col("_n_total")).alias("nt"),
    )
    w = Window.orderBy(F.desc("v"), "k")
    want = df.select(
        "k",
        F.row_number().over(w).cast("long").alias("_rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("_n_total"),
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
        F.sum("v").over(Window.partitionBy()).cast("long").alias("tot"),
        F.ntile(5).over(w).cast("long").alias("nt"),
    )
    g = {r.k: (r._rk, r._n_total, r.cum, r.tot, r.nt) for r in got.collect()}
    e = {r.k: (r._rk, r._n_total, r.cum, r.tot, r.nt) for r in want.collect()}
    assert g == e
    # n < k edge: every row is its own bucket
    tiny = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    t = distributed_rank(tiny, ["v", "k"]).select(
        "k", ntile_from_rank(5, F.col("_rk"), F.col("_n_total")).alias("nt")
    )
    assert {r.k: r.nt for r in t.collect()} == {0: 1, 1: 2, 2: 3}


def test_distributed_rank_invariant_without_exchange_reuse(spark):
    """distributed_rank's two consumers of the range exchange (local ranks
    and per-partition counts) must agree on _pid even when Spark does NOT
    reuse the exchange — repartitionByRange's boundary sampling is
    deterministic per (input, partition index), so two independent
    executions of the exchange land every row in the same range bucket.
    This pins that property (ADVICE r12): with exchange reuse and AQE both
    disabled, _rk must still be an exact 1..n bijection and the running
    sum must end at the grand total for EVERY partition-boundary layout.
    A reuse regression or a sampling-determinism change fails loudly here
    instead of silently corrupting every distributed_rank caller."""
    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.operators.ranking import distributed_rank

    n = 4111
    df = spark.range(n).repartition(7).select(
        F.col("id").alias("k"),
        ((F.col("id") * 1103515245 + 12345) % 2039).cast("long").alias("v"),
    )
    old_reuse = spark.conf.get("spark.sql.exchange.reuse", "true")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        r = distributed_rank(df, [F.desc("v"), "k"], sum_cols=("v",))
        chk = r.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("_rk").alias("n_rk"),
            F.min("_rk").alias("lo"),
            F.max("_rk").alias("hi"),
            F.max("_n_total").alias("ntot"),
            F.max(F.when(F.col("_rk") == n, F.col("_cum_v"))).alias("last_cum"),
            F.max("_tot_v").alias("tot"),
            F.sum("v").alias("true_tot"),
        ).collect()[0]
        assert (chk.n, chk.n_rk, chk.lo, chk.hi, chk.ntot) == (n, n, 1, n, n), chk
        assert chk.last_cum == chk.tot == chk.true_tot, chk
        # order invariant: _rk sorted by (v desc, k) is the identity
        bad = r.select(
            "_rk", F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .orderBy(F.desc("v"), "k")
            ).alias("truth")
        ).filter(F.col("_rk") != F.col("truth")).count()
        assert bad == 0
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old_reuse)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_minhash_index_maintenance_equals_rebuild(spark):
    """The transactionally-maintained band index must be INDISTINGUISHABLE
    from a from-scratch rebuild over the whole corpus (exact frame
    equality), and tick 2's near-dups against tick-1 docs must be caught
    via the index tick 1 committed — with recall >= 0.95 vs the exact
    cross-batch Jaccard join (the minhash recall bound)."""
    import os

    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.llm import dedup
    from satellite_data_ingestion_spark.llm.dedup import (
        _band_rows,
        _token_sets,
        minhash_signatures,
        pipeline_minhash_index_maintain,
    )
    from satellite_data_ingestion_spark.sources.delta_log import DeltaLogTable

    sf = "/root/testdata/sf0.001"
    hits = pipeline_minhash_index_maintain(spark, sf).collect()
    root = dedup._LAST_MAINTAIN_ROOT
    assert root is not None

    # (1) maintained index == rebuild, exact frame equality both ways
    maintained = DeltaLogTable(spark, os.path.join(root, "bands")).read()
    rebuilt = _band_rows(
        minhash_signatures(_token_sets(spark, sf).select("doc_id", "toks"))
    )
    assert maintained.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(maintained).count() == 0

    # (2) tick-2 hits against earlier ticks, recall vs exact Jaccard
    docs = _token_sets(spark, sf).select("doc_id", "toks")
    old = docs.filter(F.col("doc_id") % 3 < 2).select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta")
    )
    new = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb")
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    truth = {
        (r.doc_a, r.doc_b)
        for r in old.join(new)
        .filter(inter.cast("double") / union >= dedup._JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .collect()
    }
    got2 = {(r.doc_a, r.doc_b) for r in hits if r.tick == 2}
    assert truth, "corpus must contain cross-batch near-dups for this pin"
    recall = len(got2 & truth) / len(truth)
    assert recall >= 0.95, f"tick-2 recall {recall:.3f} < 0.95"
    # every reported pair must be a true near-dup (verification is exact)
    assert got2 <= truth


def test_embedding_pca_matches_independent_numpy(spark):
    """ext_embedding_pca's distributed quantized-Gram decomposition must
    reproduce an independent single-machine PCA exactly (same quantized
    Gram -> identical spectrum), with an orthonormal, variance-ordered
    basis and the documented sign convention."""
    import numpy as np

    from satellite_data_ingestion_spark.llm.embedding_stats import (
        _PCA_COMPONENTS,
        ext_embedding_pca,
    )

    sf = "/root/testdata/sf0.001"
    got = {r.vec_id: tuple(r[f"pc{i+1}"] for i in range(_PCA_COMPONENTS))
           for r in ext_embedding_pca(spark, sf).collect()}

    emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    ids = [r.vec_id for r in emb]
    m = np.array([r.embedding for r in emb], dtype=np.float64)
    q = np.rint(m * 1e6).astype(np.int64)
    n = len(q)
    s = q.sum(axis=0).astype(np.float64) / 1e6
    g = (q.T @ q).astype(np.float64) / 1e12
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:_PCA_COMPONENTS]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    # orthonormal, variance-ordered basis
    assert np.allclose(comps @ comps.T, np.eye(_PCA_COMPONENTS), atol=1e-10)
    assert vals[order[0]] >= vals[order[1]] > 0
    pcs = np.floor((m - mu) @ comps.T * 1e6 + 0.5) / 1e6
    for k, vid in enumerate(ids):
        want = tuple(pcs[k])
        have = got[vid]
        for a, b in zip(have, want):
            assert abs(a - b) <= 1e-6, (vid, have, want)


def test_ivf_index_maintain_equals_rebuild(spark):
    """The transactionally-maintained IVF list table must be exactly the
    one-shot assignment of the full corpus under the same quantizer, and
    every tick-t probe hit must point at a vector from a batch < t (the
    standing index, never the in-flight batch)."""
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from satellite_data_ingestion_spark.llm import simsearch
    from satellite_data_ingestion_spark.llm.simsearch import (
        _train_centroids,
        pipeline_ivf_index_maintain,
    )
    from satellite_data_ingestion_spark.sources.delta_log import DeltaLogTable
    from satellite_data_ingestion_spark.catalog import table

    sf = "/root/testdata/sf0.001"
    hits = pipeline_ivf_index_maintain(spark, sf).collect()
    root = simsearch._LAST_IVF_MAINTAIN_ROOT
    assert root is not None

    # (1) tick isolation: neighbors come strictly from earlier batches
    assert len(hits) > 0
    for r in hits:
        assert r.tick >= 1, r  # tick 0 has no standing index to probe
        assert r.nn_id % 3 < r.tick, r

    # (2) maintained table == one-shot rebuild, exact frame equality
    emb = table(spark, sf, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    cents = _train_centroids(
        emb.filter(F.col("vec_id") % 3 == 0), k=simsearch._IVFM_K
    )
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    nearest_cell = simsearch._nearest_cell_udf(Cn)
    rebuilt = emb.select("vec_id", vec.alias("v"), nearest_cell(vec).alias("cid"))
    maintained = DeltaLogTable(spark, os.path.join(root, "lists")).read().select(
        "vec_id", "v", "cid"
    )
    assert maintained.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(maintained).count() == 0


def test_hll_sketch_rollup_error_bound(spark):
    """Unioned nation sketches must estimate region NDV within 5% of
    exact at every smoke scale (customers partition by nation, so the
    exact region NDV is the nation sum)."""
    from satellite_data_ingestion_spark import registry

    registry.load_all()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = registry.spec("agg_hll_sketch_rollup").fn(spark, sf).collect()
        assert len(rows) == 5
        for r in rows:
            assert r.within_5pct, (sf, r)

def test_fixed_width_overflow_raises_at_write(spark):
    """_fw_fixed must REFUSE to truncate: a value wider than its fixed
    width raises at stage-write time (ADVICE r12 — F.lpad silently chops,
    which would corrupt the staged file and surface only as a downstream
    hash mismatch)."""
    import pyspark.sql.functions as F
    import pytest as _pt

    from satellite_data_ingestion_spark.sources.binary import _fw_fixed

    ok = spark.range(1).select(_fw_fixed(F.lit(42), 4).alias("v")).collect()
    assert ok[0].v == "0042"
    with _pt.raises(Exception, match="fixed-width overflow"):
        spark.range(1).select(_fw_fixed(F.lit(123456), 4).alias("v")).collect()


def test_skyline_adversarial_monotone(spark):
    """VERDICT r12 task 6: on the skyline-hostile distribution (qty
    strictly monotone in price) NOTHING dominates anything — the true
    skyline is the WHOLE input and the bucket prune keeps everything, so
    the dominance sweep's input is the full table.  distributed_prev_max
    must (a) still be exact there and (b) plan the sweep as a
    rangepartitioning exchange + _pid-partitioned local windows — bounded
    by construction, not by TPC-H's shape."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from satellite_data_ingestion_spark.operators.ranking import (
        distributed_prev_max,
    )

    n = 20011
    pts = spark.range(n).select(
        (F.col("id") * 100 + 7).alias("price_c"),
        (F.col("id") + 1).alias("qty"),  # strictly monotone with price
    )
    swept = distributed_prev_max(pts, [F.asc("price_c"), F.desc("qty")], "qty")
    survivors = swept.filter(
        F.col("qty") > F.coalesce("_prevmax", F.lit(-1))
    ).count()
    assert survivors == n  # every row is Pareto-optimal here
    # exactness vs the single-task truth on the same frame
    w = Window.orderBy(F.asc("price_c"), F.desc("qty")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    truth = pts.select("price_c", F.max("qty").over(w).alias("pm"))
    got = swept.select("price_c", F.col("_prevmax").alias("pm"))
    assert got.exceptAll(truth).count() == 0 and truth.exceptAll(got).count() == 0
    # bounded by construction: the sweep rides a range exchange, and the
    # only unpartitioned window is the |partitions|-row carry-in frame
    plan = swept._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # The helper pins its range shuffle with a localCheckpoint (round 14:
    # two-branch _pid agreement under nondeterministic inputs), so the
    # ranged frame surfaces as a materialized scan feeding _pid windows.
    import re as _re

    assert "rangepartitioning" in plan or "ExistingRDD" in plan, plan[:2000]
    assert _re.search(r"windowspecdefinition\(_pid", plan), plan[:2000]


def test_decontaminate_longest_match_constructed(spark):
    """Constructed-contamination truth table for the >=13-gram gate
    (VERDICT r12 task 4): exact longest-run reporting, sub-threshold runs
    invisible, multiple islands resolved to the max, short docs kept."""
    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.llm.dedup import (
        decontaminate_longest_match,
    )

    b = [f"b{i}" for i in range(40)]  # 40 distinct benchmark tokens
    bench = spark.createDataFrame(
        [(100, " ".join(b))], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # 15-token verbatim span from the benchmark -> longest 15, drop
            (1, "x1 x2 " + " ".join(b[5:20]) + " x3 x4"),
            # only a 12-token run: below the 13-gram unit -> 0, keep
            (2, "y1 " + " ".join(b[0:12]) + " y2"),
            # nothing shared
            (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12 z13 z14"),
            # two islands, 13 and 18 tokens -> longest 18, drop
            (4, " ".join(b[0:13]) + " q1 q2 " + " ".join(b[20:38])),
            # shorter than the n-gram unit entirely
            (5, "w1 w2 w3 w4 w5"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.longest_shared_run, r.drop_doc)
        for r in decontaminate_longest_match(corpus, bench).collect()
    }
    assert got == {
        1: (15, True),
        2: (0, False),
        3: (0, False),
        4: (18, True),
        5: (0, False),
    }, got


def test_unigram_train_matches_independent_reference():
    """llm/unigram.train_unigram must agree with an INDEPENDENTLY-written
    reference (recursive memoized Viterbi + per-word Counter EM loop; the
    engine uses an iterative DP + dict folding) on released pieces AND
    log-probs, across several vocab sizes (VERDICT r12 task 3)."""
    import math
    from collections import Counter
    from functools import lru_cache

    from satellite_data_ingestion_spark.llm import unigram as U

    hist = [
        ("the", 50), ("then", 11), ("than", 9), ("that", 30),
        ("toast", 3), ("roast", 4), ("coast", 5), ("cost", 7),
        ("a", 40), ("at", 22), ("ate", 6), ("rate", 8), ("rat", 5),
        ("window", 4), ("widow", 2), ("win", 9), ("dow", 1),
    ]

    def ref_train(hist, vocab_size):
        # seed: substring counts, top-N multi-char + all chars
        cnt = Counter()
        chars = set()
        for w, f in hist:
            chars.update(w)
            for i in range(len(w)):
                for j in range(i + 1, min(len(w), i + U._MAX_PIECE) + 1):
                    cnt[w[i:j]] += f
        multi = sorted(
            (p for p in cnt if len(p) > 1), key=lambda p: (-cnt[p], p)
        )[: max(0, U._SEED - len(chars))]
        probs = {p: cnt[p] for p in chars | set(multi)}
        tot = sum(probs.values())
        probs = {p: c / tot for p, c in sorted(probs.items())}

        def best_seg(word, logp):
            @lru_cache(maxsize=None)
            def rec(i):
                if i == 0:
                    return (0.0, 0, ())
                out = None
                for j in range(max(0, i - U._MAX_PIECE), i):
                    piece = word[j:i]
                    lp = logp.get(piece)
                    if lp is None:
                        if i - j > 1:
                            continue
                        lp = U._UNK_LOGP
                    s, np_, seq = rec(j)
                    cand = (s + lp, np_ + 1, seq + (piece,))
                    key = (cand[0], -cand[1])
                    if (
                        out is None
                        or key > (out[0], -out[1])
                        or (key == (out[0], -out[1]) and list(cand[2]) < list(out[2]))
                    ):
                        out = cand
                return out

            return list(rec(len(word))[2])

        def em(probs):
            logp = {p: math.log(q) for p, q in probs.items() if q > 0}
            c = Counter()
            for w, f in hist:
                for piece in best_seg(w, logp):
                    c[piece] += f
            return c

        while True:
            counts = Counter()
            for _ in range(U._EM_ITERS):
                counts = em(probs)
                tot = sum(counts.values())
                probs = {
                    p: (counts[p] / tot) if counts[p] else 1e-12 for p in probs
                }
            prunable = sorted(
                (p for p in probs if len(p) > 1),
                key=lambda p: (-counts[p], p),
            )
            room = vocab_size - len(chars)
            if len(prunable) <= max(0, room):
                break
            keep_n = max(room, int(len(prunable) * (1 - U._PRUNE_FRAC)))
            if keep_n >= len(prunable):
                keep_n = max(0, room)
            probs = {p: probs[p] for p in chars | set(prunable[:keep_n])}
        counts = em(probs)
        tot = sum(counts.values())
        out = [(p, math.log(counts[p] / tot)) for p in probs if counts[p]]
        out += [(p, U._UNK_LOGP) for p in probs if not counts[p]]
        return sorted(out, key=lambda t: (-t[1], t[0]))

    for vs in (12, 20, 40):
        got = U.train_unigram(hist, vocab_size=vs)
        want = ref_train(hist, vs)
        assert [p for p, _ in got] == [p for p, _ in want], (vs, got, want)
        for (pg, lg), (pw, lw) in zip(got, want):
            assert abs(lg - lw) < 1e-12, (vs, pg, lg, lw)
        # lossless round-trip for every training word
        logp = dict(got)
        for w, _f in hist:
            seg = U.viterbi(w, logp)
            assert "".join(seg) == w, (w, seg)
    # unknown character falls back to a single UNK-floored char piece
    seg = U.viterbi("thezq", dict(U.train_unigram(hist, 20)))
    assert "".join(seg) == "thezq"


def test_unigram_vs_bpe_fertility(spark):
    """The tokenizer-comparison readout (VERDICT r12 task 3): per-lang
    fertility for the unigram-LM vocabulary next to ext_tokenizer_fertility's
    BPE numbers.  On this corpus the 64-piece unigram vocab covers whole
    words (31-type corpus vocabulary), so unigram fertility must be >= 1
    and <= BPE's in every language — and both accountings must agree on
    the word counts exactly."""
    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.catalog import table
    from satellite_data_ingestion_spark.llm.bpe import ext_tokenizer_fertility
    from satellite_data_ingestion_spark.llm.unigram import ext_unigram_tokenize

    sf = "/root/testdata/sf0.001"
    bpe = {r.lang: r for r in ext_tokenizer_fertility(spark, sf).collect()}
    uni_counts = ext_unigram_tokenize(spark, sf)
    langs = table(spark, sf, "documents").select("doc_id", "lang")
    uni = {
        r.lang: r
        for r in uni_counts.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_words").alias("words"),
            F.sum("n_tokens").alias("tokens"),
        )
        .collect()
    }
    assert set(uni) == set(bpe)
    for lang, u in uni.items():
        uf = u.tokens / u.words
        assert 1.0 <= uf <= bpe[lang].fertility + 1e-9, (lang, uf, bpe[lang])


def test_rouge_l_matches_reference_dp(spark):
    """ext_rouge_l's vectorized numpy LCS (prefix-max row update) must
    equal the textbook O(n*m) two-loop DP on every corpus pair."""
    from tests.conftest import SF_SMOKE

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.catalog import table
    from satellite_data_ingestion_spark.llm.textstats import _BLEU_STRIDE, _ROUGE_CAP

    rows = registry.spec("ext_rouge_l").fn(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.text.split(" ")[:_ROUGE_CAP]
        for r in table(spark, SF_SMOKE, "documents").collect()
    }

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

    assert rows, "no pairs scored"
    for r in rows:
        assert r.pid % _BLEU_STRIDE == 0
        expect = lcs_ref(docs[r.pid], docs[r.pid + 1])
        assert r.lcs == expect, f"pair {r.pid}: {r.lcs} != {expect}"
        p, q = r.lcs / r.clen, r.lcs / r.rlen
        f1 = 0.0 if r.lcs == 0 else 2 * p * q / (p + q)
        import math

        assert abs(r.rouge_l_f1 - math.floor(f1 * 1e6 + 0.5) / 1e6) < 1e-12


def test_normal_cdf_polynomial_accuracy(spark):
    """fn_normal_cdf's A&S 26.2.17 polynomial must stay within its
    published 7.5e-8 bound of the exact CDF (via math.erf) across the
    whole grid — and hit the anchor points a reader would check."""
    import math

    from tests.conftest import SF_SMOKE

    from satellite_data_ingestion_spark import registry

    rows = registry.spec("fn_normal_cdf").fn(spark, SF_SMOKE).collect()
    assert len(rows) == 81
    for r in rows:
        exact = 0.5 * (1 + math.erf(r.z / math.sqrt(2)))
        # r.phi is quantized to 1e-6; allow bound + quantization.
        assert abs(r.phi - exact) < 7.5e-8 + 5e-7, (r.z, r.phi, exact)
    byz = {round(r.z, 1): r.phi for r in rows}
    assert abs(byz[0.0] - 0.5) < 1e-6
    assert abs(byz[1.6] - 0.945201) < 2e-6  # Phi(1.6)
    assert abs(byz[-1.6] - (1 - 0.945201)) < 2e-6  # symmetry


def test_bleu_single_token_docs_no_crash(spark, tmp_path):
    """ADVICE r13: a 1-token candidate (split('') == ['']) used to build
    sequence(1, 0) = the DESCENDING [1, 0] and element_at threw,
    killing the whole query; the DuckDB oracle's generate_series(1, 0)
    is empty.  Pin: 1-token docs yield empty bigram arrays, the query
    completes, and zero/NULL clipped overlap gives a defined bleu2=0.0
    (standard corpus-BLEU zero handling) instead of NULL/ln(0)."""
    import os

    from satellite_data_ingestion_spark import registry

    docs = spark.createDataFrame(
        [(0, ""), (1, "a b c"), (10, "x"), (11, "x y z")],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "documents.parquet"))
    rows = registry.spec("ext_bleu").fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_pairs == 2 and r.clen == 2 and r.rlen == 6
    assert r.p1 == 0.5  # 'x' overlaps its reference; '' does not
    assert r.p2 is None  # no bigrams exist on the candidate side at all
    assert r.bleu2 == 0.0  # defined zero, not NULL, matching the oracle CASE


def test_staging_fingerprint_invalidation(tmp_path):
    """VERDICT r13 task 2: the cross-process staging key must be stable
    for unchanged (data, code), and must roll when the input table's
    mtime changes, when a producing module's bytes change, or when the
    input path differs — stale-artifact reuse is impossible by key
    construction."""
    import os

    from satellite_data_ingestion_spark.operators.scans import _staging_fingerprint

    d = tmp_path / "sf_fp"
    d.mkdir()
    (d / "documents.parquet").write_bytes(b"data-v1")
    mod = tmp_path / "mod.py"
    mod.write_bytes(b"code-v1")

    k1 = _staging_fingerprint(str(d), "documents.parquet", str(mod))
    assert k1 == _staging_fingerprint(str(d), "documents.parquet", str(mod))

    # data regeneration (mtime bump) rolls the key
    os.utime(d / "documents.parquet", ns=(1, 2_000_000_001))
    k2 = _staging_fingerprint(str(d), "documents.parquet", str(mod))
    assert k2 != k1

    # code change rolls the key
    mod.write_bytes(b"code-v2")
    assert _staging_fingerprint(str(d), "documents.parquet", str(mod)) != k2

    # same-basename fixture dirs in different parents get distinct keys
    other = tmp_path / "elsewhere" / "sf_fp"
    other.mkdir(parents=True)
    (other / "documents.parquet").write_bytes(b"data-v1")
    assert _staging_fingerprint(str(other), "documents.parquet", str(mod)) != (
        _staging_fingerprint(str(d), "documents.parquet", str(mod))
    )


def test_quality_classifier_enriches_target(spark):
    """ext_quality_classifier's whole point (the DSIR-style property):
    docs the gate keeps must be enriched in the target class.  On the
    train slice the fitted weights must tilt strongly at any SF; on the
    HELD-OUT slice (docs that never influenced the weights) the tilt
    must hold at sf0.01 where there is enough signal to generalize
    (at sf0.001's 500 docs the hashed bigrams memorize the train
    slice — measured and expected, not asserted)."""
    from tests.conftest import SF_SMOKE

    from satellite_data_ingestion_spark import registry

    fn = registry.spec("ext_quality_classifier").fn

    rows = fn(spark, SF_SMOKE).collect()
    train = [r for r in rows if not r.heldout]
    kept = [r for r in train if r.keep]
    base = sum(r.lang == "en" for r in train) / len(train)
    tilt = sum(r.lang == "en" for r in kept) / len(kept)
    assert tilt > base + 0.1, f"train tilt too weak: {tilt:.3f} vs {base:.3f}"
    # keep flag must be exactly logit > 0 and heldout exactly doc_id % 3 == 0
    for r in rows:
        assert r.keep == (r.logit > 0)
        assert r.heldout == (r.doc_id % 3 == 0)

    rows01 = fn(spark, "/root/testdata/sf0.01").collect()
    held = [r for r in rows01 if r.heldout]
    kept01 = [r for r in held if r.keep]
    base01 = sum(r.lang == "en" for r in held) / len(held)
    tilt01 = sum(r.lang == "en" for r in kept01) / len(kept01)
    assert tilt01 > base01, f"no out-of-sample enrichment: {tilt01:.3f} vs {base01:.3f}"


def test_effect_size_known_values(spark, tmp_path):
    """agg_effect_size formulas pinned on a constructed fixture with a
    hand-computable effect: purchase values {10,20,30}, view values
    {10,10,10,20} => pooled SD and the three ratios are checked against
    the textbook formulas computed independently here."""
    import math
    import os

    from satellite_data_ingestion_spark import registry

    rows_in = [
        (0, "2024-01-01T00:00:00", 1, "purchase", 10.0, "{}"),
        (1, "2024-01-01T00:00:01", 2, "purchase", 20.0, "{}"),
        (2, "2024-01-01T00:00:02", 3, "purchase", 30.0, "{}"),
        (3, "2024-01-01T00:00:03", 4, "view", 10.0, "{}"),
        (4, "2024-01-01T00:00:04", 5, "view", 10.0, "{}"),
        (5, "2024-01-01T00:00:05", 6, "view", 10.0, "{}"),
        (6, "2024-01-01T00:00:06", 7, "view", 20.0, "{}"),
        (7, "2024-01-01T00:00:07", 8, "click", 999.0, "{}"),  # excluded
    ]
    df = spark.createDataFrame(
        rows_in,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "events.parquet"))
    (r,) = registry.spec("agg_effect_size").fn(spark, str(tmp_path)).collect()
    a, b = [1000, 2000, 3000], [1000, 1000, 1000, 2000]  # cents
    ma, mb = sum(a) / 3, sum(b) / 4
    va = sum((x - ma) ** 2 for x in a) / 2
    vb = sum((x - mb) ** 2 for x in b) / 3
    pooled = math.sqrt((2 * va + 3 * vb) / 5)
    d = (ma - mb) / pooled
    g = d * (1 - 3 / (4 * 7 - 9))
    glass = (ma - mb) / math.sqrt(vb)
    q = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    assert (r.na, r.nb) == (3, 4)
    assert r.cohens_d == q(d)
    assert r.hedges_g == q(g)
    assert r.glass_delta == q(glass)


def test_bayes_ab_matches_independent_lgamma_sum(spark, tmp_path):
    """agg_bayes_ab's lnfact-grid evaluation must equal the same closed
    form computed independently with math.lgamma on a constructed
    fixture (A: 2/8 conversions, B: 5/7), and sanity: more B conversions
    on fewer trials => P(B beats A) well above one half."""
    import math
    import os

    from pyspark.sql import functions as F

    from satellite_data_ingestion_spark import registry

    rows = []
    eid = 0
    for grp_even, conv, total in ((True, 2, 8), (False, 5, 7)):
        for j in range(total):
            uid = 2 * j if grp_even else 2 * j + 1
            et = "purchase" if j < conv else "view"
            rows.append((eid, "2024-01-01T00:00:00", uid, et, 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "events.parquet"))
    (r,) = registry.spec("agg_bayes_ab").fn(spark, str(tmp_path)).collect()
    aa, ba, ab, bb = 3, 7, 6, 3  # conv+1, trials-conv+1 per group
    assert (
        r.alpha_posterior_a,
        r.beta_posterior_a,
        r.alpha_posterior_b,
        r.beta_posterior_b,
    ) == (aa, ba, ab, bb)

    def lnB(x, y):
        return math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)

    p = sum(
        math.exp(lnB(aa + i, ba + bb) - math.log(bb + i) - lnB(1 + i, bb) - lnB(aa, ba))
        for i in range(ab)
    )
    assert r.prob_b_beats_a == math.floor(p * 1e4 + 0.5) / 1e4
    assert r.prob_b_beats_a > 0.9


def test_frozen_merges_equal_uniform_vocab_training():
    """ext_tokenizer_fertility_frozen's FROZEN_MERGES constant must be
    exactly what learn_merges produces over the fixed 30-word corpus
    vocabulary at uniform weights — the constant is derived, not
    arbitrary, and drifts loudly if either side changes."""
    from satellite_data_ingestion_spark.llm.bpe import FROZEN_MERGES, learn_merges

    vocab = [
        "spark", "window", "merge", "table", "column", "vector", "stream",
        "value", "data", "small", "join", "filter", "big", "group", "hash",
        "customer", "sort", "order", "slow", "line", "part", "fast", "the",
        "row", "agg", "key", "query", "a", "scan", "batch",
    ]
    assert learn_merges([(w, 1) for w in vocab], n_merges=24) == FROZEN_MERGES


def test_bayes_ab_sf01_grid_covers_and_matches_lgamma(spark):
    """Regression (round 14, found live): the lnfact grid was sized 60k
    while sf0.1's largest lgamma argument is ~total events + 2 = 100k —
    the lookup inner-join silently DROPPED sum terms and underestimated
    the probability.  Pin: at sf0.1 the engine equals the independent
    math.lgamma evaluation exactly (and the loud overflow guard exists
    for corpora beyond the grid)."""
    import math

    import duckdb

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.operators.hypothesis import _BAYES_GRID

    con = duckdb.connect()
    (ga, gb) = con.sql(
        """SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END g,
                  count(*) t,
                  sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) c
           FROM read_parquet('/root/testdata/sf0.1/events.parquet')
           GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    aa, ba = int(ga[2]) + 1, int(ga[1] - ga[2]) + 1
    ab, bb = int(gb[2]) + 1, int(gb[1] - gb[2]) + 1
    assert aa + ab + ba + bb - 2 <= _BAYES_GRID, "grid must cover sf0.1"

    def lnB(x, y):
        return math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)

    p = sum(
        math.exp(lnB(aa + i, ba + bb) - math.log(bb + i) - lnB(1 + i, bb) - lnB(aa, ba))
        for i in range(ab)
    )
    (r,) = registry.spec("agg_bayes_ab").fn(spark, "/root/testdata/sf0.1").collect()
    assert r.prob_b_beats_a == math.floor(p * 1e4 + 0.5) / 1e4


def _write_events(spark, tmp_path, rows_in):
    import os

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows_in,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "events.parquet"))


def test_anova_two_way_balanced_matches_classical(spark, tmp_path):
    """agg_anova_two_way's contrast-based Type III SS must equal the
    CLASSICAL balanced-design formulas (a genuinely different algebra
    path) on a balanced 2x2 fixture: 3 obs per cell, AM = hour < 12."""
    import math

    from satellite_data_ingestion_spark import registry

    # cells: (purchase, AM) (purchase, PM) (view, AM) (view, PM)
    vals = {
        ("purchase", 1): [10.0, 12.0, 14.0],
        ("purchase", 13): [20.0, 22.0, 30.0],
        ("view", 1): [8.0, 9.0, 10.0],
        ("view", 13): [11.0, 12.0, 16.0],
    }
    rows_in, eid = [], 0
    for (etype, hh), vs in vals.items():
        for v in vs:
            rows_in.append((eid, f"2024-01-01T{hh:02d}:00:{eid:02d}", eid, etype, v, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows_in)
    (r,) = registry.spec("agg_anova_two_way").fn(spark, str(tmp_path)).collect()

    cents = {k: [v * 100 for v in vs] for k, vs in vals.items()}
    m = {k: sum(vs) / len(vs) for k, vs in cents.items()}
    grand = sum(sum(vs) for vs in cents.values()) / 12
    ssw = sum(sum((x - sum(vs) / 3) ** 2 for x in vs) for vs in cents.values())
    msw = ssw / (12 - 4)
    # classical balanced two-way SS (r=3 per cell, 2 levels each factor)
    m_a = {
        "purchase": (m[("purchase", 1)] + m[("purchase", 13)]) / 2,
        "view": (m[("view", 1)] + m[("view", 13)]) / 2,
    }
    m_b = {
        1: (m[("purchase", 1)] + m[("view", 1)]) / 2,
        13: (m[("purchase", 13)] + m[("view", 13)]) / 2,
    }
    ss_a = 6 * sum((v - grand) ** 2 for v in m_a.values())
    ss_b = 6 * sum((v - grand) ** 2 for v in m_b.values())
    ss_ab = 3 * sum(
        (m[(a, b)] - m_a[a] - m_b[b] + grand) ** 2
        for a in ("purchase", "view")
        for b in (1, 13)
    )
    q = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    assert r.n_total == 12
    assert abs(r.f_type - q(ss_a / msw)) <= 1e-6
    assert abs(r.f_ampm - q(ss_b / msw)) <= 1e-6
    assert abs(r.f_interaction - q(ss_ab / msw)) <= 1e-6


def test_tukey_hsd_known_values(spark, tmp_path):
    """agg_tukey_hsd pinned on a 3-group fixture: pair count = 3, and
    each q statistic equals the Tukey-Kramer formula computed here."""
    import math

    from satellite_data_ingestion_spark import registry

    groups = {
        "click": [10.0, 12.0, 14.0],
        "purchase": [20.0, 25.0, 30.0, 35.0],
        "view": [9.0, 10.0, 11.0],
    }
    rows_in, eid = [], 0
    for etype, vs in groups.items():
        for v in vs:
            rows_in.append((eid, f"2024-01-01T00:00:{eid:02d}", eid, etype, v, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows_in)
    out = registry.spec("agg_tukey_hsd").fn(spark, str(tmp_path)).collect()
    assert len(out) == 3  # 3 choose 2
    cents = {k: [v * 100 for v in vs] for k, vs in groups.items()}
    means = {k: sum(vs) / len(vs) for k, vs in cents.items()}
    nn = {k: len(vs) for k, vs in cents.items()}
    ssw = sum(sum((x - means[k]) ** 2 for x in vs) for k, vs in cents.items())
    msw = ssw / (sum(nn.values()) - 3)
    q = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    for r in out:
        qstat = abs(means[r.grp_a] - means[r.grp_b]) / math.sqrt(
            msw / 2 * (1 / nn[r.grp_a] + 1 / nn[r.grp_b])
        )
        assert r.grp_a < r.grp_b
        assert (r.na, r.nb) == (nn[r.grp_a], nn[r.grp_b])
        assert abs(r.mean_diff_cents - q(means[r.grp_a] - means[r.grp_b])) <= 1e-6
        assert abs(r.q_stat - q(qstat)) <= 1e-6


def test_partial_corr_and_ols_multi_vs_numpy(spark, tmp_path):
    """agg_partial_corr and agg_ols_multi must reproduce numpy's
    independent linear algebra (corrcoef + lstsq) on a constructed
    lineitem fixture with integral quantities/discount-pct."""
    import math
    import os

    import numpy as np

    from satellite_data_ingestion_spark import registry

    rng_qty = [1, 3, 5, 7, 11, 13, 17, 19, 23, 29]
    rng_disc = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
    rows_in = []
    for i, (qy, dc) in enumerate(zip(rng_qty, rng_disc)):
        price = float(1000 + 90 * qy - 35 * dc + (i % 3))  # whole dollars
        rows_in.append((i, i, i, 1, float(qy), price, dc / 100.0, 0.01, "N", "O"))
    df = spark.createDataFrame(
        rows_in,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    )
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "lineitem.parquet"))

    x1 = np.array(rng_qty, dtype=float)
    x2 = np.array(rng_disc, dtype=float)
    y = np.array([round(r[5]) for r in rows_in], dtype=float)
    q = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731

    (pc,) = registry.spec("agg_partial_corr").fn(spark, str(tmp_path)).collect()
    r_xy = np.corrcoef(x1, y)[0, 1]
    r_xz = np.corrcoef(x1, x2)[0, 1]
    r_zy = np.corrcoef(x2, y)[0, 1]
    partial = (r_xy - r_xz * r_zy) / math.sqrt((1 - r_xz**2) * (1 - r_zy**2))
    assert pc.n == 10
    assert abs(pc.r_qty_price - q(r_xy)) <= 2e-6
    assert abs(pc.partial_r_qty_price - q(partial)) <= 2e-6

    (ols,) = registry.spec("agg_ols_multi").fn(spark, str(tmp_path)).collect()
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    sst = ((y - y.mean()) ** 2).sum()
    ssr = sst - (resid**2).sum()
    assert abs(ols.beta0 - q(beta[0])) <= 1e-3  # lstsq path differs in ulps
    assert abs(ols.beta_qty - q(beta[1])) <= 1e-5
    assert abs(ols.beta_disc - q(beta[2])) <= 1e-5
    assert abs(ols.r2 - q(ssr / sst)) <= 1e-5
    f_ref = (ssr / 2) / ((sst - ssr) / (10 - 3))
    assert abs(ols.f_stat - f_ref) <= max(1e-4 * f_ref, 1e-4)


def test_wilcoxon_signed_rank_known_values(spark, tmp_path):
    """agg_wilcoxon_signed_rank pinned on a constructed paired fixture
    with a midrank tie: W+ and the tie-corrected z computed here by an
    independent sort-based midrank implementation."""
    import math

    from satellite_data_ingestion_spark import registry

    # user -> (purchase_total, view_total) dollars; includes |d| ties
    pv = {
        1: (3.0, 1.0),    # d = +200 cents
        2: (1.0, 3.0),    # d = -200
        3: (5.0, 1.0),    # d = +400
        4: (4.0, 1.0),    # d = +300
        5: (2.0, 1.0),    # d = +100
        6: (1.5, 0.5),    # d = +100 (tie)
        7: (2.0, 2.0),    # d = 0, dropped
    }
    rows_in, eid = [], 0
    for uid, (p, v) in pv.items():
        rows_in.append((eid, f"2024-01-01T00:00:{eid:02d}", uid, "purchase", p, "{}"))
        eid += 1
        rows_in.append((eid, f"2024-01-01T00:00:{eid:02d}", uid, "view", v, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows_in)
    (r,) = registry.spec("agg_wilcoxon_signed_rank").fn(spark, str(tmp_path)).collect()

    ds = [round((p - v) * 100) for p, v in pv.values() if p != v]
    srt = sorted(abs(d) for d in ds)
    midrank = {}
    i = 0
    while i < len(srt):
        j = i
        while j < len(srt) and srt[j] == srt[i]:
            j += 1
        for k in range(i, j):
            midrank.setdefault(srt[i], (i + 1 + j) / 2)
        i = j
    w_plus = sum(midrank[abs(d)] for d in ds if d > 0)
    n = len(ds)
    ties = {}
    for d in ds:
        ties[abs(d)] = ties.get(abs(d), 0) + 1
    tie_corr = sum(t**3 - t for t in ties.values())
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24 - tie_corr / 48
    )
    assert r.n == n == 6
    assert r.w_plus == w_plus == 17.5
    assert abs(r.z_stat - math.floor(z * 1e6 + 0.5) / 1e6) <= 1e-6


def test_fisher_exact_matches_lgamma(spark, tmp_path):
    """agg_fisher_exact's grid-evaluated tail must equal the same
    hypergeometric sum computed independently with math.lgamma, on a
    constructed 20-user fixture with known margins."""
    import math

    from satellite_data_ingestion_spark import registry

    # 20 users: evens are group A.  Converted = has a purchase event.
    conv_users = {0, 2, 4, 6, 8, 10, 1, 3}  # 6 of A, 2 of B
    rows_in, eid = [], 0
    for uid in range(20):
        etype = "purchase" if uid in conv_users else "click"
        rows_in.append((eid, f"2024-01-01T00:00:{eid:02d}", uid, etype, 1.0, "{}"))
        eid += 1
        rows_in.append((eid, f"2024-01-01T01:00:{eid:02d}", uid, "view", 1.0, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows_in)
    (r,) = registry.spec("agg_fisher_exact").fn(spark, str(tmp_path)).collect()
    a, K, n1, N = 6, 10, 8, 20
    assert (r.a, r.n_group_a, r.n_converted, r.n_users) == (a, K, n1, N)

    def lnc(n, k):
        return (
            math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)
        )

    p = sum(
        math.exp(lnc(K, k) + lnc(N - K, n1 - k) - lnc(N, n1))
        for k in range(a, min(K, n1) + 1)
    )
    assert abs(r.p_greater - math.floor(p * 1e6 + 0.5) / 1e6) <= 2e-6


def test_ts_kalman_known_values(spark, tmp_path):
    """ext_ts_kalman pinned against an independent pure-Python local-level
    Kalman recursion on a constructed one-event-per-day series."""
    import math

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.operators.timeseries import _KF_Q, _KF_R

    vals = [100.0, 150.0, 90.0, 200.0, 170.0, 130.0]
    rows_in = [
        (i, f"2024-01-{i+1:02d}T10:00:00", i, "purchase", v, "{}")
        for i, v in enumerate(vals)
    ]
    _write_events(spark, tmp_path, rows_in)
    (r,) = registry.spec("ext_ts_kalman").fn(spark, str(tmp_path)).collect()

    ys = [v * 100 for v in vals]
    m, p, sse = ys[0], _KF_R, 0.0
    for y in ys[1:]:
        p_pred = p + _KF_Q
        k = p_pred / (p_pred + _KF_R)
        sse += (y - m) ** 2
        m = m + k * (y - m)
        p = (1 - k) * p_pred
    q4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    assert r.event_type == "purchase" and r.n == len(vals)
    assert abs(r.level_cents - q4(m)) <= 1e-4
    assert abs(r.level_var - q4(p)) <= 1e-4
    gain = (p + _KF_Q) / ((p + _KF_Q) + _KF_R)
    assert abs(r.gain_next - math.floor(gain * 1e6 + 0.5) / 1e6) <= 1e-6
    assert abs(r.innovation_rmse - q4(math.sqrt(sse / (len(vals) - 1)))) <= 1e-4


def test_ts_granger_detects_lead(spark, tmp_path):
    """ext_ts_granger must (a) reproduce numpy's restricted/unrestricted
    RSS F statistic and (b) score the constructed leader (clicks lead
    purchases by exactly one day) far above the reverse direction."""
    import numpy as np

    from satellite_data_ingestion_spark import registry

    rng = np.random.RandomState(7)
    days = 24
    clicks = rng.randint(5, 50, size=days)
    # purchases dollars = 10 * yesterday's clicks + small noise
    pdollars = np.zeros(days, dtype=int)
    pdollars[0] = 100
    for t in range(1, days):
        pdollars[t] = 10 * clicks[t - 1] + int(rng.randint(0, 5))
    rows_in, eid = [], 0
    for t in range(days):
        for _ in range(int(clicks[t])):
            rows_in.append((eid, f"2024-01-{t+1:02d}T09:00:{eid%60:02d}", eid, "click", 1.0, "{}"))
            eid += 1
        rows_in.append((eid, f"2024-01-{t+1:02d}T12:00:00", eid, "purchase", float(pdollars[t]), "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows_in)
    out = {r.direction: r for r in registry.spec("ext_ts_granger").fn(spark, str(tmp_path)).collect()}
    assert set(out) == {"clicks->purchases", "purchases->clicks"}

    # independent check of the clicks->purchases F via numpy lstsq
    y = pdollars[1:].astype(float)
    yl = pdollars[:-1].astype(float)
    xl = clicks[:-1].astype(float)
    n = len(y)
    Xr = np.column_stack([np.ones(n), yl])
    Xu = np.column_stack([np.ones(n), yl, xl])
    rss_r = ((y - Xr @ np.linalg.lstsq(Xr, y, rcond=None)[0]) ** 2).sum()
    rss_u = ((y - Xu @ np.linalg.lstsq(Xu, y, rcond=None)[0]) ** 2).sum()
    f_ref = (rss_r - rss_u) / (rss_u / (n - 3))
    got = out["clicks->purchases"].f_granger
    assert abs(got - f_ref) <= max(1e-3 * f_ref, 1e-3), (got, f_ref)
    assert got > 10 * max(out["purchases->clicks"].f_granger, 1.0)


def _write_docs(spark, tmp_path, rows_in):
    import os

    df = spark.createDataFrame(
        rows_in, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "documents.parquet"))


def test_isotonic_calibration_monotone_and_mass_preserving(spark, tmp_path):
    """ext_isotonic_calibration on a constructed fixture whose raw rates
    INVERT between adjacent scores: output must be nondecreasing, must
    preserve total positive mass (sum n*iso == sum pos), and must equal
    an independent pure-Python minimax evaluation."""
    from satellite_data_ingestion_spark import registry

    # profile words: the a of and fast slow  (6) -> hits k via first k words
    profile = ["the", "a", "of", "and", "fast", "slow"]
    rows_in, did = [], 0
    # score-level composition: (hits, n_docs, n_en) with an inversion at 2
    comp = [(0, 4, 0), (1, 4, 3), (2, 4, 1), (3, 4, 4)]
    for hits, nd, ne in comp:
        text = " ".join(profile[:hits]) + (" xx yy zz" if hits else "xx yy zz")
        for i in range(nd):
            lang = "en" if i < ne else "fr"
            rows_in.append((did, text.strip(), lang, "s", len(text)))
            did += 1
    _write_docs(spark, tmp_path, rows_in)
    out = registry.spec("ext_isotonic_calibration").fn(spark, str(tmp_path)).collect()
    assert len(out) == 4
    rates = [r.iso_rate for r in sorted(out, key=lambda r: r.score)]
    assert all(a <= b + 1e-12 for a, b in zip(rates, rates[1:])), rates
    assert abs(sum(r.n * r.iso_rate for r in out) - sum(r.pos for r in out)) < 1e-4

    # independent minimax evaluation on the same composition
    ns = [c[1] for c in comp]
    ps = [c[2] for c in comp]
    B = len(comp)
    import math

    for j in range(B):
        iso = max(
            min(
                sum(ps[i : k + 1]) / sum(ns[i : k + 1])
                for k in range(j, B)
            )
            for i in range(j + 1)
        )
        assert abs(rates[j] - math.floor(iso * 1e6 + 0.5) / 1e6) <= 1e-6


def test_best_of_n_pick_and_margin(spark, tmp_path):
    """ext_best_of_n must pick the argmax-reward (doc_id tiebreak) per
    pool and report the reward gap over the runner-up."""
    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.llm.shaping import _BON_PROMPTS
    from satellite_data_ingestion_spark.llm.textstats import ext_quality_score

    # 3 pools x several candidates; texts vary quality via token count
    texts = {
        0: "the a of and fast slow table scan",          # high quality
        1: "x",                                           # low (short)
        2: "the the the the the the the the the the",    # low diversity
        3: "a quick filter scan with many fine tokens",  # high
    }
    rows_in = []
    for did in range(12):
        t = texts[did % 4]
        rows_in.append((did, t, "en", "s", len(t)))
    _write_docs(spark, tmp_path, rows_in)
    out = {r.prompt_id: r for r in registry.spec("ext_best_of_n").fn(spark, str(tmp_path)).collect()}
    q = {
        r.doc_id: r.quality
        for r in ext_quality_score(spark, str(tmp_path)).collect()
    }
    pools = {}
    for did in range(12):
        pools.setdefault(did % _BON_PROMPTS, []).append(did)
    assert set(out) == set(pools)
    for pid, members in pools.items():
        ranked = sorted(members, key=lambda d: (-q[d], d))
        r = out[pid]
        assert r.best_doc == ranked[0]
        assert r.n_candidates == len(members)
        expected_margin = (
            q[ranked[0]] - q[ranked[1]] if len(ranked) > 1 else q[ranked[0]]
        )
        assert abs(r.margin - round(expected_margin, 2)) <= 1e-9


def test_heaps_law_known_curve(spark, tmp_path):
    """ext_heaps_law pinned against numpy's log-log OLS on a constructed
    corpus with a hand-checkable vocabulary growth curve."""
    import numpy as np

    from satellite_data_ingestion_spark import registry

    docs = [
        (0, "a b c d"),          # 4 tokens, 4 new   -> N=4,  V=4
        (1, "a b e f g"),        # 5 tokens, 3 new   -> N=9,  V=7
        (2, "a a a h"),          # 4 tokens, 1 new   -> N=13, V=8
        (3, "i j k l m n"),      # 6 tokens, 6 new   -> N=19, V=14
        (4, "a b c"),            # 3 tokens, 0 new   -> N=22, V=14
    ]
    rows_in = [(d, t, "en", "s", len(t)) for d, t in docs]
    _write_docs(spark, tmp_path, rows_in)
    (r,) = registry.spec("ext_heaps_law").fn(spark, str(tmp_path)).collect()
    assert (r.n_docs, r.tokens, r.vocab) == (5, 22, 14)
    N = np.array([4, 9, 13, 19, 22], dtype=float)
    V = np.array([4, 7, 8, 14, 14], dtype=float)
    beta, logk = np.polyfit(np.log(N), np.log(V), 1)
    assert abs(r.heaps_beta - beta) <= 1e-5
    assert abs(r.heaps_log_k - logk) <= 1e-5


def test_ks_normality_vs_erf(spark, tmp_path):
    """agg_ks_normality's polynomial-Phi D must agree with an
    independent math.erf evaluation of the Lilliefors statistic within
    the polynomial's documented 7.5e-8 error bound (plus rounding)."""
    import math

    from satellite_data_ingestion_spark import registry

    vals = [10.0, 12.0, 12.0, 13.0, 15.0, 18.0, 20.0, 25.0, 30.0, 50.0]
    rows_in = [
        (i, f"2024-01-01T00:00:{i:02d}", i, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    _write_events(spark, tmp_path, rows_in)
    (r,) = registry.spec("agg_ks_normality").fn(spark, str(tmp_path)).collect()

    cs = sorted(round(v * 100) for v in vals)
    n = len(cs)
    mu = sum(cs) / n
    sd = math.sqrt(sum((x - mu) ** 2 for x in cs) / (n - 1))
    phi = lambda z: 0.5 * (1 + math.erf(z / math.sqrt(2)))  # noqa: E731
    d = 0.0
    seen = 0
    for c in sorted(set(cs)):
        cnt = cs.count(c)
        p = phi((c - mu) / sd)
        d = max(d, (seen + cnt) / n - p, p - seen / n)
        seen += cnt
    assert r.n == n
    assert abs(r.mean_cents - math.floor(mu * 1e4 + 0.5) / 1e4) <= 1e-4
    assert abs(r.ks_d - d) <= 1e-5


def test_grubbs_known_values(spark, tmp_path):
    """agg_grubbs_test pinned by hand: the max-side outlier's deviation
    over the sample SD."""
    import math

    from satellite_data_ingestion_spark import registry

    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 40.0]
    rows_in = [
        (i, f"2024-01-01T00:00:{i:02d}", i, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    _write_events(spark, tmp_path, rows_in)
    (r,) = registry.spec("agg_grubbs_test").fn(spark, str(tmp_path)).collect()
    cs = [v * 100 for v in vals]
    mu = sum(cs) / len(cs)
    sd = math.sqrt(sum((x - mu) ** 2 for x in cs) / (len(cs) - 1))
    g = max(max(cs) - mu, mu - min(cs)) / sd
    assert (r.n, r.max_cents, r.min_cents) == (6, 4000, 1000)
    assert r.suspect_side == "max"
    assert abs(r.g_stat - math.floor(g * 1e6 + 0.5) / 1e6) <= 1e-6


def test_ts_ar2_vs_numpy(spark, tmp_path):
    """ext_ts_ar2 pinned against numpy's direct biased-autocovariance
    Yule-Walker solution on a constructed oscillatory daily series."""
    import numpy as np

    from satellite_data_ingestion_spark import registry

    # one purchase per day, whole-dollar values with an AR(2)-ish wobble
    y = [100, 140, 90, 150, 85, 160, 95, 150, 100, 145, 92, 155, 88, 148]
    rows_in = [
        (i, f"2024-01-{i+1:02d}T12:00:00", i, "purchase", float(v), "{}")
        for i, v in enumerate(y)
    ]
    _write_events(spark, tmp_path, rows_in)
    (r,) = registry.spec("ext_ts_ar2").fn(spark, str(tmp_path)).collect()

    a = np.array(y, dtype=float)
    t = len(a)
    mu = a.mean()
    c0 = ((a - mu) ** 2).sum() / t
    c1 = ((a[1:] - mu) * (a[:-1] - mu)).sum() / t
    c2 = ((a[2:] - mu) * (a[:-2] - mu)).sum() / t
    r1, r2 = c1 / c0, c2 / c0
    phi1 = r1 * (1 - r2) / (1 - r1**2)
    phi2 = (r2 - r1**2) / (1 - r1**2)
    fc = mu + phi1 * (a[-1] - mu) + phi2 * (a[-2] - mu)
    assert r.n_days == t
    assert abs(r.acf1 - r1) <= 1e-5 and abs(r.acf2 - r2) <= 1e-5
    assert abs(r.phi1 - phi1) <= 1e-5 and abs(r.phi2 - phi2) <= 1e-5
    assert abs(r.forecast_dollars - fc) <= 1e-3
    assert abs(r.innovation_var - c0 * (1 - phi1 * r1 - phi2 * r2)) <= 1e-2
    assert r.phi2 < 0  # the constructed series oscillates


def test_james_stein_shrinkage_properties(spark, tmp_path):
    """agg_james_stein on a constructed customer fixture: B in [0,1],
    smaller groups shrink harder, and the exact Efron-Morris numbers
    reproduce an independent Python evaluation."""
    import math
    import os

    from satellite_data_ingestion_spark import registry

    groups = {
        0: [100.0] * 2,                 # tiny group, extreme mean
        1: [10.0, 12.0, 11.0, 13.0, 9.0, 11.0, 12.0, 10.0],
        2: [20.0, 22.0, 21.0, 19.0, 20.0, 21.0],
        3: [15.0, 16.0, 14.0, 15.0, 16.0],
    }
    rows_in, cid = [], 0
    for nk, vals in groups.items():
        for v in vals:
            rows_in.append((cid, f"c{cid}", nk, v, "BUILDING"))
            cid += 1
    spark.createDataFrame(
        rows_in,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "customer.parquet"))
    out = {r.nation: r for r in registry.spec("agg_james_stein").fn(spark, str(tmp_path)).collect()}

    cents = {k: [v * 100 for v in vs] for k, vs in groups.items()}
    means = {k: sum(v) / len(v) for k, v in cents.items()}
    k = len(groups)
    nn = sum(len(v) for v in cents.values())
    s2 = sum(sum((x - means[g]) ** 2 for x in v) for g, v in cents.items()) / (nn - k)
    mbar = sum(means.values()) / k
    ss = sum((m - mbar) ** 2 for m in means.values())
    for g in groups:
        b = max(0.0, 1 - (k - 3) * (s2 / len(groups[g])) / ss)
        shrunk = mbar + b * (means[g] - mbar)
        r = out[g]
        assert 0.0 <= r.shrink_b <= 1.0
        assert abs(r.shrink_b - math.floor(b * 1e6 + 0.5) / 1e6) <= 1e-6
        assert abs(r.shrunk_cents - math.floor(shrunk * 1e4 + 0.5) / 1e4) <= 1e-4
    # the 2-member group must shrink at least as hard as the 8-member one
    assert out[0].shrink_b <= out[1].shrink_b


def test_beta_binomial_smooth_shrinks_sparse_users(spark, tmp_path):
    """agg_beta_binomial_smooth: smoothed rates sit between the raw rate
    and the prior mean, and the sparse user moves further toward the
    prior than the dense user with the same raw rate."""
    from satellite_data_ingestion_spark import registry

    # users: (trials, conversions); u1 and u2 share raw rate 0.5
    spec = {1: (2, 1), 2: (40, 20), 3: (10, 1), 4: (10, 9), 5: (20, 8)}
    rows_in, eid = [], 0
    for uid, (t, c) in spec.items():
        for i in range(t):
            etype = "purchase" if i < c else "view"
            rows_in.append((eid, f"2024-01-01T00:{eid//60:02d}:{eid%60:02d}", uid, etype, 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows_in)
    out = {r.user_id: r for r in registry.spec("agg_beta_binomial_smooth").fn(spark, str(tmp_path)).collect()}
    assert set(out) == set(spec)
    rates = [c / t for t, c in spec.values()]
    lo, hi = min(rates), max(rates)
    for uid, (t, c) in spec.items():
        r = out[uid]
        assert r.trials == t and r.conv == c
        assert lo - 1e-6 <= r.smoothed_rate <= hi + 1e-6
    # same raw rate, fewer trials => larger pull toward the prior mean
    pull1 = abs(out[1].smoothed_rate - out[1].raw_rate)
    pull2 = abs(out[2].smoothed_rate - out[2].raw_rate)
    assert pull1 > pull2


def test_partition_reconcile_flags_withheld_days(spark, tmp_path):
    """pipeline_partition_reconcile: days of month divisible by 3 are
    withheld from the sink and must report status='missing' with
    sunk_rows=0; every other day must round-trip exactly."""
    from satellite_data_ingestion_spark import registry

    rows_in, eid = [], 0
    for dom in (1, 2, 3, 4, 6, 9, 10):
        for _ in range(dom):  # dom rows on that day
            rows_in.append((eid, f"2024-01-{dom:02d}T08:00:00", eid, "view", 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows_in)
    out = {r.day: r for r in registry.spec("pipeline_partition_reconcile").fn(spark, str(tmp_path)).collect()}
    assert len(out) == 7
    for dom in (1, 2, 3, 4, 6, 9, 10):
        r = out[f"d202401{dom:02d}"]
        assert r.expected_rows == dom
        if dom % 3 == 0:
            assert r.status == "missing" and r.sunk_rows == 0
        else:
            assert r.status == "ok" and r.sunk_rows == dom


def test_crossval_folds_partition_exactly(spark, tmp_path):
    """ext_crossval_folds: folds partition the corpus (sum of val sizes
    == corpus; train = complement per fold)."""
    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.llm.sampling import _CV_FOLDS

    rows_in = [(i, f"tok{i} a b", "en" if i % 3 else "fr", "s", 9) for i in range(37)]
    _write_docs(spark, tmp_path, rows_in)
    out = registry.spec("ext_crossval_folds").fn(spark, str(tmp_path)).collect()
    assert len(out) == _CV_FOLDS
    assert sum(r.n_val for r in out) == 37
    for r in out:
        assert r.n_train == 37 - r.n_val


def test_udf_arrow_batch_token_edge_cases(spark, tmp_path):
    """udf_arrow_batch: pyarrow split counts must equal python
    str.split(' ') counts including empty strings and double spaces."""
    from satellite_data_ingestion_spark import registry

    texts = ["a b c", "a  b", "", " lead", "trail ", "one"]
    rows_in = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    _write_docs(spark, tmp_path, rows_in)
    out = {r.doc_id: r for r in registry.spec("udf_arrow_batch").fn(spark, str(tmp_path)).collect()}
    for i, t in enumerate(texts):
        assert out[i].n_tokens == len(t.split(" ")), (i, t)
        assert out[i].n_chars == len(t)


def _write_embeddings(spark, tmp_path, rows_in):
    import os

    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    spark.createDataFrame(rows_in, schema).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )


def test_ndcg_known_ranking(spark, tmp_path):
    """ext_ndcg pinned on a constructed corpus where query 0's ranking
    and relevance pattern are known by construction: candidates at
    cosine 0.9/0.8/0.7 with labels match/miss/match => DCG = 1/log2(2)
    + 1/log2(4), IDCG at R=2, hits=2."""
    import math

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.llm.retrieval import _NDCG_QUERIES

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 6

    rows = [(0, vec(1, 0), 0)]
    # candidates ordered by cosine to q0: .9 (label 0), .8 (label 1), .7 (label 0)
    for vid, (c, lab) in enumerate([(0.9, 0), (0.8, 1), (0.7, 0)], start=_NDCG_QUERIES):
        s = math.sqrt(1 - c * c)
        rows.append((vid, vec(c, s), lab))
    # park the other query slots far away with unmatched labels
    for qid in range(1, _NDCG_QUERIES):
        rows.append((qid, vec(-1, 0.001 * qid), 8))
    _write_embeddings(spark, tmp_path, rows)
    out = {r.query_vec: r for r in registry.spec("ext_ndcg").fn(spark, str(tmp_path)).collect()}
    r0 = out[0]
    assert r0.n_relevant == 2 and r0.hits_at_k == 2
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert abs(r0.ndcg_at_k - math.floor(dcg / idcg * 1e6 + 0.5) / 1e6) <= 1e-6


def test_mmr_skips_redundant_candidate(spark, tmp_path):
    """ext_mmr_rerank: when the 2nd-closest candidate nearly duplicates
    the 1st pick, MMR must rank the more diverse 3rd candidate above it
    (plain cosine order would not)."""
    import math

    from satellite_data_ingestion_spark import registry

    # 10 and 11 lie in the (x,y) plane (near-duplicates of each other);
    # 12 has the same query angle in the ORTHOGONAL (x,z) plane, so its
    # redundancy penalty vs 10 is much smaller than 11's.
    rows = [
        (0, [1.0, 0.0, 0.0] + [0.0] * 5, 0),  # query
        (10, [math.cos(0.10), math.sin(0.10), 0.0] + [0.0] * 5, 0),
        (11, [math.cos(0.11), math.sin(0.11), 0.0] + [0.0] * 5, 0),
        (12, [math.cos(0.12), 0.0, math.sin(0.12)] + [0.0] * 5, 0),
    ]
    _write_embeddings(spark, tmp_path, rows)
    out = sorted(
        registry.spec("ext_mmr_rerank").fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.rank,
    )
    assert [r.vec_id for r in out] == [10, 12, 11]
    assert out[0].qsim >= out[2].qsim


def test_ljung_box_vs_independent(spark, tmp_path):
    """ext_ts_ljung_box pinned against an independent numpy evaluation
    of Q on a constructed autocorrelated hourly series, and the
    autocorrelated series must show a far smaller white-noise p than
    its shuffled (whitened) counterpart."""
    import numpy as np

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.operators.timeseries import _LB_LAGS

    base = [100, 120, 140, 160, 180, 160, 140, 120] * 6  # strong cycle
    rows_in = [
        (i, f"2024-01-{1 + i // 24:02d}T{i % 24:02d}:30:00", i, "view", float(v), "{}")
        for i, v in enumerate(base)
    ]
    _write_events(spark, tmp_path, rows_in)
    (r,) = registry.spec("ext_ts_ljung_box").fn(spark, str(tmp_path)).collect()

    x = np.array([v * 100 for v in base], dtype=float)
    n = len(x)
    mu = x.mean()
    c0 = ((x - mu) ** 2).sum()
    q = 0.0
    for k in range(1, _LB_LAGS + 1):
        rk = ((x[k:] - mu) * (x[:-k] - mu)).sum() / c0
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    assert r.n == n and r.lags == _LB_LAGS
    assert abs(r.q_lb - q) <= max(1e-4 * q, 1e-4)
    assert r.p_white <= 1e-6  # overwhelming evidence of structure


def test_poisson_gof_vs_independent(spark, tmp_path):
    """agg_poisson_gof pinned against an independent math evaluation of
    the chi-square on a constructed per-user count fixture."""
    import math

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.operators.hypothesis import (
        _PGOF_CAP,
        _PGOF_LNF,
    )

    counts = {u: c for u, c in enumerate([0, 1, 1, 2, 2, 2, 3, 3, 4, 6])}
    rows_in, eid = [], 0
    for uid, c in counts.items():
        rows_in.append((eid, f"2024-01-01T00:00:{eid % 60:02d}", uid, "view", 1.0, "{}"))
        eid += 1
        for _ in range(c):
            rows_in.append((eid, f"2024-01-01T01:00:{eid % 60:02d}", uid, "purchase", 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows_in)
    (r,) = registry.spec("agg_poisson_gof").fn(spark, str(tmp_path)).collect()

    nu = len(counts)
    lam = sum(counts.values()) / nu
    obs = {}
    for c in counts.values():
        cell = min(c, _PGOF_CAP)
        obs[cell] = obs.get(cell, 0) + 1
    exp = [nu * math.exp(k * math.log(lam) - lam - _PGOF_LNF[k]) for k in range(_PGOF_CAP)]
    exp.append(nu - sum(exp))
    chi2 = sum((obs.get(k, 0) - exp[k]) ** 2 / exp[k] for k in range(_PGOF_CAP + 1))
    assert r.n_users == nu
    assert abs(r.lambda_hat - math.floor(lam * 1e6 + 0.5) / 1e6) <= 1e-6
    assert abs(r.chi2 - chi2) <= max(1e-3, 1e-5 * chi2)
    assert 0.0 <= r.p_poisson <= 1.0


def test_matryoshka_prefix_signal(spark, tmp_path):
    """ext_matryoshka_recall: when all retrieval signal lives in the
    first two dimensions, every budget achieves recall 1.0; the full-dim
    row is exactly 1.0 by construction."""
    import math

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.llm.embedding_stats import (
        _MRL_DIMS,
        _MRL_QUERIES,
    )

    rows = []
    for qid in range(_MRL_QUERIES):
        theta = 0.3 * qid
        rows.append((qid, [math.cos(theta), math.sin(theta)] + [0.0] * 62, qid))
    for i in range(40):
        theta = 0.07 * i
        rows.append(
            (100 + i, [math.cos(theta), math.sin(theta)] + [0.0] * 62, i % 10)
        )
    _write_embeddings(spark, tmp_path, rows)
    out = {r.dim: r for r in registry.spec("ext_matryoshka_recall").fn(spark, str(tmp_path)).collect()}
    assert set(out) == set(_MRL_DIMS)
    assert out[_MRL_DIMS[-1]].recall_at_k == 1.0
    for d in _MRL_DIMS:
        assert out[d].recall_at_k == 1.0  # signal is entirely in dims 1-2


def test_calibration_ece_known(spark, tmp_path):
    """ext_calibration_ece pinned against an independent Python ECE/MCE
    on a constructed fixture (profile-hit scores, en/fr labels)."""
    import math

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.llm.textstats import (
        _CAL_BINS,
        _EN_PROFILE_LEN,
        _LANG_PROFILES,
    )

    profile = list(_LANG_PROFILES["en"])
    comp = [(0, 4, 1), (2, 5, 2), (4, 3, 3), (6, 4, 4)]  # (hits, n, n_en)
    rows_in, did = [], 0
    for hits, nd, ne in comp:
        text = (" ".join(profile[:hits]) + " zz qq").strip()
        for i in range(nd):
            rows_in.append((did, text, "en" if i < ne else "fr", "s", len(text)))
            did += 1
    _write_docs(spark, tmp_path, rows_in)
    (r,) = registry.spec("ext_calibration_ece").fn(spark, str(tmp_path)).collect()

    bins = {}
    for hits, nd, ne in comp:
        sm = math.floor(hits / _EN_PROFILE_LEN * 1e6 + 0.5)
        b = min(sm // 100000, _CAL_BINS - 1)
        n0, ssm0, sy0 = bins.get(b, (0, 0, 0))
        bins[b] = (n0 + nd, ssm0 + nd * sm, sy0 + ne)
    nn = sum(v[0] for v in bins.values())
    ece = sum(abs(sy * 1e6 - ssm) for _, ssm, sy in bins.values()) / (nn * 1e6)
    mce = max(abs(sy * 1e6 - ssm) / (n * 1e6) for n, ssm, sy in bins.values())
    assert r.n == nn and r.n_bins == len(bins)
    assert abs(r.ece - math.floor(ece * 1e6 + 0.5) / 1e6) <= 1e-6
    assert abs(r.mce - math.floor(mce * 1e6 + 0.5) / 1e6) <= 1e-6


def test_simpson_scan_constructed_reversal(spark, tmp_path):
    """agg_simpson_scan on a constructed classic Simpson fixture: the
    pooled purchase-minus-view gap is positive but BOTH AM and PM
    within-stratum gaps are negative => ampm row flags sign_reversal."""
    from satellite_data_ingestion_spark import registry

    rows_in, eid = [], 0

    def add(n, etype, value, hour):
        nonlocal eid
        for _ in range(n):
            # spread users/days so every stratifier has both strata
            rows_in.append(
                (eid, f"2024-01-{1 + eid % 2:02d}T{hour:02d}:00:{eid % 60:02d}",
                 eid, etype, value, "{}")
            )
            eid += 1

    add(2, "purchase", 10.0, 9)   # AM
    add(8, "view", 11.0, 9)       # AM: gap -1
    add(8, "purchase", 30.0, 15)  # PM
    add(2, "view", 31.0, 15)      # PM: gap -1
    _write_events(spark, tmp_path, rows_in)
    out = {r.stratifier: r for r in registry.spec("agg_simpson_scan").fn(spark, str(tmp_path)).collect()}
    assert set(out) == {"ampm", "dom_parity", "user_parity"}
    r = out["ampm"]
    assert r.pooled_diff_cents > 0 > r.adjusted_diff_cents
    assert bool(r.sign_reversal) is True
    assert abs(r.pooled_diff_cents - 1100.0) <= 1e-6
    assert abs(r.adjusted_diff_cents - (-100.0)) <= 1e-6


def test_reward_length_bias_detects_bias(spark, tmp_path):
    """ext_reward_length_bias: on a corpus where longer docs score
    systematically higher quality, the correlation is strongly
    positive and matches numpy's corrcoef."""
    import numpy as np

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.llm.textstats import ext_quality_score

    rows_in = []
    for i in range(20):
        if i % 2:
            text = " ".join(f"tok{j}" for j in range(20 + i))  # long, high quality
        else:
            text = "x"  # short, fails the length gate
        rows_in.append((i, text, "en", "s", len(text)))
    _write_docs(spark, tmp_path, rows_in)
    (r,) = registry.spec("ext_reward_length_bias").fn(spark, str(tmp_path)).collect()
    q = {x.doc_id: x.quality for x in ext_quality_score(spark, str(tmp_path)).collect()}
    toks = {i: len(t.split(" ")) for i, (t,) in
            ((i, (rows_in[i][1],)) for i in range(20))}
    corr = np.corrcoef(
        [toks[i] for i in range(20)], [q[i] * 4 for i in range(20)]
    )[0, 1]
    assert r.n == 20
    assert r.corr_reward_tokens > 0.5
    assert abs(r.corr_reward_tokens - corr) <= 1e-5
    assert r.reward_slope_per_100_tokens > 0


def test_icc_known_values(spark, tmp_path):
    """agg_icc pinned against an independent Python one-way random
    effects computation (unbalanced k0 correction) on constructed
    nation groups."""
    import math
    import os

    from satellite_data_ingestion_spark import registry

    groups = {0: [10.0, 11.0, 12.0], 1: [20.0, 21.0], 2: [30.0, 31.0, 32.0, 33.0]}
    rows_in, cid = [], 0
    for nk, vals in groups.items():
        for v in vals:
            rows_in.append((cid, f"c{cid}", nk, v, "AUTO"))
            cid += 1
    spark.createDataFrame(
        rows_in,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "customer.parquet"))
    (r,) = registry.spec("agg_icc").fn(spark, str(tmp_path)).collect()

    cents = {k: [v * 100 for v in vs] for k, vs in groups.items()}
    k = len(cents)
    N = sum(len(v) for v in cents.values())
    grand = sum(sum(v) for v in cents.values()) / N
    means = {g: sum(v) / len(v) for g, v in cents.items()}
    msb = sum(len(v) * (means[g] - grand) ** 2 for g, v in cents.items()) / (k - 1)
    msw = sum(sum((x - means[g]) ** 2 for x in v) for g, v in cents.items()) / (N - k)
    k0 = (N - sum(len(v) ** 2 for v in cents.values()) / N) / (k - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    assert (r.k, r.n) == (3, 9)
    assert abs(r.icc1 - math.floor(icc * 1e6 + 0.5) / 1e6) <= 1e-6
    assert r.icc1 > 0.9  # groups are far apart vs within-noise


def test_kneser_ney_vs_independent(spark, tmp_path):
    """ext_ngram_kneser_ney pinned against an independent Python KN
    evaluation on a constructed corpus with the classic
    high-count-low-context word."""
    import math
    from collections import Counter

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.llm.lm import _KN_D

    docs = [
        "san francisco is big",
        "san francisco is old",
        "san francisco is big",
        "the city is big",
    ]
    rows_in = [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)]
    _write_docs(spark, tmp_path, rows_in)
    out = registry.spec("ext_ngram_kneser_ney").fn(spark, str(tmp_path)).collect()

    bigrams = Counter()
    for t in docs:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] += 1
    cv = Counter()
    fwd = Counter()
    bwd = Counter()
    for (a, b), c in bigrams.items():
        cv[a] += c
        fwd[a] += 1
        bwd[b] += 1
    ntypes = len(bigrams)

    def pkn(a, b):
        return max(bigrams[(a, b)] - _KN_D, 0) / cv[a] + _KN_D * fwd[a] / cv[a] * (
            bwd[b] / ntypes
        )

    for row in out:
        expect = math.floor(pkn(row.v, row.w) * 1e6 + 0.5) / 1e6
        assert abs(row.p_kn - expect) <= 1e-6, (row, expect)
    got = {(row.v, row.w): row for row in out}
    # "francisco" follows only "san": continuation prob is low despite count 3
    assert got[("san", "francisco")].c_bigram == 3
    assert bwd[("francisco")] == 1


def test_textrank_hub_ranks_first(spark, tmp_path):
    """ext_keyword_textrank: a constructed hub word adjacent to every
    other word must take rank 1, and the ranks must match an
    independent Python power iteration (same init, 5 iterations)."""
    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.llm.textstats import (
        _TR_DAMPING,
        _TR_ITERS,
        _TR_ROUND,
    )

    docs = ["hub alpha hub beta hub gamma hub delta", "alpha beta", "gamma delta"]
    rows_in = [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)]
    _write_docs(spark, tmp_path, rows_in)
    out = registry.spec("ext_keyword_textrank").fn(spark, str(tmp_path)).collect()
    assert out[0].word == "hub"

    # independent power iteration
    from collections import Counter, defaultdict

    wt = Counter()
    for t in docs:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            if a != b:
                wt[(a, b)] += 1
                wt[(b, a)] += 1
    tw = defaultdict(int)
    for (a, b), c in wt.items():
        tw[a] += c
    tr = {n: 1.0 for n in tw}
    for _ in range(_TR_ITERS):
        new = {}
        for n in tw:
            s = sum(tr[a] * wt[(a, n)] / tw[a] for (a, b) in wt if b == n)
            new[n] = (1 - _TR_DAMPING) + _TR_DAMPING * s
        tr = new
    expect = sorted(
        ((round(v, _TR_ROUND), k) for k, v in tr.items()),
        key=lambda t: (-t[0], t[1]),
    )
    for row, (ev, ew) in zip(out, expect):
        assert row.word == ew
        assert abs(row.textrank - ev) <= 1e-6


def test_matryoshka_zero_overlap_reports_zero(spark, tmp_path):
    """Regression (found live at twin-sf1): a budget whose truncated
    top-k shares nothing with the full-dim top-k must emit recall 0.0,
    not silently drop its row.  Constructed so dims 1-8 are IDENTICAL
    for all candidates (prefix carries no signal; the 8-dim ranking is
    then id-ordered) while dims 9+ rank a disjoint candidate set."""
    import math

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.llm.embedding_stats import (
        _MRL_DIMS,
        _MRL_K,
        _MRL_QUERIES,
    )

    rows = []
    for qid in range(_MRL_QUERIES):
        v = [1.0] * 8 + [math.cos(0.1 * qid), math.sin(0.1 * qid)] + [0.0] * 54
        rows.append((qid, v, 0))
    # low ids: identical prefix, ORTHOGONAL tail (never in full top-k
    # but always in the 8-dim id-tiebroken top-k)
    for i in range(_MRL_K):
        rows.append((20 + i, [1.0] * 8 + [0.0, 0.0] + [1.0] + [0.0] * 53, 1))
    # high ids: identical prefix, tail aligned with the queries
    for i in range(_MRL_K):
        theta = 0.05 * i
        rows.append(
            (100 + i, [1.0] * 8 + [math.cos(theta), math.sin(theta)] + [0.0] * 54, 2)
        )
    _write_embeddings(spark, tmp_path, rows)
    out = {r.dim: r for r in registry.spec("ext_matryoshka_recall").fn(spark, str(tmp_path)).collect()}
    assert set(out) == set(_MRL_DIMS), out  # every budget row present
    assert out[_MRL_DIMS[-1]].recall_at_k == 1.0
    assert out[8].hits < _MRL_QUERIES * _MRL_K  # prefix carries no signal


def test_distributed_rank_bijection_on_join_grain_input(spark):
    """Regression (found live in round 14 via agg_xi_correlation): when
    distributed_rank's input is a JOIN output whose row order is not
    deterministic, the helper's two consumers of the range exchange
    must still agree on partition assignment — _rk must be an exact
    1..n bijection on every trial.  Before the helper pinned ONE
    materialized shuffle, each branch re-sampled its own boundaries
    over the unstable upstream and 2-3% of ranks collided."""
    import pyspark.sql.functions as F

    from satellite_data_ingestion_spark.catalog import table
    from satellite_data_ingestion_spark.operators.ranking import distributed_rank

    sfd = "/root/testdata/sf0.01"
    li = table(spark, sfd, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice")).cast("long").alias("y"),
        "l_orderkey",
        "l_linenumber",
    )
    yg = pts.groupBy("y").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    yr = distributed_rank(yg, ["y"], sum_cols=("cnt",)).select(
        "y",
        "cnt",
        F.col("_cum_cnt").cast("long").alias("cum"),
        F.col("_tot_cnt").cast("long").alias("n_all"),
    )
    joined = pts.join(yr, "y").select(
        "x", "l_orderkey", "l_linenumber", "y", "n_all",
        F.col("cum").alias("r"),
        (F.col("n_all") - (F.col("cum") - F.col("cnt"))).alias("l"),
    )
    for _ in range(2):
        seq = distributed_rank(joined, ["x", "l_orderkey", "l_linenumber", "y"])
        ts = [row._rk for row in seq.select("_rk").collect()]
        assert len(set(ts)) == len(ts), (
            f"rank collision: {len(ts) - len(set(ts))} duplicates"
        )
        assert min(ts) == 1 and max(ts) == len(ts)


def test_xi_correlation_detects_nonmonotone_dependence(spark, tmp_path):
    """agg_xi_correlation on a constructed PARABOLIC relation (Spearman
    ~0 by symmetry) must be strongly positive, and must equal an
    independent pure-Python evaluation of the ties formula."""
    import math
    import os

    from satellite_data_ingestion_spark import registry

    n = 60
    rows_in = []
    for i in range(n):
        x = float(i % 30 + 1)
        y = float(round((x - 15.5) ** 2))  # parabola in x, whole dollars
        rows_in.append((i, i, i, 1, x, y, 0.0, 0.0, "N", "O"))
    spark.createDataFrame(
        rows_in,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    (r,) = registry.spec("agg_xi_correlation").fn(spark, str(tmp_path)).collect()

    pts = [(int(row[4]), round(row[5]), row[0], row[3]) for row in rows_in]
    ys = sorted(set(p[1] for p in pts))
    from collections import Counter

    ycnt = Counter(p[1] for p in pts)
    cum, c = {}, 0
    for y in ys:
        c += ycnt[y]
        cum[y] = c
    seq = sorted(pts, key=lambda p: (p[0], p[2], p[3], p[1]))
    rs = [cum[p[1]] for p in seq]
    ls = [n - (cum[p[1]] - ycnt[p[1]]) for p in seq]
    num = sum(abs(a - b) for a, b in zip(rs, rs[1:]))
    den = sum(l * (n - l) for l in ls)
    xi = 1 - n * num / (2 * den)
    assert r.n == n
    assert abs(r.xi - math.floor(xi * 1e6 + 0.5) / 1e6) <= 1e-6
    assert r.xi > 0.5  # strong functional dependence detected


def test_median_ci_order_stats(spark, tmp_path):
    """agg_median_ci pinned against direct order-statistic selection on
    a constructed sample."""
    import math

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.operators.hypothesis import _MCI_Z

    vals = [float(v) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]]
    rows_in = [
        (i, f"2024-01-01T00:00:{i:02d}", i, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    _write_events(spark, tmp_path, rows_in)
    (r,) = registry.spec("agg_median_ci").fn(spark, str(tmp_path)).collect()
    cs = sorted(round(v * 100) for v in vals)
    n = len(cs)
    lo = max(int(math.floor((n - _MCI_Z * math.sqrt(n)) / 2)), 1)
    hi = min(int(math.ceil(1 + (n + _MCI_Z * math.sqrt(n)) / 2)), n)
    med = (cs[(n + 1) // 2 - 1] + cs[-(-(n + 1) // 2) - 1]) / 2
    assert r.n == n
    assert r.ci_low_cents == cs[lo - 1]
    assert r.ci_high_cents == cs[hi - 1]
    assert abs(r.median_cents - med) <= 1e-9
    assert r.ci_low_cents <= r.median_cents <= r.ci_high_cents


def test_hill_tail_recovers_pareto_alpha(spark, tmp_path):
    """agg_hill_tail on deterministic Pareto(alpha=2) order totals must
    estimate alpha near 2 and exactly reproduce an independent Python
    evaluation of the Hill sum."""
    import math
    import os

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.operators.hypothesis import _HILL_K

    n = 2000
    alpha = 2.0
    vals = [100.0 * (1.0 - (i + 0.5) / n) ** (-1.0 / alpha) for i in range(n)]
    rows_in = [
        (i, i % 97, "O", float(round(v)), "2024-01-01T00:00:00", "1-URGENT")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows_in,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn(
        "o_orderdate",
        __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("o_orderdate"),
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "orders.parquet"))
    (r,) = registry.spec("agg_hill_tail").fn(spark, str(tmp_path)).collect()

    xs = sorted(
        ((round(v), i) for i, v in enumerate(vals)), key=lambda t: (-t[0], t[1])
    )
    thr = float(xs[_HILL_K][0])
    lnsum = sum(math.log(xs[i][0] / thr) for i in range(_HILL_K))
    assert r.n == n and r.k == _HILL_K
    assert abs(r.hill_xi - math.floor(lnsum / _HILL_K * 1e6 + 0.5) / 1e6) <= 1e-6
    assert 1.5 < r.tail_alpha < 2.6  # recovers the true exponent ~2


def test_bland_altman_known_values(spark, tmp_path):
    """agg_bland_altman pinned by hand on constructed paired totals."""
    import math

    from satellite_data_ingestion_spark import registry

    pv = {1: (3.0, 1.0), 2: (2.0, 2.5), 3: (5.0, 4.0), 4: (1.0, 2.0)}
    rows_in, eid = [], 0
    for uid, (p, c) in pv.items():
        rows_in.append((eid, f"2024-01-01T00:00:{eid:02d}", uid, "purchase", p, "{}"))
        eid += 1
        rows_in.append((eid, f"2024-01-01T00:00:{eid:02d}", uid, "click", c, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows_in)
    (r,) = registry.spec("agg_bland_altman").fn(spark, str(tmp_path)).collect()
    diffs = [round((p - c) * 100) for p, c in pv.values()]
    n = len(diffs)
    bias = sum(diffs) / n
    sd = math.sqrt(sum((d - bias) ** 2 for d in diffs) / (n - 1))
    q4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    assert r.n == n
    assert abs(r.bias_cents - q4(bias)) <= 1e-4
    assert abs(r.sd_cents - q4(sd)) <= 1e-4
    assert abs(r.loa_low - q4(bias - 1.96 * sd)) <= 1e-4
    assert abs(r.loa_high - q4(bias + 1.96 * sd)) <= 1e-4


def test_mahalanobis_flags_joint_outlier(spark, tmp_path):
    """agg_mahalanobis_2d: a row unremarkable on both margins but
    extreme JOINTLY (high qty, low price against a positive
    correlation) must rank first; d2 matches numpy's S^-1 form."""
    import os

    import numpy as np

    from satellite_data_ingestion_spark import registry

    rows_in = []
    for i in range(40):
        q = float(i % 20 + 1)
        p = float(round(100 * q + (i % 3)))  # strong positive relation
        rows_in.append((i, i, i, 1, q, p, 0.0, 0.0, "N", "O"))
    rows_in.append((99, 99, 99, 1, 20.0, 100.0, 0.0, 0.0, "N", "O"))  # joint outlier
    spark.createDataFrame(
        rows_in,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    out = registry.spec("agg_mahalanobis_2d").fn(spark, str(tmp_path)).collect()
    assert out[0].l_orderkey == 99
    X = np.array([(r[4], round(r[5])) for r in rows_in], dtype=float)
    S = np.cov(X.T)
    mu = X.mean(axis=0)
    z = np.array([20.0, 100.0]) - mu
    d2 = float(z @ np.linalg.inv(S) @ z)
    assert abs(out[0].d2 - d2) <= max(1e-6 * d2, 1e-3)


def test_pca_2x2_matches_numpy_eigh(spark, tmp_path):
    """agg_pca_2x2's closed-form eigenvalues/angle must match numpy's
    eigh on the same covariance."""
    import math
    import os

    import numpy as np

    from satellite_data_ingestion_spark import registry

    rng = np.random.RandomState(3)
    q = rng.randint(1, 50, size=60).astype(float)
    p = np.round(50 * q + rng.randint(0, 500, size=60)).astype(float)
    rows_in = [
        (i, i, i, 1, float(q[i]), float(p[i]), 0.0, 0.0, "N", "O")
        for i in range(60)
    ]
    spark.createDataFrame(
        rows_in,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    ).write.mode("overwrite").parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    (r,) = registry.spec("agg_pca_2x2").fn(spark, str(tmp_path)).collect()
    S = np.cov(np.vstack([q, p]))
    w, v = np.linalg.eigh(S)
    l2, l1 = sorted(w)
    assert abs(r.eigval_1 - l1) <= max(1e-6 * l1, 1e-3)
    assert abs(r.eigval_2 - l2) <= max(1e-6 * abs(l2), 1e-3)
    assert abs(r.var_explained_1 - l1 / (l1 + l2)) <= 1e-5
    # principal axis: angle of the top eigenvector
    vec = v[:, int(np.argmax(w))]
    ang = math.atan2(vec[1], vec[0])
    got = r.principal_angle
    # same axis modulo pi
    assert min(abs(got - ang), abs(got - ang + math.pi), abs(got - ang - math.pi)) <= 1e-4


def test_ndcg_zero_relevant_query_reports_zero(spark, tmp_path):
    """Regression (round-14 review, the matryoshka bug class): a query
    whose label matches NO candidate must emit an ndcg_at_k = 0.0 row,
    not be silently dropped by the ideal-table join at least(0,k)=0."""
    import math

    from satellite_data_ingestion_spark import registry
    from satellite_data_ingestion_spark.llm.retrieval import _NDCG_QUERIES

    def vec(theta):
        return [math.cos(theta), math.sin(theta)] + [0.0] * 6

    rows = []
    for qid in range(_NDCG_QUERIES):
        # label 99 for query 0: matches nothing below
        rows.append((qid, vec(0.05 * qid), 99 if qid == 0 else 0))
    for i in range(15):
        rows.append((50 + i, vec(0.03 * i), 0))
    _write_embeddings(spark, tmp_path, rows)
    out = {r.query_vec: r for r in registry.spec("ext_ndcg").fn(spark, str(tmp_path)).collect()}
    assert len(out) == _NDCG_QUERIES  # every query row present
    assert out[0].n_relevant == 0
    assert out[0].hits_at_k == 0
    assert out[0].ndcg_at_k == 0.0
    assert out[1].n_relevant > 0 and out[1].ndcg_at_k > 0
