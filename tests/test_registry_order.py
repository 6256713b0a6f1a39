"""Pin the driver-sweep ordering contract of ``registry.queries()``.

The driver's correctness sweep is capped (observed: exactly 50 entries in
rounds 1-4), so ``queries()`` orders the registry as a freshness LRU:

  1. never-driver-verified IDs first, in canonical order (§2 base inventory
     before extensions, SQL-oracle before rows-only within each block);
  2. then verified IDs, oldest green round first (evidence AGE dominates —
     the round-6 verdict found fresh rows-only evidence crowding a 62-deep
     r02/r03 backlog out of the 50-slot window);
  3. within a round, rows-only before hash-oracle (weakest evidence class
     goes stale fastest among equally-old rows).

Coverage therefore accumulates across rounds, and once complete every
entry's driver evidence is refreshed at most ceil(registry/cap) rounds
after it was last recorded.
"""

from satellite_data_ingestion_spark import registry


def test_base_inventory_registered():
    keys = list(registry.queries())
    base = registry._SURVEY2_BASE_IDS
    assert len(base) == 61
    assert set(base) <= set(keys), "every §2 base ID must be registered"


def test_unverified_ids_fit_in_sweep_cap():
    """Everything without prior driver evidence must land in the first 50
    slots (the observed driver cap) — the whole point of the rotation."""
    keys = list(registry.queries())
    latest = registry._latest_green_round()
    unverified = [k for k in keys if k not in latest]
    if len(unverified) <= 50:
        assert all(k in keys[:50] for k in unverified)


def test_unverified_precede_verified():
    keys = list(registry.queries())
    latest = registry._latest_green_round()
    if not latest or all(k in latest for k in keys):
        return
    unv_max = max(keys.index(k) for k in keys if k not in latest)
    ver_min = min(keys.index(k) for k in keys if k in latest)
    assert unv_max < ver_min, "unverified IDs must precede verified ones"


def test_verified_rows_only_precede_hash_oracle_within_round():
    """Within one green round, rows-only evidence is refreshed first —
    but round AGE dominates (an r02 hash-oracle ID fronts an r06
    rows-only one).  Exception: an ID whose oracle was added AFTER its
    last sweep (evidence rows-only, oracle present) fronts even earlier —
    its hash check has never run (round-5 verdict, fn_urlencode)."""
    keys = list(registry.queries())
    latest = registry._latest_green_round()
    oracles = registry.oracles()
    verified = [
        k for k in keys if k in latest and not (k in oracles and not latest[k][1])
    ]
    by_round: dict[int, list[str]] = {}
    for k in verified:
        by_round.setdefault(latest[k][0], []).append(k)
    for rnd, ks in by_round.items():
        seen_hash_oracle = False
        for k in ks:
            if k in oracles:
                seen_hash_oracle = True
            else:
                assert not seen_hash_oracle, (
                    f"rows-only {k} after a hash-oracle ID within round {rnd}"
                )


def test_verified_ordered_oldest_evidence_first():
    """Evidence age dominates across ALL verified IDs regardless of
    oracle class — the whole point of the round-7 rotation fix."""
    keys = list(registry.queries())
    latest = registry._latest_green_round()
    oracles = registry.oracles()
    rounds = [
        latest[k][0]
        for k in keys
        if k in latest and not (k in oracles and not latest[k][1])
    ]
    assert rounds == sorted(rounds), (
        "verified IDs must be swept oldest-green-round first"
    )


def test_stale_cohort_fills_sweep_window():
    """With the r01-r06 evidence on disk, the 50-slot window must be
    spent on the OLDEST evidence: no verified ID in the first 50 slots
    may be fresher than a verified ID outside them.  Excepted, because
    they legitimately front: never-swept IDs, and IDs whose oracle was
    attached AFTER their last sweep (their hash check has never run —
    rows-only evidence, any age, is the weaker class)."""
    keys = list(registry.queries())
    latest = registry._latest_green_round()
    oracles = registry.oracles()

    def hash_verified(k):
        return k in latest and not (k in oracles and not latest[k][1])

    inside = [latest[k][0] for k in keys[:50] if hash_verified(k)]
    outside = [latest[k][0] for k in keys[50:] if hash_verified(k)]
    if inside and outside:
        assert max(inside) <= min(outside)


def test_without_prior_evidence_base_ids_lead(monkeypatch):
    monkeypatch.setattr(registry, "_latest_green_round", lambda: {})
    keys = list(registry.queries())
    base = registry._SURVEY2_BASE_IDS
    assert keys[: len(base)] == [k for k in base if k in registry._REGISTRY]


def test_base_sql_oracle_queries_precede_rows_only():
    oracles = registry.oracles()
    base = registry._SURVEY2_BASE_IDS
    # Tier boundaries: everything before the first rows-only base ID that
    # is batch-cheap must carry a SQL oracle (strongest evidence first).
    tier_a = base[: base.index("sink_atomic_state")]
    for k in tier_a:
        assert k in oracles, f"tier-A base id {k} lost its SQL oracle"


def test_extensions_sql_first(monkeypatch):
    monkeypatch.setattr(registry, "_latest_green_round", lambda: {})
    keys = list(registry.queries())
    oracles = registry.oracles()
    ext = keys[len(registry._SURVEY2_BASE_IDS):]
    seen_rows_only = False
    for k in ext:
        if k not in oracles:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"SQL-oracle extension {k} after rows-only"


def test_docs_registry_count_in_sync():
    """BASELINE.md's registry-size line must equal the live registry —
    the count drifted by one in two consecutive rounds when maintained
    by hand, so it is now generated evidence: update the doc when this
    fails."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BASELINE.md")) as fh:
        m = re.search(r"Registry size: \*\*(\d+)\*\* registered queries", fh.read())
    assert m, "BASELINE.md lost its generated registry-size line"
    assert int(m.group(1)) == len(registry.queries()), (
        f"BASELINE.md says {m.group(1)}, registry holds {len(registry.queries())}"
    )


def test_docs_pytest_count_in_sync():
    """BASELINE.md's pytest-suite-size line must equal a fresh collection —
    the round-10 doc said 553 while the suite held 555 (hand-maintained
    counts drift the round they're written), so it is generated evidence
    now: update the doc when this fails."""
    import os
    import re
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BASELINE.md")) as fh:
        m = re.search(r"Pytest suite size: \*\*(\d+)\*\* collected tests", fh.read())
    assert m, "BASELINE.md lost its generated pytest-suite-size line"
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=root,
        capture_output=True,
        text=True,
        timeout=120,
    )
    mc = re.search(r"(\d+) tests collected", out.stdout)
    assert mc, f"could not parse collection output: {out.stdout[-500:]}"
    assert int(m.group(1)) == int(mc.group(1)), (
        f"BASELINE.md says {m.group(1)}, suite collects {mc.group(1)}"
    )


def test_register_rejects_cross_module_duplicates():
    """A second registration of an existing query id from a different
    module must raise — it silently shadowed existing operators twice
    during development; same-module redefinition stays allowed."""
    import types

    import pytest as _pytest

    from satellite_data_ingestion_spark import registry

    registry.load_all()
    fake = types.FunctionType((lambda s, d: None).__code__, {}, "dup")
    fake.__module__ = "tests.other_module"
    with _pytest.raises(ValueError, match="already registered"):
        registry.register("scan_parquet")(fake)


def test_bench_tier_names_valid():
    """Every bench.py tier entry (NEW_THIS_ROUND / CORE / ROTATION) must
    be a registered query; CORE and ROTATION must be disjoint and
    duplicate-free — a renamed/retired query would otherwise break the
    bench only at runtime, losing the whole round's perf artifact.  Also
    pins the rotation-coverage property: the crc32 tranche split covers
    every ROTATION entry exactly once across ROTATION_TRANCHES rounds."""
    import ast
    import os
    import zlib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tree = ast.parse(open(os.path.join(root, "bench.py")).read())
    lists: dict = {}
    k = None
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            tid = getattr(node.targets[0], "id", "")
            if tid in ("NEW_THIS_ROUND", "CORE", "ROTATION"):
                lists[tid] = [ast.literal_eval(e) for e in node.value.elts]
            elif tid == "ROTATION_TRANCHES":
                k = ast.literal_eval(node.value)
    assert set(lists) == {"NEW_THIS_ROUND", "CORE", "ROTATION"}, lists.keys()
    assert k and k >= 2
    qs = set(registry.queries())
    for tier, names in lists.items():
        missing = [n for n in names if n not in qs]
        assert not missing, f"{tier} names not in registry: {missing}"
        assert len(names) == len(set(names)), f"duplicate {tier} entries"
    assert not set(lists["CORE"]) & set(lists["ROTATION"]), "CORE/ROTATION overlap"
    tranches = [
        {n for n in lists["ROTATION"] if zlib.crc32(n.encode()) % k == t}
        for t in range(k)
    ]
    assert set().union(*tranches) == set(lists["ROTATION"])
    assert sum(len(t) for t in tranches) == len(lists["ROTATION"])


def test_bench_tranche_derived_from_max_round_not_artifact_count():
    """VERDICT r13 task 7: the rotation tranche must be derived from the
    MAX round number among BENCH_r*.json artifacts, not their count — a
    round writing two artifacts (as r13 nearly did) would otherwise
    silently skip a tranche.  Pin by source inspection: the fallback
    branch must regex the round number and take max(), and must NOT use
    len(glob...) anywhere in the tranche derivation."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(root, "bench.py")).read()
    # r16 wrapped the rounds scan in _recorded_rounds() (the sidecar name
    # also needs it), so inspect from the scan through the tranche
    # derivation to the full-list escape hatch.
    tranche_block = src.split("def _recorded_rounds")[1].split(
        "SPARK_GRAFT_BENCH_FULL"
    )[0]
    assert "BENCH_r(\\d+)" in tranche_block, (
        "tranche fallback must parse round numbers from BENCH_r{N}.json names"
    )
    assert "max(rounds)" in tranche_block
    assert "len(glob" not in tranche_block, "tranche must not depend on artifact count"
    # VERDICT r15 task 2: the round number must come from the COMMITTED
    # artifact set first (git ls-files), so the driver writing
    # BENCH_r{N}.json between its main and low-core runs cannot advance
    # the rotation tranche mid-round and decohere the scaling comparison.
    assert "ls-files" in tranche_block, (
        "round derivation must prefer committed BENCH artifacts (git ls-files)"
    )


def test_bench_cleanup_unpersists_leaked_checkpoints(spark):
    """VERDICT r15 task 1: after each timed query, bench.py must release
    the executor blocks the query's ``localCheckpoint(eager=True)``
    intermediates left behind — the r15 driver session accumulated enough
    cleaner backlog that untouched sub-second queries sporadically
    inflated 2–15× late in the 223-query loop.  Pin the helper's
    behavior: a leaked checkpoint's blocks are persisted before the call
    and gone after it."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "sdis_bench_under_test", os.path.join(root, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    df = spark.range(1000).localCheckpoint(eager=True)
    persistent = spark.sparkContext._jsc.getPersistentRDDs()
    assert persistent.size() > 0, "localCheckpoint should persist blocks"
    mod._cleanup_query_state(spark)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
    del df


def test_every_query_has_committed_correctness_evidence():
    """VERDICT r14 tasks 2+6: the grading driver samples only 50 queries
    per round, so an ID could in principle ship with NO committed
    correctness evidence for many rounds.  Mechanize the closing-sweep
    contract: every registered query must appear either in the sampled
    CORRECTNESS_r*.json history or in the CURRENT round's committed
    full-sweep artifact (CORRECTNESS_full_r{N}.json, written by
    tests/driver_sim.py), and a full-sweep entry that covers an
    otherwise-unsampled ID must be a PASS (hash_match for oracled
    queries, rows_match for rows-only), not an error row.  Fails when a
    new op lands without the closing sweep, or when the artifact rots a
    round behind the registry."""
    import glob
    import json
    import os
    import re

    from satellite_data_ingestion_spark import registry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sampled: set = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        if re.search(r"CORRECTNESS_r\d+\.json$", p):
            with open(p) as fh:
                sampled |= set(json.load(fh))
    fulls = {
        int(m.group(1)): p
        for p in glob.glob(os.path.join(root, "CORRECTNESS_full_r*.json"))
        if (m := re.search(r"CORRECTNESS_full_r(\d+)\.json$", p))
    }
    assert fulls, (
        "no CORRECTNESS_full_r{N}.json committed — run the closing sweep "
        "(python tests/driver_sim.py) before shipping the round"
    )
    with open(fulls[max(fulls)]) as fh:
        full = json.load(fh)
    oracled = set(registry.oracles())
    missing, bad = [], []
    for name in registry.queries():
        rec = full.get(name)
        if name in sampled and rec is None:
            continue  # sampled in some round; full artifact may predate it
        if rec is None:
            missing.append(name)
        elif rec.get("err") is not None or not (
            rec.get("hash_match") if name in oracled else rec.get("rows_match")
        ):
            bad.append((name, rec.get("err")))
    assert not missing, f"no committed correctness evidence for: {missing}"
    assert not bad, f"full-sweep artifact records failures: {bad}"
