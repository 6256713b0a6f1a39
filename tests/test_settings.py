"""The env-layering contract of settings.py: BASE -> SDIS_ENV profile ->
per-knob SDIS_<NAME> override, resolved once at import."""

from __future__ import annotations

import os

import pytest

from satellite_data_ingestion_spark import settings


def test_defaults_match_base():
    assert settings._resolve() == {**settings._BASE, **settings._PROFILES["dev"]}
    # The tested defaults every oracle was pinned against.
    assert settings.MAX_BUCKET == 500
    assert settings.TILE_P == 4
    assert settings.CC_MAX_ITERS == 20
    assert settings.SHUFFLE_PARTITIONS == 16


def test_profile_overlay(monkeypatch):
    monkeypatch.setenv("SDIS_ENV", "prod")
    resolved = settings._resolve()
    assert resolved["MAX_BUCKET"] == settings._PROFILES["prod"]["MAX_BUCKET"]
    # Knobs the profile does not touch keep their BASE values.
    assert resolved["LSH_N_TABLES"] == settings._BASE["LSH_N_TABLES"]


def test_per_knob_env_override_beats_profile(monkeypatch):
    monkeypatch.setenv("SDIS_ENV", "prod")
    monkeypatch.setenv("SDIS_MAX_BUCKET", "12345")
    assert settings._resolve()["MAX_BUCKET"] == 12345


def test_unknown_profile_raises(monkeypatch):
    monkeypatch.setenv("SDIS_ENV", "staging")
    with pytest.raises(ValueError, match="unknown profile"):
        settings._resolve()


def test_every_knob_is_exported():
    for name in settings._BASE:
        assert getattr(settings, name) == settings._SETTINGS[name]


def test_prod_profile_runs_end_to_end():
    """SDIS_ENV=prod must be a WORKING configuration, not just documented:
    run knob-dependent operators (minhash bucket cap, IVF quantizer, tiled
    embedding join, range-partitioned shuffle index) under the prod
    overlay in a subprocess (settings resolve at import) and require sane
    row counts.  Catches a profile value that breaks an operator shape
    (e.g. a partition count that starves a kernel of rows)."""
    import subprocess
    import sys

    code = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("OFF")
from satellite_data_ingestion_spark import registry, settings
assert settings.MAX_BUCKET == 100000 and settings.TILE_P == 64
registry.load_all()
sf = "/root/testdata/sf0.001"
for name, min_rows in [("ext_dedup_minhash", 1), ("ext_sim_ivf", 10),
                       ("ext_dedup_embedding", 1), ("ext_shuffle_index", 500),
                       # round-6 additions: the SDIS_PQ_* knobs and the
                       # Delta-table family landed after the original
                       # prod smoke — cover one PQ and one Delta path.
                       ("ext_sim_pq_indexed", 10), ("sink_delta_merge", 1),
                       # round-7 additions: CDF write/read path and the
                       # IVF-probed kNN self-join under the prod knobs.
                       ("source_delta_cdf", 1), ("ext_knn_join_ivf", 10)]:
    n = registry.spec(name).fn(spark, sf).count()
    assert n >= min_rows, f"{name}: {n} rows under prod profile"
print("PROD_OK")
"""
    env = {"SDIS_ENV": "prod", "PATH": os.environ["PATH"]}
    for k in ("JAVA_HOME", "HOME", "SPARK_HOME", "PYSPARK_PYTHON", "TMPDIR"):
        if k in os.environ:
            env[k] = os.environ[k]
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, timeout=420
    )
    assert out.returncode == 0 and b"PROD_OK" in out.stdout, (
        out.stdout[-2000:],
        out.stderr[-2000:],
    )


def test_unknown_override_key_raises(monkeypatch):
    """A misspelled SDIS_* override must fail loudly, not silently run on
    defaults."""
    monkeypatch.setenv("SDIS_LSH_NTABLES", "64")  # typo for SDIS_LSH_N_TABLES
    with pytest.raises(ValueError, match="SDIS_LSH_NTABLES"):
        settings._resolve()


def test_non_integer_override_names_the_knob(monkeypatch):
    monkeypatch.setenv("SDIS_MAX_BUCKET", "lots")
    with pytest.raises(ValueError, match="SDIS_MAX_BUCKET"):
        settings._resolve()


def test_lsh_n_planes_overflow_guard():
    """Stored LSH signatures bit-pack into int32: 32+ planes would silently
    overflow the stored side while query keys stay int64 (zero candidates,
    no error).  The module must refuse to import, naming the knob."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "try:\n"
        "    import satellite_data_ingestion_spark.llm.simsearch\n"
        "except ValueError as e:\n"
        "    assert 'SDIS_LSH_N_PLANES' in str(e), e\n"
        "    print('GUARD_OK')\n"
        "else:\n"
        "    print('NO_RAISE')\n"
    )
    env = {"SDIS_LSH_N_PLANES": "32", "PATH": os.environ["PATH"]}
    for k in ("JAVA_HOME", "HOME", "SPARK_HOME", "PYSPARK_PYTHON", "TMPDIR"):
        if k in os.environ:
            env[k] = os.environ[k]
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, timeout=120
    )
    assert out.returncode == 0 and b"GUARD_OK" in out.stdout, (
        out.stdout[-2000:],
        out.stderr[-2000:],
    )
