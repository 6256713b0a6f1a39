"""The env-layering contract of settings.py: BASE -> SDIS_ENV profile ->
per-knob SDIS_<NAME> override, resolved once at import."""

from __future__ import annotations

import pytest

from satellite_data_ingestion_spark import settings


def test_defaults_match_base():
    assert settings._resolve() == {**settings._BASE, **settings._PROFILES["dev"]}
    # The tested defaults every oracle was pinned against.
    assert settings.MAX_BUCKET == 500
    assert settings.TILE_P == 4
    assert settings.CC_MAX_ITERS == 10
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
