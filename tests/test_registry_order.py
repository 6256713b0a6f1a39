"""Pin the driver-sweep ordering contract of ``registry.queries()``.

Round 1's driver sweep was capped at 50 entries and consumed the registry
alphabetically, leaving 41 of 61 SURVEY.md §2 base operators with no
correctness row.  ``queries()`` must therefore yield the §2 base inventory
first (SQL-oracle batch queries before streaming, rows-only last) and
extensions after, SQL-oracle extensions before rows-only ones.
"""

from satellite_data_ingestion_spark import registry


def test_base_inventory_is_complete_and_first():
    keys = list(registry.queries())
    base = registry._SURVEY2_BASE_IDS
    assert len(base) == 61
    # Every §2 ID is registered, and the first 61 keys are exactly the base set.
    assert set(keys[:len(base)]) == set(base)
    assert keys[: len(base)] == [k for k in base if k in registry._REGISTRY]


def test_base_sql_oracle_queries_precede_rows_only():
    oracles = registry.oracles()
    base = registry._SURVEY2_BASE_IDS
    # Tier boundaries: everything before the first rows-only base ID that
    # is batch-cheap must carry a SQL oracle (strongest evidence first).
    tier_a = base[: base.index("sink_atomic_state")]
    for k in tier_a:
        assert k in oracles, f"tier-A base id {k} lost its SQL oracle"


def test_extensions_sql_first():
    keys = list(registry.queries())
    oracles = registry.oracles()
    ext = keys[len(registry._SURVEY2_BASE_IDS):]
    seen_rows_only = False
    for k in ext:
        if k not in oracles:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"SQL-oracle extension {k} after rows-only"
