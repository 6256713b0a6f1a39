"""Independent-reference pins for wave O: the streaming EWMA control
twin and the vocabulary diversity panel."""

from __future__ import annotations

import math
from collections import Counter

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def test_stream_ewma_matches_batch_twin(spark):
    sr = registry.spec("stream_ewma_monitor").fn(spark, SF).collect()
    br = registry.spec("win_ewma_control").fn(spark, SF).collect()
    assert len(sr) == len(br) > 0
    for s, b in zip(sorted(sr, key=lambda x: x.d), sorted(br, key=lambda x: x.d)):
        assert s.d == b.d
        assert abs(s.ewma - b.ewma) < 1e-9
        assert abs(s.lcl - b.lcl) < 1e-9
        assert abs(s.ucl - b.ucl) < 1e-9
        assert s.out_of_control == b.out_of_control


def test_diversity_indices_match_reference(spark):
    (r,) = registry.spec("ext_diversity_indices").fn(spark, SF).collect()
    docs = table(spark, SF, "documents").select("text").collect()
    c: Counter = Counter()
    for d in docs:
        c.update(w for w in (d.text or "").lower().split() if w)
    s = len(c)
    n = sum(c.values())
    h = sum((k / n) * math.log(n / k) for k in c.values())
    simpson = 1.0 - sum(k * k for k in c.values()) / (n * n)
    inv = (n * n) / sum(k * k for k in c.values())
    bp = max(c.values()) / n
    assert (r.richness, r.tokens) == (s, n)
    assert abs(r.shannon_h - h) < 2e-6
    assert abs(r.evenness - h / math.log(s)) < 2e-6
    assert abs(r.simpson_d - simpson) < 2e-6
    assert abs(r.inv_simpson - inv) < 2e-6
    assert abs(r.berger_parker - bp) < 2e-6
    # hill-number ordering: richness >= exp(H) >= inverse Simpson >= 1/BP
    assert s >= math.exp(h) - 1e-9
    assert math.exp(h) >= inv - 1e-9
    assert inv >= 1.0 / bp - 1e-9
