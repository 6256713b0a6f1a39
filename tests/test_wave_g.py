"""Independent-reference pins for wave G: the financial-indicator trio
over OHLC bars (ATR, MACD, stochastic oscillator) and the LLM curation
pair (SoftDeDup weights, CCNet perplexity buckets)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.catalog import table

SF = "/root/testdata/sf0.001"


def _bars_ref(spark):
    """(event_type -> [(day, hi, lo, close_cents)] sorted by day) from a
    direct collect with (ts, event_id) close ordering."""
    rows = table(spark, SF, "events").select(
        "event_type", "ts", "event_id", F.round(F.col("value") * 100).cast("long").alias("c")
    ).collect()
    cells: dict = {}
    for r in rows:
        key = (r.event_type, r.ts.date())
        cells.setdefault(key, []).append((r.ts, int(r.event_id), int(r.c)))
    series: dict = defaultdict(list)
    for (et, day), pts in cells.items():
        pts.sort()
        series[et].append(
            (day, max(c for _, _, c in pts), min(c for _, _, c in pts), pts[-1][2])
        )
    for et in series:
        series[et].sort()
    return series


def test_atr_matches_reference(spark):
    out = {
        (r.event_type, r.day): r
        for r in registry.spec("win_atr").fn(spark, SF).collect()
    }
    series = _bars_ref(spark)
    n_checked = 0
    for et, bars in series.items():
        trs = []
        for i, (day, hi, lo, cl) in enumerate(bars):
            if i == 0:
                tr = hi - lo
            else:
                pc = bars[i - 1][3]
                tr = max(hi - lo, abs(hi - pc), abs(lo - pc))
            trs.append(tr)
            window = trs[max(0, i - 13) : i + 1]
            r = out[(et, day)]
            assert abs(r.true_range - tr / 100) < 1e-9
            assert abs(r.atr - sum(window) / len(window) / 100) < 2e-6
            n_checked += 1
    assert n_checked == len(out)


def _kernel(vals, alpha, k=8):
    """Bounded-kernel EMA reference (the engine's ts_ewma discipline)."""
    w = [(1.0 - alpha) ** i for i in range(k)]
    out = []
    for i in range(len(vals)):
        num = den = 0.0
        for j, wt in enumerate(w):
            if i - j >= 0:
                num += vals[i - j] * wt
                den += wt
        out.append(num / den)
    return out


def test_macd_matches_reference(spark):
    out = {
        (r.event_type, r.day): r
        for r in registry.spec("win_macd").fn(spark, SF).collect()
    }
    series = _bars_ref(spark)
    for et, bars in series.items():
        closes = [float(c) for _, _, _, c in bars]
        macd = [
            a - b
            for a, b in zip(
                _kernel(closes, 2 / 13), _kernel(closes, 2 / 27)
            )
        ]
        signal = _kernel(macd, 2 / 10)
        for i, (day, _, _, _) in enumerate(bars):
            r = out[(et, day)]
            assert abs(r.macd - macd[i] / 100) < 2e-6
            assert abs(r.signal - signal[i] / 100) < 2e-6
            assert abs(r.histogram - (macd[i] - signal[i]) / 100) < 2e-6


def test_stochastic_matches_reference(spark):
    out = {
        (r.event_type, r.day): r
        for r in registry.spec("win_stochastic_osc").fn(spark, SF).collect()
    }
    series = _bars_ref(spark)
    for et, bars in series.items():
        ks = []
        for i, (day, hi, lo, cl) in enumerate(bars):
            win = bars[max(0, i - 13) : i + 1]
            hh = max(h for _, h, _, _ in win)
            ll = min(lo_ for _, _, lo_, _ in win)
            k = 50.0 if hh == ll else 100.0 * (cl - ll) / (hh - ll)
            ks.append(k)
            d = sum(ks[max(0, i - 2) : i + 1]) / len(ks[max(0, i - 2) : i + 1])
            r = out[(et, day)]
            assert abs(r.pct_k - k) < 2e-6
            assert abs(r.pct_d - d) < 2e-6
            assert -1e-9 <= r.pct_k <= 100.0 + 1e-9


def test_softdedup_weights_match_reference(spark):
    rows = registry.spec("ext_softdedup_weights").fn(spark, SF).collect()
    docs = table(spark, SF, "documents").select("doc_id", "text").collect()
    cnt = Counter(d.text for d in docs)
    byid = {int(d.doc_id): cnt[d.text] for d in docs}
    assert len(rows) == len(docs)
    eff = 0.0
    for r in rows:
        dc = byid[r.doc_id]
        assert r.dup_count == dc
        assert abs(r.weight_inv - 1.0 / dc) < 2e-6
        assert abs(r.weight_sqrt - 1.0 / math.sqrt(dc)) < 2e-6
        eff += 1.0 / dc
    # sum of 1/dup over all docs == number of DISTINCT texts
    assert abs(eff - len(cnt)) < 1e-3


def test_perplexity_buckets_match_reference(spark):
    rows = registry.spec("ext_perplexity_buckets").fn(spark, SF).collect()
    docs = table(spark, SF, "documents").select("doc_id", "lang", "text").collect()
    gv: Counter = Counter()
    per_doc = []
    for d in docs:
        ws = [w for w in (d.text or "").lower().split() if w]
        gv.update(ws)
        per_doc.append((int(d.doc_id), d.lang, ws))
    tw = sum(gv.values())
    by_lang: dict = defaultdict(list)
    for did, lang, ws in per_doc:
        if not ws:
            continue
        spm = math.floor(
            sum(math.log(tw / gv[w]) for w in ws) / len(ws) * 1e6 + 0.5
        )
        by_lang[lang].append((spm, did))
    expect: dict = {}
    for lang, lst in by_lang.items():
        lst.sort()
        n = len(lst)
        for rk, (spm, _) in enumerate(lst, 1):
            b = "head" if rk * 3 <= n else ("middle" if rk * 3 <= 2 * n else "tail")
            expect.setdefault((lang, b), []).append(spm)
    assert {(r.lang, r.bucket) for r in rows} == set(expect)
    for r in rows:
        spms = expect[(r.lang, r.bucket)]
        assert r.n_docs == len(spms)
        assert abs(r.min_surprisal - min(spms) / 1e6) < 2e-6
        assert abs(r.max_surprisal - max(spms) / 1e6) < 2e-6
        assert abs(r.avg_surprisal - sum(spms) / len(spms) / 1e6) < 2e-6
    # CCNet ordering: head is the most fluent (lowest surprisal) third
    for lang in by_lang:
        h = [r for r in rows if r.lang == lang and r.bucket == "head"]
        t = [r for r in rows if r.lang == lang and r.bucket == "tail"]
        if h and t:
            assert h[0].max_surprisal <= t[0].min_surprisal + 1e-9
