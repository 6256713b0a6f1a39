"""Round-5 driver simulation: entry() smoke + full queries() vs oracle_sql()
sweep at sf0.01 in a PLAIN SparkSession (hostile timezone preset), exactly
as the grading driver does.

Since round 15 (VERDICT r14 task 2) the sweep also writes a
grader-auditable artifact in the driver's per-query schema:
``CORRECTNESS_full_r{N}.json`` at the repo root (N = max round among the
committed ``CORRECTNESS_r*.json`` files + 1, or ``$SPARK_GRAFT_ROUND``),
so every query the 50-sample driver rotation never drew is still covered
by committed evidence — ``tests/test_registry_order.py`` fails the suite
if any registered query is in neither the sampled history nor the
current full-sweep artifact.
"""
import glob
import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.session.timeZone", "America/New_York")  # hostile preset
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
from oracle import duck_con, compare

rows = e.entry(spark).collect()
assert len(rows) > 0, "entry() smoke returned no rows"
rows2 = e.entry(spark).collect()  # calling entry twice must work
assert len(rows2) == len(rows)
print(f"entry() smoke OK: {len(rows)} rows", flush=True)

qs, osql = e.queries(), e.oracle_sql()
sfd = "/root/testdata/sf0.01"
t0 = time.time()
n_match = n_rowsonly = n_fail = 0
fails = []
results = {}
for i, (name, fn) in enumerate(qs.items()):
    rec = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        df = fn(spark, sfd)
        if name in osql:
            con = duck_con(sfd)
            diff = compare(df, con, osql[name])
            con.close()
            ok = not diff
            rec.update(
                rows_match=ok or not any("row" in d for d in diff),
                schema_match=ok or not any("column" in d or "schema" in d for d in diff),
                hash_match=ok,
            )
            if diff:
                n_fail += 1
                rec["err"] = str(diff)[:300]
                fails.append((name, str(diff)[:300]))
                print(f"[{i+1}/{len(qs)}] {name} MISMATCH {str(diff)[:200]}", flush=True)
            else:
                n_match += 1
        else:
            n = df.count()
            assert n >= 0
            rec.update(rows_match=True, spark_rows=n)
            n_rowsonly += 1
    except Exception as ex:
        n_fail += 1
        rec["err"] = repr(ex)[:300]
        fails.append((name, repr(ex)[:300]))
        traceback.print_exc()
        print(f"[{i+1}/{len(qs)}] {name} ERROR {ex!r}", flush=True)
    results[name] = rec

print(f"SWEEP DONE in {time.time()-t0:.0f}s: {n_match} MATCH, {n_rowsonly} rows-only, {n_fail} FAIL of {len(qs)}")
for name, msg in fails:
    print("FAIL:", name, msg)

repo = "/root/repo"
rnd = os.environ.get("SPARK_GRAFT_ROUND")
if rnd is None:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    rnd = str((max(rounds) + 1) if rounds else 1)
artifact = os.path.join(repo, f"CORRECTNESS_full_r{rnd}.json")
with open(artifact, "w") as fh:
    json.dump(results, fh, indent=1, sort_keys=True)
    fh.write("\n")
print(f"full-sweep artifact -> {artifact}")
sys.exit(1 if n_fail else 0)
