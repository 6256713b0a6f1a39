"""Round-5 driver simulation: entry() smoke + full queries() vs oracle_sql()
sweep at sf0.01 in a PLAIN SparkSession (hostile timezone preset), exactly
as the grading driver does."""
import sys, time, traceback

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
for i, (name, fn) in enumerate(qs.items()):
    try:
        df = fn(spark, sfd)
        if name in osql:
            con = duck_con(sfd)
            diff = compare(df, con, osql[name])
            con.close()
            if diff:
                n_fail += 1
                fails.append((name, str(diff)[:300]))
                print(f"[{i+1}/{len(qs)}] {name} MISMATCH {str(diff)[:200]}", flush=True)
            else:
                n_match += 1
        else:
            n = df.count()
            assert n >= 0
            n_rowsonly += 1
    except Exception as ex:
        n_fail += 1
        fails.append((name, repr(ex)[:300]))
        traceback.print_exc()
        print(f"[{i+1}/{len(qs)}] {name} ERROR {ex!r}", flush=True)

print(f"SWEEP DONE in {time.time()-t0:.0f}s: {n_match} MATCH, {n_rowsonly} rows-only, {n_fail} FAIL of {len(qs)}")
for name, msg in fails:
    print("FAIL:", name, msg)
sys.exit(1 if n_fail else 0)
