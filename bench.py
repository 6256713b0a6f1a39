#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a `noop` sink write — full computation,
zero driver-side collection cost, so the number measures the engine, not
py4j transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from satellite_data_ingestion_spark import registry
from satellite_data_ingestion_spark.session import get_spark

HEADLINE = [
    "scan_parquet",
    "agg_hash_group",
    "agg_grid_resample",
    "join_equi_inner",
    "join_broadcast",
    "join_asof",
    "win_rank",
    "q5_local_supplier_volume",
    "agg_grid_resample_nn",
    "stream_tumbling",
    "ext_dedup_exact",
    "ext_dedup_minhash",
    "ext_sim_cosine",
    "ext_text_stats",
    "pipeline_ingest",
    "pipeline_training_data",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="sdis-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    qs = registry.queries()

    # Warm the JVM once (task scheduler, codegen, noop sink) so the first
    # timed query measures the engine, not startup.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        # warm the plan (file listing, schema inference) once
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
