"""satellite_data_ingestion_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data-processing capabilities of the
reference pipeline ``wmo-raf/satellite-data-ingestion`` (an incremental
satellite-image ETL job) as an idiomatic Spark engine:

- DataFrame/SQL first: every operator is declared as a lazy logical plan and
  optimized by Catalyst (predicate pushdown, column pruning, join selection).
- Structured Streaming for the incremental layer (the reference's scheduler
  tick + JSON-state checkpoint, ``main.py:28-29`` / ``sources/meteosat.py:61-93``
  in the reference).
- Pandas UDFs (Arrow-vectorized) only where relational operators genuinely
  cannot express the semantics (raster decode, minhash signatures, ANN).

Layout:
- ``operators/``  relational operators (scans, filters, joins, aggs, windows, set ops)
- ``functions/``  scalar function surface
- ``sources/``    sources & sinks (binary scan, catalog JSON, partitioned sink, state)
- ``streaming/``  Structured Streaming surface (windows, watermark, stateful dedup)
- ``llm/``        large-scale training-data ops (dedup, similarity, text, multimodal)
- ``plans/``      end-to-end pipeline compositions (ingestion parity)

Every public query is registered in ``registry`` under a stable ID from
``SURVEY.md §2`` together with a DuckDB oracle SQL string when the semantics
are SQL-expressible.
"""

__version__ = "0.1.0"
