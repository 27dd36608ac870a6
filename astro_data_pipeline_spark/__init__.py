"""astro_data_pipeline_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine (NOT a port) with the data-processing capabilities of the
reference astronomical staging-to-catalog pipeline (p27mcgee/astro-data-pipeline),
re-expressed Spark-first:

- ``cdc``       : binlog/WAL replay → LWW dedup → MERGE upsert into a lake table
                  (the Spark restatement of the reference's S3-event →
                  processing-job → catalog-upsert flow, see SURVEY.md §3.1)
- ``lakehouse`` : parquet-backed snapshot/manifest table format with atomic
                  commits, bucketed layout, additive schema evolution and
                  time travel (stands in for Iceberg — no lake-format jars in
                  this environment)
- ``operators`` : the relational operator surface of the reference (joins,
                  aggregations, windows, top-k, set ops — SURVEY.md §2)
- ``functions`` : scalar/vectorized function library (sha256 Arrow UDF,
                  astronomy math, path/string helpers)
- ``textops``   : large-scale training-data operators (dedup families,
                  similarity search, text quality, multimodal plumbing)
- ``streaming`` : Structured Streaming ingest path (readStream → foreachBatch
                  exactly-once apply)
"""

__version__ = "0.1.0"
