"""data_ingestion_s3_to_parquet_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with (at least) the capabilities of the reference
``Guimarret/data_ingestion_s3_to_parquet`` (a single-file Rust/Polars
S3→zip→CSV→Parquet pipeline, see ``/root/reference/src/main.rs``),
re-expressed Spark-first and extended with the relational +
LLM-data-pipeline operator set from SURVEY.md §2.

Layout
------
- ``session``    SparkSession construction + runtime tuning applied to
                 foreign sessions (the verify driver owns its own session).
- ``sources``    table catalog over the parquet fixtures, CSV/zip/S3
                 ingestion sources (reference parity layer A).
- ``ingest``     the reference's end-to-end pipeline (fetch → unzip →
                 verify → project → parquet) as idiomatic PySpark.
- ``operators``  relational core + dedup/similarity/text-analysis
                 query operators (each a lazy DataFrame builder).
- ``functions``  reusable column-expression helpers (vector math, text
                 metrics, hashing) — JVM-side exprs first, pandas UDFs
                 only where built-ins can't express the semantics.
- ``streaming``  event-time window operators (batch-checkable) and the
                 Structured Streaming entry points.
- ``plans``      the query registry binding operator → oracle SQL.
"""

__version__ = "0.1.0"
