"""PySpark-native analytics engine with the query/data-processing
capabilities of ``htran174/TopN-ClashRoyal-ETL-SQL-snapshot``.

The reference is a single-run batch ETL + star-schema warehouse
(Python dict accumulators + Postgres SQL). This package re-expresses
those semantics as an idiomatic Spark DataFrame DAG:

- ``sources``    explicit StructType schemas + readers (JSON landing zone,
                 parquet warehouse, static card catalog)
- ``functions``  column-expression library (hashes, tag/variant scalars,
                 text analytics, vector math) — no row-at-a-time UDFs
- ``operators``  deck extraction/classification, dedup family (exact,
                 MinHash-LSH, SimHash, n-gram Jaccard, embedding), ANN
                 similarity search, multimodal column plumbing
- ``plans``      the ETL pipeline DAG, the analysis query surface (F1-F7),
                 and the validation suite (G1-G6)
- ``sinks``      snapshot (overwrite) parquet/JDBC writers
- ``streaming``  incremental refresh via Structured Streaming foreachBatch
"""

__version__ = "0.1.0"
