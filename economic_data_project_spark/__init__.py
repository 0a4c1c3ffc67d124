"""economic_data_project_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
economic-data platform (C00ldudeNoonan/economic-data-project) as idiomatic
Spark: DataFrame/SQL transformations over Parquet, window functions and
higher-order functions for the technical-analysis idioms, ``applyInPandas``
kernels for the matrix signals, and Spark ML for the text/ML stages.

Layout:
    session    — SparkSession factory (AQE, Arrow, UTC session TZ)
    catalog    — test-table registry over the synthetic parquet star schema
    functions  — BigQuery->Spark dialect layer + TA primitive library
    sources    — warehouse API (execute_query/write/upsert), file sources
    operators  — declared queries (each with a DuckDB oracle where possible)
    signals    — numerically-heavy signal kernels (turbulence, PCA, entropy)
    text       — document pipeline (chunking, dedup, quality, TF-IDF, ML)
    similarity — embedding similarity search (brute-force + LSH ANN)
    streaming  — Structured Streaming surface over the events table
    multimodal — binary media columns + Arrow-batched decode stages
    quality    — assertion pack + dq anomaly queries
    plans      — dbt-style ref/DAG executor
"""

__version__ = "0.1.0"
