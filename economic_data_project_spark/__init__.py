"""economic_data_project_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
economic-data platform (C00ldudeNoonan/economic-data-project) as idiomatic
Spark: DataFrame/SQL transformations over Parquet, window functions and
higher-order functions for the technical-analysis idioms, ``applyInPandas``
kernels for the matrix signals, and Spark ML for the text/ML stages.

Layout:
    session    — SparkSession factory (AQE, Arrow, UTC session TZ)
    catalog    — test-table registry over the synthetic parquet star schema
    functions  — BigQuery->Spark dialect layer (safe_divide, qualify dedup, ...)
    ta         — technical-analysis primitive library (rolling, zscore, EWM)
    warehouse  — warehouse-style API (execute_query, write_table, upsert)
    operators  — declared queries (each with a DuckDB oracle where possible)
    signals    — numerically-heavy signal kernels (turbulence, PCA, entropy)
    text       — document pipeline (chunking, dedup, quality, TF-IDF, search)
    similarity — embedding similarity search (brute-force + LSH ANN)
    streaming  — Structured Streaming surface over the events table
    plans      — dbt-style ref/DAG executor
"""

__version__ = "0.1.0"
