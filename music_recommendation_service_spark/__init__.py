"""music_recommendation_service_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / SQL / Catalyst / Structured
Streaming) engine providing the query and data-processing capabilities of the
reference lakehouse pipeline ``sdjaeb/music-recommendation-service``
(surveyed in SURVEY.md), plus the large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
required at 100 TB scale.

Layout
------
- ``session``    : SparkSession factory tuned for scale-out defaults.
- ``sources``    : table catalog + readers/writers (parquet-first, Delta-ready).
- ``operators``  : reusable relational building blocks (pair self-joins,
                   top-k, dedup families, similarity search, text analysis,
                   data-quality gates).
- ``functions``  : scalar/column helper expressions (portable hashing,
                   tokenization) kept JVM-side via pyspark.sql.functions.
- ``plans``      : the named query catalog — every operator in SURVEY.md §2
                   as an executable (spark, sf_dir) -> DataFrame, with a
                   DuckDB oracle SQL twin.
- ``streaming``  : Structured Streaming pipelines (ingest, watermarked
                   windows, stateful ops).
"""

__version__ = "0.1.0"
