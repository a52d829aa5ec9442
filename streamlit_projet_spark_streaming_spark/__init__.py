"""streamlit_projet_spark_streaming_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference stack ``belaid-sarah/streamlit-projet-spark-streaming``
(a BigQuery + Streamlit real-time shopping-behavior dashboard with an
implied Spark Structured Streaming ingest Consumer).

Layout
------
- ``session``    : SparkSession builder (AQE on, UTC, tuned shuffle partitions)
- ``sources``    : batch + streaming table catalogs over parquet fixtures
- ``plans``      : the reference's four analytical views, fixture-mapped
                   variants, and the dashboard aggregate queries
- ``operators``  : reusable relational building blocks (bucketing, top-k per
                   group, ordered array_agg, pivot, histogram, latest-N) and
                   the large-scale-pipeline extensions (dedup, similarity
                   search, text analysis, multimodal plumbing)
- ``functions``  : scalar/enrichment column expressions (the reconstructed
                   Consumer's 10 derived columns)
- ``streaming``  : Structured Streaming ingest/enrichment pipeline + gold
                   table refresh (the reconstructed Consumer)
- ``registry``   : the driver-facing query registry (queries + DuckDB oracles)

Design stance (SURVEY.md §4, §7): everything is declarative DataFrame/SQL so
Catalyst gets predicate pushdown / column pruning / broadcast decisions for
free; no RDDs; Python UDFs only where builtins cannot express the semantics
(none needed for the reference surface).
"""

__version__ = "0.1.0"
