"""PySpark-native analytics engine with the query/data-processing
capabilities of dreams-labs/etl-pipelines.

Spark-first re-expression: the reference's BigQuery SQL + pandas operators
(SURVEY.md §2) become DataFrame transformations planned by Catalyst; the
hand-rolled batch orchestration (SURVEY.md §3.2) becomes shuffle
partitioning; incremental freshness loops become watermark bookkeeping.
"""

__version__ = "0.1.0"
