"""PySpark-native analytics engine with the query/data-processing surface of
fthsrbst/us-accidents-bigdata-pipeline, re-expressed Spark-first.

The reference (read-only at /root/reference) is a PySpark+sklearn accident
analytics pipeline; this package provides the same operator surface as a
reusable, idiomatic PySpark library (see SURVEY.md §2 for the inventory),
plus the large-scale training-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
    session         SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
    sources         readers/writers + canonical schemas (SURVEY §2.1)
    operators       relational ops: clean/profile/sample/dedup/similarity/text
    functions       column-level helper functions (SURVEY §2.7)
    plans           driver-facing query catalog (queries + DuckDB oracles)
    ml              features, RandomForest, KMeans, kNN, metrics (SURVEY §2.8-2.9)
    streaming       Structured Streaming extension (SURVEY §2.10)
"""

__version__ = "0.1.0"
