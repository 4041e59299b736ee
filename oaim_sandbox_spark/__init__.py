"""oaim_sandbox_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of oracle-samples/oaim-sandbox (RAG / vector-search
sandbox), rebuilt Spark-first for 100 TB scale.

Layout:
    session    — SparkSession builder tuned for the workload
    schemas    — explicit StructTypes for every table (SURVEY.md §1.2)
    catalog    — vector-store naming + catalog-by-table-properties (S12/K5)
    functions/ — JVM-side column expressions (hashing, vectors, text)
    operators/ — pipeline operators (split, dedup, merge, retrieval, ann, text)
    sources/   — document loaders (S1-S11)
    streaming/ — Structured Streaming ingest (continuous document pipeline)
"""

__version__ = "0.1.0"
