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


def _register_pickle_by_value() -> None:
    """Ship this package's executor-side code BY VALUE inside the pickled
    closures (cloudpickle.register_pickle_by_value) instead of by module
    reference. Without this, every mapInPandas stage would require
    oaim_sandbox_spark to be importable on each Python worker — true only
    when the driver's cwd/PYTHONPATH happens to include the repo. With it,
    the engine works from any driver process with zero cluster-side install
    (the same mechanism pyspark recommends for local-dev libraries)."""
    try:
        from pyspark import cloudpickle  # bundled cloudpickle >= 2.0
    except ImportError:  # pragma: no cover
        return
    if not hasattr(cloudpickle, "register_pickle_by_value"):  # pragma: no cover
        return
    import importlib

    for mod in (
        "oaim_sandbox_spark.functions.portable",
        "oaim_sandbox_spark.operators.split",
        "oaim_sandbox_spark.operators.embed",
        "oaim_sandbox_spark.operators.testbed",
        "oaim_sandbox_spark.sources.loaders",
        "oaim_sandbox_spark.sources.multimodal",
    ):
        try:
            cloudpickle.register_pickle_by_value(importlib.import_module(mod))
        except Exception:  # pragma: no cover - best-effort per module
            pass


_register_pickle_by_value()
