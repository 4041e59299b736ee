from oaim_sandbox_spark.functions import portable  # noqa: F401
