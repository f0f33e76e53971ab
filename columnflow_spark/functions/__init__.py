from columnflow_spark.functions import arrays, hashing, math  # noqa: F401
