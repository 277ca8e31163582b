from upgini_spark.operators import binary, date, groupby, timeseries, unary, vector  # noqa: F401
