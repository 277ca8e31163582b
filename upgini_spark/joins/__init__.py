from upgini_spark.joins.asof import asof_join  # noqa: F401
from upgini_spark.joins.enrich import enrich  # noqa: F401
