"""upgini_spark — a PySpark-native feature-search & enrichment engine.

Brand-new implementation (NOT a port) of the query / data-processing
capabilities of the upgini reference client (`/root/reference`):
point-in-time (as-of) enrichment joins, windowed temporal feature
engineering (lag / roll / delta / volatility / sessionization), search-key
normalization, dedup, record-id assignment, sampling and stability (PSI)
machinery — expressed Spark-first (DataFrame / Window / Catalyst), with
Arrow-backed pandas UDF kernels only where built-in operators cannot
express the semantics (merge_asof, EWMA).

Payload contract (BASELINE.json input_hint): token arrays
(``array<int32>``) ride through every operator as projection-only payload
and must stay byte-identical.
"""

__version__ = "0.1.0"

from upgini_spark.session import get_spark  # noqa: F401
