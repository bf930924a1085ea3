"""basic_data_fusion_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference app ``SympatiCog/basic-data-fusion`` (a Dash+DuckDB lab-data
fusion tool), re-expressed Spark-first: lazy DataFrame plans, Catalyst
optimization, broadcast-aware hub/spoke joins, distributed aggregation,
and an extended large-scale pipeline surface (dedup, similarity search,
text analysis, windowed event aggregation).

Layout
------
- ``session``    : SparkSession factory tuned for the workload
- ``catalog``    : table registry + metadata scans (schemas, ranges, distincts)
- ``plans``      : QuerySpec (TOML round-trip) + DataFrame PlanBuilder
- ``operators``  : aggregations, reshape (enwiden), stats, dedup, similarity, text
- ``functions``  : scalar column helpers (composite id, site match, coercion)
- ``sources``    : CSV ingest/validation, export sinks
- ``streaming``  : windowed event aggregation (batch + Structured Streaming)
"""

__version__ = "0.1.0"

# Driver-side plan-build fast path: cache py4j's per-call JVM reflection
# lookups (see py4j_fastpath docstring; measured ~10x on F.col, ~14x on
# the fixed-point rounding tree). Installed at import so every consumer
# (bench, entry points, tests) builds plans through the cached handles.
from . import py4j_fastpath as _py4j_fastpath

_py4j_fastpath.install()
