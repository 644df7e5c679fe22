"""flink_1_12_0_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference stream processor (Apache Flink 1.12.0 fork, surveyed in
SURVEY.md), re-expressed Spark-first:

- batch relational operators  -> Spark SQL / DataFrame (Catalyst-optimized)
- streaming operators         -> Structured Streaming (+ stateful pandas ops)
- dialect functions           -> registered Spark SQL functions
- LLM-pipeline extensions     -> dedup / similarity / text-analysis operators

Nothing here is a port of the reference's JVM execution engine: physical
execution (codegen, shuffle, spill, state store) is delegated to Spark.
"""

__version__ = "0.1.0"

from flink_1_12_0_spark.session import get_spark  # noqa: F401
from flink_1_12_0_spark.tables import load_tables  # noqa: F401
