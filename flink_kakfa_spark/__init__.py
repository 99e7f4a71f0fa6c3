"""flink_kakfa_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``nadavg54/flink-kakfa`` (a Kafka producer/consumer pair built around a
never-written Flink word-count job; see SURVEY.md) as an idiomatic
PySpark engine: DataFrame/SQL for the relational core, Structured
Streaming for the stream layer, plus the LLM-data-pipeline operator
set (dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.

Nothing here is a translation of the reference's Go code — the logical
plans are declared with the DataFrame API and Catalyst/Tungsten choose
the physical strategy.
"""

__version__ = "0.1.0"

from flink_kakfa_spark.session import get_spark  # noqa: F401
