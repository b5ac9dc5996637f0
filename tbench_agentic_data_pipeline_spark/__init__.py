"""tbench_agentic_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (Danau5tin/tbench-agentic-data-pipeline,
surveyed in /root/repo/SURVEY.md), extended with large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Design principles (see SURVEY.md §4, §7):
- Declarative DataFrame/SQL plans; Catalyst/Tungsten/AQE pick physical strategy.
- No ``collect()`` on data paths; every operator partitionable to 100 TB.
- Built-in ``pyspark.sql.functions`` (JVM, whole-stage codegen) in hot paths;
  Arrow-batched pandas UDFs only where semantics genuinely require Python.
- Small dimension tables broadcast; big joins shuffle on explicit keys.
"""

from tbench_agentic_data_pipeline_spark.session import get_session

__all__ = ["get_session"]

__version__ = "0.1.0"
