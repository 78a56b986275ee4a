"""flink_estimator_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jbcodeforce/flink-estimator.

Two capability planes (see SURVEY.md):

- Plane A: the Flink capacity-estimation calculus, re-expressed as a vectorized
  Spark DataFrame computation (``flink_estimator_spark.estimator``).
- Plane B: the streaming/relational operator surface the reference models
  (scan/filter/project, joins, aggregations, time windows, dedup, analytic
  windows, CEP, UDFs) implemented as real Spark SQL / Structured Streaming
  operators (``plans``, ``operators``, ``streaming``), plus the LLM-data-pipeline
  extensions (dedup, similarity search, text analysis, multimodal columns).
"""

__version__ = "0.1.0"
