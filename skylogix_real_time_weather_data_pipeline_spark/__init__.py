"""skylogix_real_time_weather_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of ``rasheey97-alt/skylogix_Real-Time-Weather-Data-Pipeline``
(see SURVEY.md for the operator inventory it implements), built on the
DataFrame / Spark SQL / Catalyst / Structured Streaming stack, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Layout
------
- ``session``    SparkSession factory (UTC, AQE, tuned shuffle partitions)
- ``schemas``    explicit StructTypes for the raw + processed weather model
- ``functions``  scalar column expressions (unit conversion, icons, dates)
- ``operators``  silver (flatten/clean/derive) and gold (aggregate) builders
- ``sources``    batch + streaming readers with explicit schemas
- ``sinks``      parquet/csv/json/jdbc writers
- ``plans``      named query builders used by the driver contract
- ``streaming``  bronze→silver→gold streaming topology, listeners
- ``ext``        dedup / similarity / text-analysis / multimodal operators
"""

__version__ = "0.1.0"
