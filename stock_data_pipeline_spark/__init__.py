"""stock_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the operator semantics of the reference ETL pipeline
(``nathancoliver/stock-data-pipeline``) as idiomatic Spark DataFrame /
SQL plans, and extends them with the LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB training-data pipeline needs.

Design stance (SURVEY.md §7):
- long/tall canonical tables, explicit ``StructType`` schemas, parquet;
- lazy DataFrame DAGs — let Catalyst push filters/prune columns/pick joins;
- pivot only at the presentation edge;
- zero row-at-a-time Python UDFs on the hot path (Pandas UDFs where
  Python is genuinely needed, e.g. multimodal decode stubs).
"""

from stock_data_pipeline_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
