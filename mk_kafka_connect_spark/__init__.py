"""mk_kafka_connect_spark — a PySpark-native analytics/ETL engine with the
query and data-processing capabilities of mykaarma/mk-kafka-connect
(reference, read-only at /root/reference), rebuilt Spark-first.

Layers (SURVEY.md §0):
  A — ingestion/pipeline: paginated-REST custom DataSource, CDC batch
      windows with checkpointed watermark state, record transforms
      (``sources/``, ``streaming/``, ``transforms``).
  B — declared query surface: relational + LLM-pipeline operators on
      DataFrame/Catalyst, DuckDB-oracle-checked (``plans/``, ``operators/``).
"""

from .catalog import TABLES, load_table, load_tables, register_views
from .session import get_spark

__all__ = ["get_spark", "TABLES", "load_table", "load_tables", "register_views"]
__version__ = "0.1.0"
