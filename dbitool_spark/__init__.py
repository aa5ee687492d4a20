"""dbitool_spark — a PySpark-native analytics/dataflow engine.

A ground-up re-expression of the capabilities of rorabr/dbitool (a
single-process Perl streaming-ETL dataflow tool; reference at
/root/reference/scripts/dbitool.pl) as an idiomatic PySpark library,
extended with the relational operators the reference planned but never
shipped (its TODO:61-78) and with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design rules (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst owns planning. No hand-built scheduler,
  no stream buffers — the reference's module DAG maps to a lazy
  DataFrame DAG.
- UDFs are the slow path: built-in pyspark.sql.functions wherever
  possible, Arrow-batched pandas UDFs when Python is unavoidable.
- Every operator is designed for a 1000-executor / 100 TB deployment
  even though tests run on local[32]: broadcast small dims, avoid
  needless shuffles, keep filters/projections pushed to the scan.
"""

from dbitool_spark.session import get_session, stop_session

__version__ = "0.1.0"

__all__ = ["get_session", "stop_session", "__version__"]
