"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of ``ivpk/opendata.gov.lt-mysql-import``.

The reference (``/root/reference/odgovlt.py``) is a row-at-a-time CKAN
harvester; this package re-expresses its operator inventory (SURVEY.md §2)
as idiomatic Spark DataFrame plans, plus a beyond-reference surface for
large-scale training-data pipelines (dedup, similarity search, text
analysis, multimodal columns).

Layout
------
- ``session``    SparkSession factory tuned for local testing / cluster scale
- ``functions``  scalar function library (reference F1-F9 semantics)
- ``sources``    parquet fixtures, JDBC wrappers, JSON staging (S1-S11)
- ``operators``  relational parity ops (P/J/A/W) + training-data ops
- ``plans``      pipeline assembly (gather/import DAG) and diff-sync
- ``streaming``  Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
