"""Source readers: JDBC (PostgreSQL / MySQL / Oracle) and Parquet.

The JDBC path replaces the reference's SQLAlchemy ``fetchall()``
extraction (``mozart_etl/lib/extract/connectors/base.py:29-93``) with
partitioned, executor-side reads — the whole table never passes
through the driver. The parquet source is the file-based stand-in used
for tests and local pipelines.
"""

from .reader import extract_table, jdbc_reader, jdbc_url, test_connection

__all__ = ["extract_table", "jdbc_reader", "jdbc_url", "test_connection"]
