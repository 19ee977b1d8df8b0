"""Sources & sinks (Tier C1 / A1).

- ``readers``  format-dispatching batch readers with explicit schemas
- ``jdbc``     the production ``documents`` source: partitioned-parallel
               JDBC reads (the reference's single Postgres cursor,
               /root/reference/driver.go:85-92, distributed)
"""

from reindexer_spark.sources.readers import read_table
from reindexer_spark.sources.jdbc import jdbc_reader_options, read_documents_jdbc

__all__ = ["read_table", "jdbc_reader_options", "read_documents_jdbc"]
