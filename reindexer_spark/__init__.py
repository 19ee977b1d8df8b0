"""reindexer_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of trln/reindexer, rebuilt Spark-first.

The reference (/root/reference) is a Go batch ETL driver that delegates its
relational surface to PostgreSQL and its document-shaping surface to the
external ``argot`` tool (see SURVEY.md §0).  This package implements both
halves natively on the Spark DataFrame/SQL stack, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB-scale execution.

Layout
------
- ``session``    SparkSession factory with scale-tuned defaults (AQE, UTC, Arrow)
- ``catalog``    parquet/JDBC table loading + temp-view registration
- ``registry``   the query registry: every operator registers a (Spark fn,
                 DuckDB oracle SQL) pair consumed by ``__spark_entry__.py``
- ``operators``  the operator inventory from SURVEY.md §2 (Tier B + Tier C)
- ``docpipe``    the argot-equivalent document pipeline (flatten, suffix,
                 authority enrichment, chunked sink, resume) — SURVEY §2 Tier B5-B9
- ``sources``    readers (parquet/csv/json/jdbc) and the Solr-style bulk sink
- ``streaming``  Structured Streaming variants (windows, watermark, dedup)
"""

from reindexer_spark.session import get_spark
from reindexer_spark.registry import all_queries, all_oracles, get_query

__version__ = "0.1.0"

__all__ = ["get_spark", "all_queries", "all_oracles", "get_query", "__version__"]
