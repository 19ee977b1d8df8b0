"""Batch readers (Tier C1).

One entry point, format-dispatched; explicit schemas everywhere but
parquet (schema-on-read inference is a full extra pass at 100 TB, and a
correctness hazard — a day's files with all-null columns silently changes
inferred types)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMATS = ("parquet", "csv", "json", "orc", "text")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read ``path`` as ``fmt``.  CSV/JSON require a schema (pass
    ``infer=True`` explicitly to opt into an inference pass)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    infer = options.pop("infer", False)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json") and not infer:
        raise ValueError(
            f"{fmt} needs an explicit schema (or infer=True to opt in — "
            "inference is a full extra data pass)"
        )
    if fmt == "csv":
        options.setdefault("header", "true")
        if infer:
            options.setdefault("inferSchema", "true")
    return reader.options(**options).load(path)
