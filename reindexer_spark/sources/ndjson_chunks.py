"""Custom Python DataSource for NDJSON chunk directories (Tier C1).

The reference's pipeline materializes NDJSON chunk files and hands each
to a worker (/root/reference/driver.go:192-207, ingest.go:17-38); the
docpipe's ``write_ndjson_chunks`` emits the same layout.  This source
makes that layout a first-class *readable* format:

    spark.dataSource.register(NdjsonChunkDataSource)
    spark.read.format("ndjson_chunks").load(chunk_dir)

Built on the Spark 4 Python DataSource API (``pyspark.sql.datasource``,
SPARK-44076) — the modern extension point for sources Spark has no
built-in reader for, replacing driver-side ``collect``-and-parallelize
hacks:

- one ``InputPartition`` per chunk file → each file is read by exactly
  one task, wherever the scheduler places it (the Spark analogue of the
  reference's one-worker-per-chunk pool);
- ``pushFilters`` handles equality filters on ``chunk_file`` by pruning
  whole files BEFORE tasks launch — planning-time partition pruning,
  observable as a reduced scan partition count;
- rows stream out per line; nothing is buffered per file beyond the
  line iterator, so a 100 TB chunk directory reads with bounded memory
  per task.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)

CHUNK_SCHEMA = "chunk_file string, line_no bigint, value string"


class _ChunkPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class NdjsonChunkReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndjson_chunks requires a path")
        # filled by pushFilters: exact chunk_file names to keep
        self.keep_files: set[str] | None = None

    def pushFilters(self, filters):  # noqa: N802 - API contract
        """Prune whole chunk files at planning time for equality
        filters on chunk_file; everything else stays with Spark.

        Pushed filters are CONJUNCTIVE, so multiple EqualTo filters on
        chunk_file intersect (``f='a' AND f='b'`` → empty set), never
        union — a consumed filter is not re-checked by Spark, so OR
        semantics here would return wrong rows."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("chunk_file",):
                if self.keep_files is None:
                    self.keep_files = {f.value}
                else:
                    self.keep_files &= {f.value}
            else:
                yield f

    def _files(self) -> list[str]:
        names = sorted(
            n
            for n in os.listdir(self.path)
            if not n.startswith((".", "_"))
            and os.path.isfile(os.path.join(self.path, n))
        )
        if self.keep_files is not None:
            names = [n for n in names if n in self.keep_files]
        return names

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _ChunkPartition(os.path.join(self.path, n)) for n in self._files()
        ]

    def read(self, partition: _ChunkPartition) -> Iterator[tuple]:
        name = os.path.basename(partition.path)
        with open(partition.path, encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                # rstrip both so CRLF chunk files (Windows writers,
                # CRLF-normalizing transfers) don't leak a trailing \r
                # into the JSON value
                line = line.rstrip("\r\n")
                if line:
                    yield (name, i, line)


class NdjsonChunkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ndjson_chunks"

    def schema(self) -> str:
        return CHUNK_SCHEMA

    def reader(self, schema) -> NdjsonChunkReader:
        return NdjsonChunkReader(self.options)
