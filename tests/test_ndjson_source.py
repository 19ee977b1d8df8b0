"""Python DataSource API: the ndjson_chunks custom source round-trips
the docpipe chunk writer's output with per-file parallelism and
planning-time file pruning."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from reindexer_spark.docpipe.chunker import write_ndjson_chunks
from reindexer_spark.sources.ndjson_chunks import NdjsonChunkDataSource


def _write_chunks(spark, tmp_path, n=95, chunk=20) -> str:
    df = spark.range(n).select(
        F.to_json(
            F.struct(
                F.col("id"), F.concat(F.lit("doc "), F.col("id")).alias("t")
            )
        ).alias("content")
    )
    out = str(tmp_path / "chunks")
    write_ndjson_chunks(df, out, chunk_size=chunk, exact=True)
    return out

def test_roundtrip_all_records(spark, tmp_path):
    out = _write_chunks(spark, tmp_path)
    spark.dataSource.register(NdjsonChunkDataSource)
    got = spark.read.format("ndjson_chunks").load(out)
    assert got.count() == 95
    # records parse back to the same ids
    ids = sorted(
        r.id
        for r in got.select(
            F.from_json("value", "id bigint, t string").alias("j")
        ).select(F.col("j.id").alias("id")).collect()
    )
    assert ids == list(range(95))
    # one scan partition PER FILE (the per-chunk-worker analogue), and
    # no file exceeds the chunk size
    n_files = got.select("chunk_file").distinct().count()
    assert got.rdd.getNumPartitions() == n_files
    per_file = got.groupBy("chunk_file").count().collect()
    assert all(r["count"] <= 20 for r in per_file)


def test_pushdown_prunes_files_at_planning(spark, tmp_path):
    out = _write_chunks(spark, tmp_path)
    spark.dataSource.register(NdjsonChunkDataSource)
    full = spark.read.format("ndjson_chunks").load(out)
    one_file = full.select("chunk_file").distinct().limit(1).collect()[0][0]
    pruned = spark.read.format("ndjson_chunks").load(out).filter(
        F.col("chunk_file") == one_file
    )
    # equality filter on chunk_file reaches pushFilters → whole-file
    # pruning BEFORE task launch: one scan partition, not five
    assert pruned.rdd.getNumPartitions() == 1
    rows = pruned.collect()
    assert rows and all(r.chunk_file == one_file for r in rows)
    # value filters are NOT claimed by the source — Spark must still
    # apply them post-scan for a correct (smaller) answer
    n_files = full.select("chunk_file").distinct().count()
    v = full.filter(F.col("line_no") == 0)
    assert v.count() == n_files  # exactly one first line per file


def test_line_numbers_and_json_integrity(spark, tmp_path):
    out = _write_chunks(spark, tmp_path, n=7, chunk=3)
    spark.dataSource.register(NdjsonChunkDataSource)
    got = spark.read.format("ndjson_chunks").load(out).collect()
    assert len(got) == 7
    for r in got:
        assert r.line_no >= 0
        json.loads(r.value)  # every emitted line is intact JSON
