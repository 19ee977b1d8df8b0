"""The reference's operational loop, end-to-end: full reindex → new
documents arrive → high-water-mark probe → incremental run ingests only
the tail → idempotent re-run changes nothing (README.md:80-87 semantics),
plus chunk bookkeeping and the MERGE-less upsert."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from reindexer_spark.docpipe import ReindexConfig, SolrSink, highwater
from reindexer_spark.docpipe.chunker import chunk_ids
from reindexer_spark.docpipe.pipeline import run_reindex
from reindexer_spark.docpipe.solr_sink import DirectoryCaptureTransport
from reindexer_spark.docpipe.upsert import apply_upsert


def _docs(spark, start: int, stop: int):
    rows = [
        (f"id{i:05d}", "t", "o", json.dumps({"id": f"D{i}", "v": i}), False)
        for i in range(start, stop)
    ]
    return spark.createDataFrame(
        rows, "id string, txn_id string, owner string, content string, deleted boolean"
    )


def _sent_ids(cap: str) -> list[str]:
    return sorted(
        d["id"]
        for f in glob.glob(os.path.join(cap, "*.json"))
        for d in json.load(open(f))
    )


def test_incremental_resume_cycle(spark, tmp_path):
    conf = ReindexConfig(password="x", solr_url="http://fake")

    # run 1: full corpus
    cap1 = tmp_path / "run1"; cap1.mkdir()
    sink1 = SolrSink("u", transport_factory=lambda: DirectoryCaptureTransport(str(cap1)))
    first = _docs(spark, 0, 40)
    r1 = run_reindex(first, conf, sink=sink1)
    assert r1.ingested == 40

    # probe the high-water mark from what the sink actually received
    # (the B9 Solr max-id probe, against the capture)
    hw = max(_sent_ids(str(cap1)))
    assert hw == "id00039"

    # run 2: 15 new documents appended; resume strictly after hw
    conf2 = ReindexConfig(password="x", solr_url="http://fake", start_id=hw)
    cap2 = tmp_path / "run2"; cap2.mkdir()
    sink2 = SolrSink("u", transport_factory=lambda: DirectoryCaptureTransport(str(cap2)))
    grown = _docs(spark, 0, 55)
    r2 = run_reindex(grown, conf2, sink=sink2)
    assert r2.ingested == 15
    assert _sent_ids(str(cap2)) == [f"id{i:05d}" for i in range(40, 55)]

    # run 3: idempotent re-run with unchanged corpus → nothing to do
    cap3 = tmp_path / "run3"; cap3.mkdir()
    conf3 = ReindexConfig(
        password="x", solr_url="http://fake", start_id=max(_sent_ids(str(cap2)))
    )
    sink3 = SolrSink("u", transport_factory=lambda: DirectoryCaptureTransport(str(cap3)))
    r3 = run_reindex(grown, conf3, sink=sink3)
    assert r3.ingested == 0
    assert _sent_ids(str(cap3)) == []


def test_chunk_ids_two_phase_rank(spark):
    df = spark.createDataFrame(
        [(f"k{i:04d}",) for i in range(1000)], "id string"
    ).repartition(7)  # scrambled input partitioning
    out = chunk_ids(df, "id", chunk_size=300)
    got = {r.id: r.chunk_id for r in out.collect()}
    # rank order must follow the key order regardless of input layout
    for i in range(1000):
        assert got[f"k{i:04d}"] == i // 300
    sizes = out.groupBy("chunk_id").count().collect()
    assert sorted((r.chunk_id, r["count"]) for r in sizes) == [
        (0, 300), (1, 300), (2, 300), (3, 100),
    ]


def test_apply_upsert(spark):
    snapshot = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, False),   # update
            (4, "d", 40.0, False),    # insert
            (3, None, 0.0, True),     # delete tombstone
        ],
        "id long, name string, v double, deleted boolean",
    )
    merged = apply_upsert(snapshot, changes, "id", deleted_col="deleted")
    got = sorted(map(tuple, merged.collect()))
    assert got == [(1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0)]
    # idempotent: applying the same changes again is a no-op
    again = apply_upsert(merged, changes, "id", deleted_col="deleted")
    assert sorted(map(tuple, again.collect())) == got
