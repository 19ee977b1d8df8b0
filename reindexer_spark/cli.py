"""Command-line driver — the reference's ``reindex`` binary, Spark-native.

The reference program (/root/reference/driver.go:119-220) is invoked as
``reindex [config.json]``: it loads config, scans Postgres, shapes
records through argot, and submits to Solr.  This CLI is the same UX
over the native pipeline:

    python -m reindexer_spark.cli --config config.json \
        --input /data/documents.parquet \
        [--chunks-dir /out/chunks] [--dry-run-dir /out/captured] \
        [--start-id ID]

- ``--input``        parquet path for the documents relation (omit to read
                     via JDBC using the config's connection fields)
- ``--chunks-dir``   also write the raw NDJSON chunk files (Tier A4/A5)
- ``--dry-run-dir``  capture would-be Solr submissions as JSON batches
                     instead of POSTing (DirectoryCaptureTransport)
- ``--start-id``     resume high-water mark (strict >; overrides config)

Prints one JSON summary line: {"ingested": N, "quarantined": M, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="reindexer-spark",
        description="Run the reindex pipeline (scan -> shape -> sink).",
    )
    p.add_argument("--config", required=True, help="config JSON path")
    p.add_argument("--input", help="documents parquet path (default: JDBC)")
    p.add_argument("--chunks-dir", help="also write NDJSON chunk files here")
    p.add_argument(
        "--dry-run-dir",
        help="capture Solr batches as JSON files here instead of POSTing",
    )
    p.add_argument("--start-id", help="resume after this id (strict >)")
    p.add_argument("--id-col", default="id", help="document key column")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from reindexer_spark import get_spark
    from reindexer_spark.docpipe import ReindexConfig, SolrSink, write_ndjson_chunks
    from reindexer_spark.docpipe.pipeline import run_reindex
    from reindexer_spark.docpipe.solr_sink import DirectoryCaptureTransport

    try:
        conf = ReindexConfig.load(args.config)
    except Exception as exc:  # noqa: BLE001 — config errors are user errors
        print(f"error: {exc}", file=sys.stderr)
        return 2
    if args.start_id is not None:
        conf.start_id = args.start_id

    # Fail on every missing dependency BEFORE the JVM spins up
    # (reference: driver.go:119-150 fatals pre-scan; see docpipe.preflight).
    from reindexer_spark.docpipe.preflight import preflight

    failures = preflight(
        conf,
        input_path=args.input,
        chunks_dir=args.chunks_dir,
        dry_run_dir=args.dry_run_dir,
    )
    if failures:
        for f in failures:
            print(f"error: {f}", file=sys.stderr)
        return 2

    spark = get_spark("reindexer-cli")
    if args.input:
        docs = spark.read.parquet(args.input)
    else:
        from reindexer_spark.sources.jdbc import read_documents_jdbc

        docs = read_documents_jdbc(spark, conf)

    if args.chunks_dir:
        write_ndjson_chunks(docs, args.chunks_dir, conf.chunk_size)

    if args.dry_run_dir:
        os.makedirs(args.dry_run_dir, exist_ok=True)
        capture_dir = args.dry_run_dir
        sink = SolrSink(
            conf.solr_url,
            batch_size=conf.chunk_size,
            transport_factory=lambda: DirectoryCaptureTransport(capture_dir),
        )
    else:
        sink = SolrSink(conf.solr_url, batch_size=conf.chunk_size)

    result = run_reindex(docs, conf, sink=sink, id_col=args.id_col)
    print(
        json.dumps(
            {
                "ingested": result.ingested,
                "quarantined": result.quarantined,
                "start_id": conf.start_id,
                "chunk_size": conf.chunk_size,
                "sink": "capture" if args.dry_run_dir else conf.solr_url,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
