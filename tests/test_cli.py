"""End-to-end CLI tests (subprocess — the same surface a user drives)."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def docs_parquet(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "docs.parquet")
    duckdb.sql(
        """
        COPY (SELECT 'id' || LPAD(CAST(r AS VARCHAR), 4, '0') AS id,
                     'txn' AS txn_id, 'own' AS owner,
                     CASE WHEN r % 11 = 3 THEN 'oops{'
                          ELSE '{"id":"D' || r || '","title":{"main":"T' || r
                               || '"},"tags":["a","b"]}' END AS content,
                     r % 10 = 0 AS deleted
              FROM (SELECT unnest(range(60)) AS r))
        TO '"""
        + path
        + "' (FORMAT PARQUET)"
    )
    return path


def run_cli(*args: str, timeout: int = 240):
    return subprocess.run(
        [sys.executable, "-m", "reindexer_spark.cli", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_cli_dry_run_end_to_end(docs_parquet, tmp_path):
    conf = tmp_path / "config.json"
    conf.write_text(
        json.dumps({"password": "x", "solrUrl": "http://fake/solr/c", "chunkSize": 25})
    )
    cap = tmp_path / "cap"
    chunks = tmp_path / "chunks"
    r = run_cli(
        "--config", str(conf),
        "--input", docs_parquet,
        "--dry-run-dir", str(cap),
        "--chunks-dir", str(chunks),
        "--start-id", "id0004",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    # 60 rows − 6 deleted − 5 before/at id0004 (0,10,20,...deleted overlap) − bad json
    assert summary["ingested"] == 45
    assert summary["quarantined"] == 5
    assert summary["sink"] == "capture"
    sent = [
        d
        for f in glob.glob(str(cap / "*.json"))
        for d in json.load(open(f))
    ]
    assert len(sent) == 45
    assert {"id", "title_main_t", "tags_a"} <= set(sent[0])
    assert len(glob.glob(str(chunks / "part-*"))) >= 1


def test_cli_rejects_bad_config(docs_parquet, tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"solrUrl": "u"}))
    r = run_cli("--config", str(bad), "--input", docs_parquet, timeout=120)
    assert r.returncode == 2
    assert "password is required" in r.stderr
