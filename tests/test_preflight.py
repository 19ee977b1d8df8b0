"""Dependency preflight (reference driver.go:119-150 fail-fast gate)."""

from __future__ import annotations

import json

import pytest

from reindexer_spark.docpipe.config import ReindexConfig
from reindexer_spark.docpipe.preflight import (
    PreflightError,
    check_or_raise,
    preflight,
)

from tests.test_cli import run_cli


def _conf(**kw) -> ReindexConfig:
    base = dict(password="x", solr_url="http://fake/solr/c")
    base.update(kw)
    return ReindexConfig(**base)


def test_clean_run_has_no_failures(tmp_path):
    inp = tmp_path / "docs.parquet"
    inp.write_bytes(b"PAR1")
    assert preflight(_conf(), input_path=str(inp)) == []


def test_missing_input_path(tmp_path):
    fails = preflight(_conf(), input_path=str(tmp_path / "nope.parquet"))
    assert len(fails) == 1 and "input path" in fails[0]


def test_jdbc_fields_checked_when_no_input():
    fails = preflight(_conf(dbhost=""))
    assert any("dbhost" in f for f in fails)


def test_authority_snapshot_must_exist(tmp_path):
    conf = _conf(authorities=True, redis_url=str(tmp_path / "no_snapshot.parquet"))
    fails = preflight(conf, input_path=None)
    assert any("authority snapshot" in f for f in fails)


def test_authority_redis_url_shape_accepted_without_client():
    # No redis client in this container: a well-formed URL passes the gate
    # (the reference would ping; the ping branch activates when the lib exists).
    conf = _conf(authorities=True, redis_url="redis://localhost:6379/0")
    assert preflight(conf) == []


def test_solr_scheme_required_unless_dry_run(tmp_path):
    conf = _conf(solr_url="not-a-url")
    assert any("solrUrl" in f for f in preflight(conf))
    assert preflight(conf, dry_run_dir=str(tmp_path)) == []


def test_unwritable_output_dir(tmp_path):
    # A directory nested under an existing FILE can never be created
    # (works even as root, where permission bits don't bind os.access).
    blocker = tmp_path / "file"
    blocker.write_text("x")
    fails = preflight(_conf(), chunks_dir=str(blocker / "sub"))
    assert any("chunks-dir" in f for f in fails)


def test_check_or_raise_collects_all_failures(tmp_path):
    conf = _conf(solr_url="bogus", authorities=True, redis_url="/missing")
    with pytest.raises(PreflightError) as exc:
        check_or_raise(conf, input_path=str(tmp_path / "gone.parquet"))
    assert len(exc.value.failures) == 3


def test_cli_exits_2_before_spark_on_missing_input(tmp_path):
    conf = tmp_path / "config.json"
    conf.write_text(json.dumps({"password": "x", "solrUrl": "http://f/s"}))
    r = run_cli(
        "--config", str(conf),
        "--input", str(tmp_path / "missing.parquet"),
        timeout=60,
    )
    assert r.returncode == 2
    assert "input path does not exist" in r.stderr
    # Fast-fail means no SparkSession: no JVM banner in stderr.
    assert "SparkContext" not in r.stderr
