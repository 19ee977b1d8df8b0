"""Dependency preflight — the reference's fail-fast gate, Spark-native.

The reference driver refuses to start work until every external
dependency answers (/root/reference/driver.go:119-150): config validates,
the lockfile is acquired, Redis pings when authorities are enabled, and
only then does it open the database.  The Spark analogue checks every
path/endpoint the job will need BEFORE a SparkSession (and its ~10 s of
JVM spin-up) is built, so a 1000-executor submission never launches
against a missing input or an unwritable sink directory.

The lockfile itself is not ported (SURVEY §0.1: cluster schedulers own
mutual exclusion); everything else maps 1:1:

- driver.go:121-123 config validation  → ReindexConfig.validate (load time)
- driver.go:133-145 Redis ping         → authority source check (snapshot
  path readable, or redis:// URL well-formed + pinged when the client
  library exists; this container has none, so URL-shape is the gate)
- driver.go:150-153 database open      → input parquet path readable, or
  JDBC connection fields present
- ingest.go:29-33  Solr endpoint       → solr_url scheme check (the POST
  itself is at-least-once retried at run time; unreachable-host errors
  surface there)
"""

from __future__ import annotations

import os

from reindexer_spark.docpipe.config import ReindexConfig


class PreflightError(RuntimeError):
    """One or more dependencies failed the preflight; ``.failures`` lists
    every failure (the reference log.Fatals on the first — reporting all
    of them at once saves a failed cluster submission per missing dep)."""

    def __init__(self, failures: list[str]):
        super().__init__("; ".join(failures))
        self.failures = failures


def _writable_dir(path: str) -> bool:
    """True if ``path`` is (or can be created as) a writable directory —
    walk up to the nearest existing ancestor and test access on it."""
    probe = os.path.abspath(path)
    while probe and not os.path.exists(probe):
        parent = os.path.dirname(probe)
        if parent == probe:
            break
        probe = parent
    return os.path.isdir(probe) and os.access(probe, os.W_OK)


def preflight(
    conf: ReindexConfig,
    *,
    input_path: str | None = None,
    chunks_dir: str | None = None,
    dry_run_dir: str | None = None,
) -> list[str]:
    """Check every dependency the run will touch; return the failures
    (empty list = clear to launch).  Pure filesystem/URL checks — no
    SparkSession, no network except the optional Redis ping."""
    failures: list[str] = []

    # Input relation (driver.go:150-153).
    if input_path is not None:
        if not os.path.exists(input_path):
            failures.append(f"input path does not exist: {input_path}")
    else:
        for f in ("dbhost", "dbname", "dbuser"):
            if not getattr(conf, f):
                failures.append(f"JDBC input needs config field {f!r}")

    # Authority store (driver.go:133-145).
    if conf.authorities:
        src = conf.redis_url
        if src.startswith(("redis://", "rediss://")):
            try:
                import redis  # type: ignore[import-not-found]

                client = redis.Redis.from_url(src, socket_timeout=2)
                client.ping()
            except ImportError:
                pass  # no client library in this environment — URL shape OK
            except Exception as exc:  # noqa: BLE001 — report, don't raise
                failures.append(f"redis ping failed for {src}: {exc}")
        elif not os.path.exists(src):
            failures.append(
                f"authority snapshot does not exist: {src} "
                "(expected a parquet/json/csv export or a redis:// URL)"
            )

    # Sink endpoint (ingest.go:29-33) — shape only; dry-run captures
    # locally and needs no endpoint.
    if dry_run_dir is None and not conf.solr_url.startswith(
        ("http://", "https://")
    ):
        failures.append(f"solrUrl is not an http(s) endpoint: {conf.solr_url}")

    # Output directories.
    for label, d in (("chunks-dir", chunks_dir), ("dry-run-dir", dry_run_dir)):
        if d is not None and not _writable_dir(d):
            failures.append(f"{label} is not writable: {d}")

    return failures


def check_or_raise(conf: ReindexConfig, **kw: str | None) -> None:
    """``preflight`` but raising ``PreflightError`` — the embedded-use
    entry point (``run_reindex`` callers who want the reference's
    fail-fast semantics without exit codes)."""
    failures = preflight(conf, **kw)
    if failures:
        raise PreflightError(failures)
