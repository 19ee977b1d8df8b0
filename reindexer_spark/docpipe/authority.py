"""Authority enrichment (Tier B7).

The reference's argot invocation takes ``-a --redis-url`` and performs
per-record authority lookups against Redis (/root/reference/ingest/
ingest.go:28-30, README.md:92-95; the driver itself only PINGs —
driver.go:133-145).

The Spark-native shape is a broadcast left join against a snapshot of
the authority store: authority sets are dimension-sized (≪ the document
corpus), so shipping the snapshot to every executor beats 100 TB worth
of point lookups by orders of magnitude, and keeps the operator purely
declarative (Catalyst can reorder/prune around it).  For a store too big
to broadcast, fall back to a shuffled join on the key — never
per-row network calls in the hot path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_authority_snapshot(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
    key_col: str = "key",
) -> DataFrame:
    """Load an authority store snapshot as a (key, payload...) DataFrame.

    ``source`` is either a file/directory path (parquet / json-lines /
    csv, detected by extension unless ``fmt`` is given) — the exported
    snapshot of the reference's Redis store (ingest.go:28-30) — or a
    ``redis://`` URL for a live store.  The live path scans the store
    driver-side (authority sets are dimension-sized by definition; a set
    too big to hold on the driver should be exported to parquet and
    loaded as a snapshot instead) and needs the ``redis`` client
    installed; this container does not have it, so the file-backed
    snapshot is the default operational path.
    """
    if source.startswith(("redis://", "rediss://")):
        try:
            import redis  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover - no redis here
            raise RuntimeError(
                "live authority lookups need the 'redis' client; export "
                "the store to parquet/json and pass that path instead"
            ) from exc
        r = redis.Redis.from_url(source, decode_responses=True)
        return _scan_redis_capped(spark, r, source, key_col)

    ext = fmt or os.path.splitext(source)[1].lstrip(".").lower() or "parquet"
    return _load_snapshot_file(spark, source, ext, key_col)


# The live-scan path materializes on the DRIVER; these caps turn a
# mis-pointed URL (a corpus-sized store instead of a dimension-sized
# authority set) into an immediate, actionable error instead of a
# driver OOM minutes later.  Exceeding either bound means the store
# belongs on the snapshot path.
REDIS_MAX_KEYS = 100_000
REDIS_MAX_BYTES = 64 << 20


def _scan_redis_capped(
    spark: SparkSession, client, source: str, key_col: str
) -> DataFrame:
    rows: list[dict] = []
    approx_bytes = 0
    for key in client.scan_iter():
        val = (
            client.hgetall(key)
            if client.type(key) == "hash"
            else {"value": client.get(key)}
        )
        rows.append({key_col: key, **val})
        approx_bytes += len(str(key)) + sum(
            len(str(k)) + len(str(v)) for k, v in val.items()
        )
        if len(rows) > REDIS_MAX_KEYS or approx_bytes > REDIS_MAX_BYTES:
            raise RuntimeError(
                f"authority store at {source!r} exceeds the live-scan cap "
                f"({REDIS_MAX_KEYS} keys / {REDIS_MAX_BYTES >> 20} MB): "
                "this path collects on the driver and is only for "
                "dimension-sized sets — export the store to parquet/json "
                "and pass that path instead"
            )
    return spark.createDataFrame(rows)


def _load_snapshot_file(
    spark: SparkSession, source: str, ext: str, key_col: str
) -> DataFrame:
    if ext == "parquet":
        df = spark.read.parquet(source)
    elif ext in ("json", "ndjson", "jsonl"):
        df = spark.read.json(source)
    elif ext == "csv":
        df = spark.read.option("header", "true").csv(source)
    else:
        raise ValueError(f"unsupported authority snapshot format: {ext!r}")
    if key_col not in df.columns:
        raise ValueError(
            f"authority snapshot {source!r} has no {key_col!r} column "
            f"(found {df.columns})"
        )
    return df


def enrich_with_authorities(
    docs: DataFrame,
    authorities: DataFrame,
    doc_key: str,
    auth_key: str = "key",
    broadcast: bool = True,
) -> DataFrame:
    """Left-join authority payload columns onto ``docs``.

    ``doc_key`` may be an array column (e.g. subject URIs): the join is
    then per-element with the enrichments re-aggregated, preserving one
    output row per input document.
    """
    doc_type = dict(docs.dtypes)[doc_key]
    auth = F.broadcast(authorities) if broadcast else authorities
    payload_cols = [c for c in authorities.columns if c != auth_key]

    if not doc_type.startswith("array"):
        return docs.join(auth, docs[doc_key] == auth[auth_key], "left").drop(
            auth_key
        )

    # Array key: explode → join → regroup, keyed by a synthetic row id so
    # duplicate documents survive.
    with_id = docs.withColumn("__rid", F.monotonically_increasing_id())
    exploded = with_id.select(
        "__rid", F.explode_outer(doc_key).alias("__k")
    )
    joined = exploded.join(auth, exploded["__k"] == auth[auth_key], "left")
    gathered = joined.groupBy("__rid").agg(
        *[
            F.array_distinct(
                F.flatten(F.collect_list(F.col(c)))
                if dict(authorities.dtypes)[c].startswith("array")
                else F.collect_list(F.col(c))
            ).alias(c)
            for c in payload_cols
        ]
    )
    return with_id.join(gathered, "__rid", "left").drop("__rid")
