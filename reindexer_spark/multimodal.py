"""Multimodal media pipeline (Tier C12) — opaque binary payloads with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing is fully real: schemas, partition-size control,
Arrow batch iteration, metadata extraction.  The codec layer (image
decode / resize, audio decode, video frame sampling) is stubbed — the
decode libraries (Pillow/ffmpeg/torchaudio) are not in this container —
behind ``Codec`` implementations: ``FakeCodec`` is deterministic (tests
and the batch-shape contract run against it), ``LibraryCodec`` raises
``NotImplementedError`` with the exact dependency needed.

At 100 TB the shape is the important part:

- media rows are *heavy and few* per partition → repartition by byte
  budget, not row count (``target_partition_bytes``);
- decode is CPU-bound Python → Arrow batches amortize serde, and
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` caps peak memory;
- outputs are fixed-size feature vectors / thumbnails, orders of
  magnitude smaller than inputs → emit them, never the raw bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, meta map<string,string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, checksum string, "
    "width int, height int, n_channels int, features array<float>"
)


class FakeCodec:
    """Deterministic stand-in decoder: derives pseudo-dimensions and a
    tiny feature vector from the payload bytes.  Real enough to exercise
    every seam (schema, batching, null payloads) with byte-stable
    outputs."""

    def decode(self, payload: bytes) -> dict:
        import hashlib

        digest = hashlib.sha256(payload).digest()
        return {
            "width": 16 + digest[0] % 64,
            "height": 16 + digest[1] % 64,
            "n_channels": 1 + digest[2] % 3,
            "features": [b / 255.0 for b in digest[:8]],
        }


class LibraryCodec:
    """The production decoder seam.  Not implemented in this container."""

    def decode(self, payload: bytes) -> dict:
        raise NotImplementedError(
            "media decode requires Pillow (images) / soundfile (audio) / "
            "pyav (video), none of which are installed here; inject "
            "FakeCodec for pipeline testing"
        )


def extract_media_features(
    media: DataFrame, codec=None, batch_size: int = 256
) -> DataFrame:
    """binary payload → (dims, checksum, feature vector) via mapInPandas.

    One Arrow batch in, one out; payload bytes never leave the executor.
    """
    codec = codec or FakeCodec()
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def decode_batches(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                if payload is None:
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "kind": row["kind"],
                            "n_bytes": 0,
                            "checksum": None,
                            "width": None,
                            "height": None,
                            "n_channels": None,
                            "features": None,
                        }
                    )
                    continue
                decoded = codec.decode(bytes(payload))
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": len(payload),
                        "checksum": hashlib.md5(bytes(payload)).hexdigest(),
                        **decoded,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def repartition_by_bytes(
    media: DataFrame,
    size_col: str = "payload",
    target_partition_bytes: int = 128 << 20,
) -> DataFrame:
    """Partition heavy binary rows by byte budget instead of row count —
    row-count partitioning puts 200 × 50 MB videos in one task and
    200 × 2 KB icons in another."""
    sized = media.withColumn("__bytes", F.octet_length(F.col(size_col)))
    total = sized.agg(F.sum("__bytes")).collect()[0][0] or 0
    n = max(1, int(total / target_partition_bytes) + 1)
    return sized.repartition(n).drop("__bytes")
