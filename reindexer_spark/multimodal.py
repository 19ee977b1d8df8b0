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


THUMB_SCHEMA = (
    "media_id bigint, kind string, thumb_w int, thumb_h int, thumbnail binary"
)

FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, frame_ts_ms bigint, frame binary"
)


class FakeResizer:
    """Deterministic stand-in for image resize: emits a byte-stable
    pseudo-thumbnail (payload digest tiled to thumb_w*thumb_h bytes) with
    aspect-ratio-preserving dimensions from FakeCodec's pseudo-dims."""

    def resize(self, payload: bytes, max_dim: int) -> dict:
        import hashlib

        d = FakeCodec().decode(payload)
        w, h = d["width"], d["height"]
        scale = min(1.0, max_dim / max(w, h))
        tw, th = max(1, int(w * scale)), max(1, int(h * scale))
        digest = hashlib.sha256(payload).digest()
        body = (digest * ((tw * th) // len(digest) + 1))[: tw * th]
        return {"thumb_w": tw, "thumb_h": th, "thumbnail": body}


class FakeFrameSampler:
    """Deterministic stand-in for video frame sampling: duration is
    derived from the payload, frames are digest-stamped slices."""

    def duration_ms(self, payload: bytes) -> int:
        import hashlib

        digest = hashlib.sha256(payload).digest()
        return 1000 * (1 + int.from_bytes(digest[:2], "big") % 30)

    def frame_at(self, payload: bytes, ts_ms: int) -> bytes:
        import hashlib

        return hashlib.sha256(payload + ts_ms.to_bytes(8, "big")).digest()


class LibraryResizer:
    def resize(self, payload: bytes, max_dim: int) -> dict:
        raise NotImplementedError(
            "image resize requires Pillow; inject FakeResizer for "
            "pipeline testing"
        )


class LibraryFrameSampler:
    def duration_ms(self, payload: bytes) -> int:
        raise NotImplementedError("video sampling requires pyav/ffmpeg")

    def frame_at(self, payload: bytes, ts_ms: int) -> bytes:
        raise NotImplementedError("video sampling requires pyav/ffmpeg")


def resize_thumbnails(
    media: DataFrame, max_dim: int = 32, resizer=None, batch_size: int = 256
) -> DataFrame:
    """binary payload → thumbnail binary via mapInPandas (the image-
    resize leg of the media pipeline).  Output rows are bounded by
    max_dim², so the stage SHRINKS data — safe to run before a shuffle;
    null payloads pass through as null thumbnails (quarantine-friendly,
    the A9 error-channel analogue)."""
    resizer = resizer or FakeResizer()
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def run(batches: Iterator) -> Iterator:
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
                            "thumb_w": None,
                            "thumb_h": None,
                            "thumbnail": None,
                        }
                    )
                    continue
                r = resizer.resize(bytes(payload), max_dim)
                out.append(
                    {"media_id": row["media_id"], "kind": row["kind"], **r}
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=THUMB_SCHEMA)


def sample_video_frames(
    media: DataFrame,
    every_ms: int = 5000,
    max_frames: int = 8,
    sampler=None,
    batch_size: int = 64,
) -> DataFrame:
    """binary video payload → one row per sampled frame (mapInPandas is
    the right seam precisely because the fan-out is data-dependent:
    frames-per-row varies with duration, which no fixed-arity UDF can
    express).  Frame count is capped so the output stays bounded per
    input row; rows sort deterministically by (media_id, frame_idx)."""
    sampler = sampler or FakeFrameSampler()
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                if payload is None:
                    continue  # nothing to sample; quarantined upstream
                payload = bytes(payload)
                duration = sampler.duration_ms(payload)
                for idx, ts in enumerate(range(0, duration, every_ms)):
                    if idx >= max_frames:
                        break
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": idx,
                            "frame_ts_ms": ts,
                            "frame": sampler.frame_at(payload, ts),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "frame_ts_ms", "frame"],
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
