"""Custom Python DataSource for WebDataset tar shards (Tier C1).

WebDataset — plain POSIX tar files whose members group into samples by
key prefix (``000017.jpg`` + ``000017.txt`` + ``000017.json`` = one
sample) — is the de-facto shard format for large-scale multimodal
training data: sequential reads, shard-per-worker parallelism, no
per-sample metadata store.  This source makes a directory of ``.tar``
shards readable as one DataFrame, one row per SAMPLE:

    spark.dataSource.register(WebDatasetSource)
    spark.read.format("webdataset").load(shard_dir)
    # → shard, key, members map<ext, binary>, n_members, n_bytes

Shape notes (the 100 TB story):

- one ``InputPartition`` per shard — exactly the parallel unit
  WebDataset is designed around (shards are written ~1 GB so a worker
  streams one end to end);
- the tar is read in STREAMING mode (``r|``): memory per task is
  bounded by one sample's members, never the shard — the property that
  lets 4 GB video shards stream through 2 GB executors;
- samples are emitted on key CHANGE, relying on WebDataset's contract
  that members of a sample are adjacent in the archive (the format's
  defining invariant; a violated contract surfaces as split samples,
  not corruption);
- ``pushFilters`` prunes whole shards on ``shard`` equality at
  planning time (conjunctive semantics, same contract as the WARC and
  NDJSON sources);
- member bytes land in a ``map<string,binary>`` keyed by extension, so
  the media lanes pick their modality (``members['jpg']`` → the decode
  pipeline) without a second pass over the tar.
"""

from __future__ import annotations

import io
import logging
import os
import tarfile
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    InputPartition,
)

from reindexer_spark.sources.offsets import (
    advance_offset,
    initial_offset,
    late_arrivals,
    new_names,
    normalize_offset,
)

logger = logging.getLogger(__name__)

WDS_SCHEMA = (
    "shard string, key string, members map<string, binary>, "
    "n_members int, n_bytes bigint"
)


def sample_key(name: str) -> tuple[str, str]:
    """member filename → (sample key, extension).

    WebDataset convention: the key is everything up to the FIRST dot of
    the basename, the extension everything after it — so
    ``a/b/000017.seg.png`` → key ``a/b/000017``, ext ``seg.png``."""
    dirname, _, base = name.rpartition("/")
    stem, _, ext = base.partition(".")
    key = f"{dirname}/{stem}" if dirname else stem
    return key, ext


def iter_samples(fileobj, where: str = "<stream>") -> Iterator[tuple[str, dict]]:
    """Stream (key, {ext: bytes}) samples off a tar byte stream,
    emitting each sample when the key changes (WebDataset adjacency
    contract).  Non-file members (directories, links) are skipped."""
    try:
        tf = tarfile.open(fileobj=fileobj, mode="r|*")
    except tarfile.TarError as exc:
        raise ValueError(f"{where}: not a readable tar stream: {exc}") from exc
    current_key: str | None = None
    members: dict[str, bytes] = {}
    try:
        for info in tf:
            if not info.isfile():
                continue
            key, ext = sample_key(info.name)
            if current_key is not None and key != current_key:
                yield current_key, members
                members = {}
            current_key = key
            f = tf.extractfile(info)
            members[ext] = f.read() if f is not None else b""
    except tarfile.TarError as exc:
        raise ValueError(f"{where}: corrupt tar member: {exc}") from exc
    if current_key is not None:
        yield current_key, members


def read_shard(path: str) -> Iterator[tuple]:
    """One tar shard → WDS_SCHEMA rows (shared by the batch reader's
    task body and the streaming reader's partition body)."""
    name = os.path.basename(path)
    with open(path, "rb") as fh:
        for key, members in iter_samples(fh, where=name):
            yield (
                name,
                key,
                members,
                len(members),
                sum(len(v) for v in members.values()),
            )


def shard_name(i: int, compress: bool = False) -> str:
    return f"shard-{i:05d}.tar" + (".gz" if compress else "")


def write_webdataset_shards(
    samples, out_dir: str, compress: bool = False
) -> None:
    """The SINK half of this source: write ``(shard int, key string,
    members map<string, binary>)`` rows as WebDataset tar shards — the
    last mile of a training pipeline, curated corpus → the shard files
    a dataloader consumes.  Produces exactly the layout the reader
    expects: one POSIX tar per shard, sample members ADJACENT (the
    format's defining invariant) and sorted by (key, ext), all tar
    metadata (mtime/uid/gid/uname) zeroed so the same corpus yields
    byte-identical shards — combined with the write-then-atomic-rename,
    a retried task re-produces the same file instead of a torn one.

    Scale shape: one shard = one applyInPandas group = one sequential
    tar write, the mirror of the reader's shard-per-task parallelism;
    shard sizing is the caller's shard-assignment column (hash or
    round-robin of a size estimate at 100 TB)."""

    def write_one(key_tuple, pdf):
        import contextlib
        import gzip
        import io
        import tarfile
        import tempfile

        import pandas as pd

        (shard_idx,) = key_tuple
        # Tiebreak duplicate keys by their serialized members so shard
        # bytes don't depend on incoming pandas group order across
        # retries — the byte-identical-shard claim must hold even for
        # duplicate-key inputs.
        rows = sorted(
            ((r.key, r.members) for r in pdf.itertuples(index=False)),
            key=lambda kv: (
                kv[0],
                sorted((e, bytes(d)) for e, d in dict(kv[1]).items()),
            ),
        )
        path = os.path.join(out_dir, shard_name(int(shard_idx), compress))
        # Unique temp file PER ATTEMPT: with speculative execution two
        # attempts of the same shard group can run concurrently; a
        # shared `path + ".tmp"` lets one attempt truncate the inode
        # the other is about to os.replace, exposing a torn shard.
        fd, tmp = tempfile.mkstemp(
            dir=out_dir, prefix=os.path.basename(path) + ".", suffix=".tmp"
        )
        os.close(fd)
        # mkstemp creates 0600 and os.replace keeps the mode; restore
        # the umask-equivalent permissions a plain open() would have
        # given the published shard (dataloaders under other accounts
        # read these files)
        umask = os.umask(0)
        os.umask(umask)
        os.chmod(tmp, 0o666 & ~umask)
        try:
            _write_tar(tmp, rows, compress, contextlib, gzip, io, tarfile)
        except BaseException:
            with contextlib.suppress(OSError):
                os.unlink(tmp)
            raise
        os.replace(tmp, path)
        return pd.DataFrame(
            {"shard": [int(shard_idx)], "n_samples": [len(rows)]}
        )

    def _write_tar(tmp, rows, compress, contextlib, gzip, io, tarfile):
        with contextlib.ExitStack() as stack:
            if compress:
                # tarfile's own "w:gz" stamps the CURRENT TIME into the
                # gzip header; wrap a GzipFile with mtime=0 explicitly
                # so compressed shards stay byte-identical across
                # retries, same as the plain-tar path
                raw = stack.enter_context(open(tmp, "wb"))
                # filename="" keeps the gzip FNAME field empty — the
                # default would embed the .tmp path, making the bytes
                # depend on the output directory
                gz = stack.enter_context(
                    gzip.GzipFile(
                        filename="", fileobj=raw, mode="wb", mtime=0
                    )
                )
                tf = stack.enter_context(tarfile.open(fileobj=gz, mode="w"))
            else:
                tf = stack.enter_context(tarfile.open(tmp, "w"))
            for key, members in rows:
                for ext, data in sorted(dict(members).items()):
                    data = bytes(data)
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tf.addfile(info, io.BytesIO(data))

    os.makedirs(out_dir, exist_ok=True)
    samples.groupBy("shard").applyInPandas(
        write_one, "shard int, n_samples bigint"
    ).count()  # force the write


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WebDatasetReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("webdataset source requires a path")
        self.keep_shards: set[str] | None = None

    def pushFilters(self, filters):  # noqa: N802 - API contract
        """Conjunctive planning-time shard pruning on shard equality
        (same contract as the WARC and NDJSON sources)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("shard",):
                if self.keep_shards is None:
                    self.keep_shards = {f.value}
                else:
                    self.keep_shards &= {f.value}
            else:
                yield f

    def _files(self) -> list[str]:
        names = sorted(
            n
            for n in os.listdir(self.path)
            if n.endswith((".tar", ".tar.gz", ".tgz"))
            and os.path.isfile(os.path.join(self.path, n))
        )
        if self.keep_shards is not None:
            names = [n for n in names if n in self.keep_shards]
        return names

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _ShardPartition(os.path.join(self.path, n)) for n in self._files()
        ]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        return read_shard(partition.path)


class WebDatasetStreamReader(DataSourceStreamReader):
    """Training-shard ingestion as a STREAM (same contract as the warc
    streaming reader): the offset is the COMPACTED set of tar shards
    already ingested (``sources/offsets.py`` — boundary + explicit
    recent names, O(cap) per checkpoint entry), each micro-batch
    processes the shards that landed since, and each new shard is one
    input partition — file-granular exactly-once, the shape of a data
    loader tailing a shard bucket while an upstream job keeps writing.
    Same visibility contract as the warc stream reader: shards must
    land via atomic rename — a listed shard is assumed complete."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("webdataset source requires a path")
        self._last: dict | None = None
        self._prev_listing: list[str] | None = None
        self.late_dropped: list[str] = []  # observability, not state

    def _files_now(self) -> list[str]:
        return sorted(
            n
            for n in os.listdir(self.path)
            if n.endswith((".tar", ".tar.gz", ".tgz"))
            and os.path.isfile(os.path.join(self.path, n))
        )

    def initialOffset(self) -> dict:  # noqa: N802 - API contract
        return initial_offset()

    def latestOffset(self) -> dict:  # noqa: N802 - API contract
        prev = self._last or initial_offset()
        listed = self._files_now()
        late = late_arrivals(self._prev_listing, listed, prev["b"])
        if late:
            # counted-not-silently-lost (see warc.py — same contract)
            self.late_dropped.extend(late)
            logger.warning(
                "webdataset stream %s: %d shard(s) landed below the "
                "compacted offset boundary %r and will NOT be ingested: %s",
                self.path, len(late), prev["b"], late,
            )
        self._prev_listing = listed
        off = advance_offset(prev, listed)
        self._last = off
        return off

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        start = normalize_offset(start, "shards")
        end = normalize_offset(end, "shards")
        if self._last is None:
            # driver restart: seed from the checkpointed offset instead
            # of re-listing everything on the next latestOffset()
            self._last = end
        new = new_names(start, end)
        return [_ShardPartition(os.path.join(self.path, n)) for n in new]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        return read_shard(partition.path)

    def commit(self, end: dict) -> None:
        # offsets live in the checkpoint; source-side we only seed the
        # in-memory cursor after a restart (see partitions())
        if self._last is None:
            self._last = normalize_offset(end, "shards")


class WebDatasetSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> str:
        return WDS_SCHEMA

    def reader(self, schema) -> WebDatasetReader:
        return WebDatasetReader(self.options)

    def streamReader(self, schema) -> WebDatasetStreamReader:  # noqa: N802
        return WebDatasetStreamReader(self.options)


def write_webdataset_shard(path: str, samples: list[tuple[str, dict]]) -> None:
    """Test/fixture helper: write (key, {ext: bytes}) samples as a
    WebDataset-shaped tar (members of one sample adjacent, keys in
    the given order)."""
    compress = "gz" if path.endswith((".tar.gz", ".tgz")) else ""
    with tarfile.open(path, f"w:{compress}") as tf:
        for key, members in samples:
            for ext, data in members.items():
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
