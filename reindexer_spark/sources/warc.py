"""Custom Python DataSource for WARC crawl archives (Tier C1).

WARC (ISO 28500, the public Common-Crawl/Internet-Archive format) is
the container 100 TB of crawl data actually arrives in: concatenated
records, each a ``WARC/1.x`` version line + CRLF headers + a
Content-Length-delimited block, with response records wrapping a full
HTTP message.  The reference ingests NDJSON the driver pre-chunks
(/root/reference/driver.go:192-207); a crawl-scale pipeline needs to
read the archives themselves:

    spark.dataSource.register(WarcDataSource)
    spark.read.format("warc").load(warc_dir)

Built on the Spark 4 Python DataSource API like the NDJSON source:

- one ``InputPartition`` per ``.warc`` / ``.warc.gz`` file — crawl
  archives are written ~1 GB each precisely so file-per-task
  parallelism works; 100 TB is ~100k files → ~100k tasks;
- ``.warc.gz`` reads through stdlib gzip (crawl archives gzip each
  record as its own member; a multi-member stream decompresses
  transparently as one concatenation);
- records stream out one at a time — memory per task is bounded by
  the largest single record, never the file;
- ``pushFilters`` prunes whole files on ``warc_file`` equality at
  planning time (conjunctive semantics, same contract as the NDJSON
  source);
- the HTTP envelope of response records is parsed off the payload
  (status line + headers dropped, body kept), so downstream operators
  see the actual page bytes — ready for the multimodal decode lane or
  the text pipeline;
- malformed records raise ``ValueError`` naming the file and offset:
  a truncated archive fails its own task loudly rather than silently
  yielding half a corpus (quarantining happens at record granularity
  only for the HTTP parse, which degrades to the raw block).
"""

from __future__ import annotations

import gzip
import io
import logging
import os
import zlib
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

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "warc_date string, target_uri string, content_type string, "
    "http_status int, payload binary, n_bytes bigint"
)


def parse_warc_records(
    stream: io.BufferedIOBase, where: str = "<stream>"
) -> Iterator[dict]:
    """Stream (headers, block) records off a WARC byte stream.

    Yields dicts with the header map (case-insensitive keys lowered)
    plus ``block`` bytes.  Tolerates any amount of CRLF/LF padding
    between records (the spec mandates two CRLFs; real archives vary).
    """
    while True:
        # skip inter-record newlines
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"{where}: expected WARC version line, got {line[:40]!r}"
            )
        headers: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if hline in (b"\r\n", b"\n"):
                break
            if not hline:
                raise ValueError(f"{where}: truncated WARC header block")
            try:
                name, _, value = hline.decode("utf-8").partition(":")
            except UnicodeDecodeError as exc:
                raise ValueError(f"{where}: undecodable WARC header") from exc
            headers[name.strip().lower()] = value.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"{where}: missing/invalid Content-Length") from exc
        block = stream.read(length)
        if len(block) != length:
            raise ValueError(f"{where}: truncated WARC record block")
        yield {**headers, "block": block}


def _dechunk(body: bytes) -> bytes:
    """Strip HTTP/1.1 chunked transfer framing (RFC 9112 §7.1):
    hex-size lines alternate with data chunks until a 0-size chunk.
    Raises ValueError on malformed framing (caller degrades to raw)."""
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("truncated chunk-size line")
        size = int(body[pos:nl].split(b";")[0].strip(), 16)
        pos = nl + 2
        if size == 0:
            return bytes(out)
        if pos + size > len(body):
            raise ValueError("truncated chunk data")
        out += body[pos : pos + size]
        # the CRLF terminating each chunk's data is load-bearing: if it
        # is not there the framing is corrupt, and silently skipping two
        # arbitrary bytes would mis-assemble the body instead of taking
        # the documented degrade-to-raw path
        if body[pos + size : pos + size + 2] != b"\r\n":
            raise ValueError("chunk data not terminated by CRLF")
        pos += size + 2


def split_http_payload(block: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP message bytes → (status, page content-type, body);
    non-HTTP blocks pass through unchanged with null status/type
    (record-level degradation, not a task failure).

    Transfer-Encoding: chunked framing is stripped and
    Content-Encoding: gzip/deflate bodies are decompressed — crawl
    archives record the wire bytes verbatim, so without this the
    "body" still carries chunk-size lines or zlib streams and every
    downstream decode quarantines a recoverable page.  A body whose
    declared encoding fails to parse degrades to the raw bytes
    (same record-level contract as the rest of this function)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    head, sep, body = block.partition(b"\r\n\r\n")
    if not sep:
        return None, None, block
    lines = head.split(b"\r\n")
    status_line = lines[0].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        return None, None, block
    ctype = None
    transfer_enc = content_enc = ""
    for hline in lines[1:]:
        name, _, value = hline.partition(b":")
        lname = name.strip().lower()
        if lname == b"content-type" and ctype is None:
            ctype = value.strip().decode("utf-8", "replace")
        elif lname == b"transfer-encoding":
            transfer_enc = value.strip().decode("ascii", "replace").lower()
        elif lname == b"content-encoding":
            content_enc = value.strip().decode("ascii", "replace").lower()
    if "chunked" in transfer_enc:
        try:
            body = _dechunk(body)
        except ValueError:
            return status, ctype, body
    if content_enc in ("gzip", "x-gzip"):
        try:
            body = gzip.decompress(body)
        except (OSError, EOFError, zlib.error):
            pass
    elif content_enc == "deflate":
        try:  # zlib-wrapped per RFC 9110; many servers send raw deflate
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, -15)
            except zlib.error:
                pass
    return status, ctype, body


def read_warc_file(path: str) -> Iterator[tuple]:
    """One WARC file → WARC_SCHEMA rows (shared by the batch reader's
    task body and the streaming reader's partition body)."""
    name = os.path.basename(path)
    opener = gzip.open if name.endswith(".gz") else open
    with opener(path, "rb") as fh:
        for rec in parse_warc_records(fh, where=name):
            if rec.get("warc-type") == "response":
                status, http_ctype, payload = split_http_payload(rec["block"])
            else:
                status, http_ctype, payload = None, None, rec["block"]
            # for responses the useful type is the PAGE's (from the
            # HTTP envelope), not the WARC record's application/http
            ctype = http_ctype or rec.get("content-type", "")
            yield (
                name,
                rec.get("warc-record-id", ""),
                rec.get("warc-type", ""),
                rec.get("warc-date", ""),
                rec.get("warc-target-uri", ""),
                ctype,
                status,
                payload,
                len(payload),
            )


class _WarcPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path")
        self.keep_files: set[str] | None = None

    def pushFilters(self, filters):  # noqa: N802 - API contract
        """Conjunctive planning-time file pruning on warc_file equality
        (same contract as the NDJSON chunk source)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("warc_file",):
                if self.keep_files is None:
                    self.keep_files = {f.value}
                else:
                    self.keep_files &= {f.value}
            else:
                yield f

    def _files(self) -> list[str]:
        names = sorted(
            n
            for n in os.listdir(self.path)
            if n.endswith((".warc", ".warc.gz"))
            and os.path.isfile(os.path.join(self.path, n))
        )
        if self.keep_files is not None:
            names = [n for n in names if n in self.keep_files]
        return names

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _WarcPartition(os.path.join(self.path, n)) for n in self._files()
        ]

    def read(self, partition: _WarcPartition) -> Iterator[tuple]:
        return read_warc_file(partition.path)


class WarcStreamReader(DataSourceStreamReader):
    """Crawl ingestion as a STREAM: each micro-batch processes the WARC
    files that appeared in the source directory since the last offset —
    the shape of a crawler that drops finished shards into a landing
    directory while Spark tails it.  The offset is a COMPACTED
    seen-file set (``sources/offsets.py``: a boundary name plus the
    explicit recent names — O(cap) per checkpoint entry, like Spark's
    file-source seen-file log, instead of the full ever-ingested
    history).  Exactly-once at FILE granularity: a shard is assigned to
    one micro-batch, replays of that batch re-read the same files, and
    each new file becomes one input partition, so the stream
    distributes exactly like the batch source.

    Contract (same as Spark's built-in file source): writers must
    make shards VISIBLE ATOMICALLY (write to a temp name, then
    rename into the landing directory) — a shard listed by
    latestOffset() is assumed complete; a torn in-place write would
    be ingested truncated and fail its task on the WARC parse."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path")
        self._last: dict | None = None
        self._prev_listing: list[str] | None = None
        self.late_dropped: list[str] = []  # observability, not state

    def _files_now(self) -> list[str]:
        return sorted(
            n
            for n in os.listdir(self.path)
            if n.endswith((".warc", ".warc.gz"))
            and os.path.isfile(os.path.join(self.path, n))
        )

    def initialOffset(self) -> dict:  # noqa: N802 - API contract
        return initial_offset()

    def latestOffset(self) -> dict:  # noqa: N802 - API contract
        # compacted offset (sources/offsets.py): boundary + explicit
        # recent names, O(cap) per checkpoint entry instead of the full
        # ever-ingested history
        prev = self._last or initial_offset()
        listed = self._files_now()
        late = late_arrivals(self._prev_listing, listed, prev["b"])
        if late:
            # counted-not-silently-lost: the compaction horizon skips
            # these (offsets.py docstring); surface like Spark's logged
            # maxFileAge skips
            self.late_dropped.extend(late)
            logger.warning(
                "warc stream %s: %d shard(s) landed below the compacted "
                "offset boundary %r and will NOT be ingested: %s",
                self.path, len(late), prev["b"], late,
            )
        self._prev_listing = listed
        off = advance_offset(prev, listed)
        self._last = off
        return off

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        start = normalize_offset(start, "files")
        end = normalize_offset(end, "files")
        if self._last is None:
            # driver restart: resume from the checkpointed offset so the
            # next latestOffset() folds from it (O(new+cap)) instead of
            # from initial_offset(), which would emit one O(all-files)
            # entry per restart (round-8 ADVICE)
            self._last = end
        new = new_names(start, end)
        return [_WarcPartition(os.path.join(self.path, n)) for n in new]

    def read(self, partition: _WarcPartition) -> Iterator[tuple]:
        return read_warc_file(partition.path)

    def commit(self, end: dict) -> None:
        # offsets live in the checkpoint; source-side we only seed the
        # in-memory cursor after a restart (see partitions())
        if self._last is None:
            self._last = normalize_offset(end, "files")


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)

    def streamReader(self, schema) -> WarcStreamReader:  # noqa: N802
        return WarcStreamReader(self.options)


def write_warc_records(path: str, records: list[dict], compress: bool = False) -> None:
    """Test/fixture helper: write records as a spec-shaped WARC file.

    Each record dict: warc_type, record_id, date, target_uri,
    content_type, and either ``http`` (status, headers, body — wrapped
    as an HTTP response message) or raw ``block`` bytes.
    """
    buf = bytearray()
    for r in records:
        if "http" in r:
            status, hdrs, body = r["http"]
            head = f"HTTP/1.1 {status} X\r\n".encode()
            for k, v in hdrs:
                head += f"{k}: {v}\r\n".encode()
            block = head + b"\r\n" + body
            ctype = "application/http; msgtype=response"
        else:
            block = r["block"]
            ctype = r.get("content_type", "application/octet-stream")
        headers = [
            ("WARC-Type", r.get("warc_type", "response")),
            ("WARC-Record-ID", r.get("record_id", "<urn:uuid:0>")),
            ("WARC-Date", r.get("date", "2026-01-01T00:00:00Z")),
            ("Content-Type", ctype),
            ("Content-Length", str(len(block))),
        ]
        if r.get("target_uri"):
            headers.insert(3, ("WARC-Target-URI", r["target_uri"]))
        buf += b"WARC/1.0\r\n"
        for k, v in headers:
            buf += f"{k}: {v}\r\n".encode()
        buf += b"\r\n" + block + b"\r\n\r\n"
    data = bytes(buf)
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as fh:
        fh.write(data)
