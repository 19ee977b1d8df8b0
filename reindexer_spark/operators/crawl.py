"""Crawl-to-corpus end-to-end: WARC archives → HTTP decode → HTML text
extraction → C4-style line filter → quality gate → URL-canonical dedup →
exact content dedup → curated corpus.

This is the composed source-to-corpus pipeline an LLM-data team runs
over Common-Crawl-scale archives, registered as ONE gated query the way
``reindex_e2e`` composes the reference's job (reference driver.go runs
scan→transform→sink as one unit) and ``corpus_curation_funnel`` composes
the text stages.  The WARC leg is REAL: documents are wrapped into
spec-shaped WARC response records — rotating identity / gzip /
chunked-transfer wire encodings, 404s, request records, and non-HTML
content-types — written as gzipped shard files by executor tasks, then
read back through the custom ``warc`` DataSource (file-per-task, pushdown
pruning), so the gate covers the source's HTTP decoding (including the
Transfer-Encoding/Content-Encoding paths) by value, not just by unit
test: the DuckDB oracle computes the same corpus straight from
``documents``, and any byte the WARC round trip loses or mangles breaks
the hash.

Scale shape: everything between the scan and the two dedups is per-row
string work in whole-stage codegen (tag strip, line split, token
counts); the only shuffles are the two hash aggregations on ~60-byte
canonical URLs and 32-byte checksums — page text never shuffles.  At
100 TB the synth/write stage disappears (the archives already exist) and
the read side is exactly this plan.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from reindexer_spark.cache import track
from reindexer_spark.catalog import load_table
from reindexer_spark.registry import query

CRAWL_SHARDS = 8
LINE_WORDS = 8        # words per synthesized page line
MIN_LINE_WORDS = 5    # C4-style short-line drop
MIN_KEPT_LINES = 2    # doc-level quality gate


def _fixture_dir(kind: str, sf_dir: str) -> str:
    """Fresh per-process landing directory for synthesized WARC shards.

    Keyed by (fixture dir, pid) so two concurrent PROCESSES on the same
    fixture never race each other's cleanup (one used to unlink shards
    while the other's read listed them), and reset with rmtree so a
    stray subdirectory can't break the cleanup the old per-file unlink
    loop did.  Dirs left by DEAD pids are reaped opportunistically so
    repeated runs don't accumulate corpus copies in /tmp.  Two lanes in
    ONE process must use distinct ``kind`` tags — the reset races a
    shared path otherwise."""
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    tmp = tempfile.gettempdir()
    prefix = f"rs_{kind}_{tag}_"
    for name in os.listdir(tmp):
        if not name.startswith(prefix):
            continue
        try:
            pid = int(name[len(prefix):])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            # Only a definitively-dead pid is reaped: PermissionError
            # (also an OSError) means a LIVE process owned by another
            # user on a shared /tmp — its fixture must survive.
            shutil.rmtree(os.path.join(tmp, name), ignore_errors=True)
        except OSError:
            pass  # alive or indeterminate — leave it
    d = os.path.join(tmp, f"{prefix}{os.getpid()}")
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d)
    return d


def _page_lines(text: str) -> list[str]:
    words = text.split(" ")
    return [
        " ".join(words[i : i + LINE_WORDS])
        for i in range(0, len(words), LINE_WORDS)
    ]


def _raw_url(doc_id: int) -> str:
    url = (
        f"HTTPS://Crawl.Example.com:443/page/{doc_id % 150}"
        + ("/" if doc_id % 2 == 0 else "")
        + f"?utm_source=feed&ref=r{doc_id}"
    )
    if doc_id % 7 == 0:
        url += "#top"
    return url


def _chunked(body: bytes) -> bytes:
    out = b""
    for part in (body[:100], body[100:]):
        if part:
            out += hex(len(part))[2:].encode() + b"\r\n" + part + b"\r\n"
    return out + b"0\r\n\r\n"


def _chrome_page(doc_id: int, lines: list[str]) -> str:
    """Realistic page shaping for the main-content lane: the document's
    lines as <p> content paragraphs (every 4th line carries ONE inline
    link on its first word — nonzero but low link density), wrapped in
    the chrome every real page has: a nav bar, a related-links block,
    and a footer, all link-dominated.  Deterministic from doc_id so the
    oracle reconstructs every paragraph arithmetically."""
    sections = 2 + doc_id % 3
    nav = (
        '<a href="/home">Home</a> | <a href="/about">About</a>'
        + "".join(
            f' | <a href="/s/{k}">Section {k}</a>' for k in range(sections)
        )
    )
    paras = [f'<p class="nav">{nav}</p>']
    for li, ln in enumerate(lines):
        if li % 4 == 0:
            words = ln.split(" ")
            ln = (
                f'<a href="/r/{li}">{words[0]}</a>'
                + ("" if len(words) == 1 else " " + " ".join(words[1:]))
            )
        paras.append(f"<p>{ln}</p>")
    paras.append(
        f'<p class="rel">Related: <a href="/p{doc_id % 7}">read more</a>'
        f' <a href="/p{doc_id % 5}">see also</a></p>'
    )
    paras.append(
        '<p class="foot">© 2026 <a href="/terms">Terms of use</a>'
        ' <a href="/privacy">Privacy policy</a>'
        ' <a href="/contact">Contact us</a></p>'
    )
    return (
        f"<html><head><title>Doc {doc_id}</title></head><body>"
        + "".join(paras)
        + "</body></html>"
    )


def _synth_warc_shards(
    docs: DataFrame, out_dir: str, chrome: bool = False,
    mojibake: bool = False,
) -> None:
    """Write the documents as CRAWL_SHARDS gzipped WARC files — one
    file per task via applyInPandas (the write a crawl fetcher does;
    at 100 TB the archives pre-exist and this stage disappears).
    ``chrome=True`` wraps each page in nav/related/footer boilerplate
    (the main-content-extraction fixture); False keeps the bare
    paragraph pages the crawl_corpus_e2e oracle expects.
    ``mojibake=True`` (the encoding-repair fixture) appends a
    digest-derived accented token to every content line, then corrupts
    every doc_id % 5 == 3 page ON THE WIRE the way real crawls arrive
    corrupted: the page's UTF-8 bytes re-read as Latin-1 and re-encoded
    (so 'é' ships as 'Ã©', and the chrome's '©' as 'Â©'), BEFORE the
    gzip/chunked wire-form rotation."""

    def write_shard(key, pdf):
        import gzip as _gzip
        import hashlib

        import pandas as pd

        from reindexer_spark.sources.warc import write_warc_records

        (bucket,) = key
        pdf = pdf.sort_values("doc_id")
        records = []
        for r in pdf.itertuples(index=False):
            doc_id = int(r.doc_id)
            if doc_id % 10 == 6:  # paired request record (filtered later)
                records.append(
                    {
                        "warc_type": "request",
                        "record_id": f"<urn:req:{doc_id}>",
                        "target_uri": _raw_url(doc_id),
                        "block": b"GET / HTTP/1.1\r\nHost: x\r\n\r\n",
                        "content_type": "application/http; msgtype=request",
                    }
                )
            if doc_id % 17 == 5:
                body = b"%PDF-1.4 not-text " + str(doc_id).encode()
                ctype = "application/pdf"
                status = 200
            else:
                lines = _page_lines(r.text)
                if mojibake:
                    dg = hashlib.sha256(r.text.encode("utf-8")).hexdigest()
                    accent = chr(224 + int(dg[0:2], 16) % 32) + chr(
                        192 + int(dg[2:4], 16) % 24
                    )
                    lines = [ln + " " + accent for ln in lines]
                if chrome:
                    html = _chrome_page(doc_id, lines)
                else:
                    html = (
                        f"<html><head><title>Doc {doc_id}</title></head><body>"
                        + "".join(f"<p>{ln}</p>" for ln in lines)
                        + "</body></html>"
                    )
                body = html.encode("utf-8")
                if mojibake and doc_id % 5 == 3:
                    # the wire corruption itself: UTF-8 bytes re-read
                    # as Latin-1, re-encoded — always valid UTF-8 out
                    body = body.decode("latin-1").encode("utf-8")
                ctype = "text/html; charset=utf-8"
                status = 404 if doc_id % 13 == 4 else 200
            headers = [("Content-Type", ctype)]
            # rotate the wire form: the source must undo all three
            if doc_id % 3 == 1:
                body = _gzip.compress(body, mtime=0)
                headers.append(("Content-Encoding", "gzip"))
            elif doc_id % 3 == 2:
                body = _chunked(body)
                headers.append(("Transfer-Encoding", "chunked"))
            records.append(
                {
                    "warc_type": "response",
                    "record_id": f"<urn:doc:{doc_id}>",
                    "target_uri": _raw_url(doc_id),
                    "http": (status, headers, body),
                }
            )
        path = os.path.join(out_dir, f"crawl-{int(bucket):03d}.warc.gz")
        write_warc_records(path, records, compress=True)
        return pd.DataFrame(
            {"bucket": [int(bucket)], "n_records": [len(records)]}
        )

    shards = (
        docs.withColumn("bucket", (F.col("doc_id") % CRAWL_SHARDS).cast("int"))
        .groupBy("bucket")
        .applyInPandas(write_shard, "bucket int, n_records bigint")
    )
    shards.count()  # force the write


@query(
    "crawl_corpus_e2e",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1
               AS wi,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ), lines AS (
      SELECT doc_id, wi // {LINE_WORDS} AS li,
             string_agg(w, ' ' ORDER BY wi) AS line,
             COUNT(*) AS n_words
      FROM words GROUP BY doc_id, wi // {LINE_WORDS}
    ), stats AS (
      SELECT doc_id,
             CAST(COUNT(*) + 1 AS BIGINT) AS n_lines_raw,
             CAST(COUNT(*) FILTER (n_words >= {MIN_LINE_WORDS}) AS BIGINT)
               AS n_lines_kept,
             CAST(COALESCE(SUM(n_words) FILTER (n_words >= {MIN_LINE_WORDS}),
                           0) AS BIGINT) AS n_tokens,
             md5(string_agg(line, chr(10) ORDER BY li)
                 FILTER (n_words >= {MIN_LINE_WORDS})) AS checksum
      FROM lines GROUP BY doc_id
    ), eligible AS (
      SELECT s.*,
             'https://crawl.example.com/page/'
               || CAST(doc_id % 150 AS VARCHAR) AS url_canonical
      FROM stats s
      WHERE doc_id % 13 <> 4 AND doc_id % 17 <> 5
        AND n_lines_kept >= {MIN_KEPT_LINES}
    ), url_dedup AS (
      SELECT * FROM (
        SELECT e.*, MIN(doc_id) OVER (PARTITION BY url_canonical) AS rep
        FROM eligible e
      ) WHERE doc_id = rep
    ), content_dedup AS (
      SELECT * FROM (
        SELECT u.*, MIN(doc_id) OVER (PARTITION BY checksum) AS crep
        FROM url_dedup u
      ) WHERE doc_id = crep
    )
    SELECT doc_id, url_canonical, n_lines_raw, n_lines_kept, n_tokens,
           checksum
    FROM content_dedup
    """,
)
def crawl_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship source-to-corpus composition (module docstring).

    Spark side: synthesize + write real WARC shards, read them back
    through the custom ``warc`` DataSource (which strips chunked
    framing and gzip bodies), keep 200-status text/html responses,
    strip tags to lines, drop short lines (C4 rule), gate on
    {MIN_KEPT_LINES}+ surviving lines, canonicalize the ACTUAL
    WARC-Target-URI read off the archive, keep the lowest doc per
    canonical URL, then the lowest doc per content checksum.  The
    oracle recomputes the corpus from `documents` directly — equality
    proves the whole WARC wire round trip byte-exact."""
    from reindexer_spark.sources.warc import WarcDataSource

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out_dir = _fixture_dir("crawl", sf_dir)
    _synth_warc_shards(docs, out_dir)

    spark.dataSource.register(WarcDataSource)
    raw = spark.read.format("warc").load(out_dir)
    resp = (
        raw.filter(F.col("warc_type") == "response")
        .filter(F.col("http_status") == 200)
        .filter(F.col("content_type").startswith("text/html"))
        .select(
            F.regexp_extract(F.col("record_id"), r"doc:(\d+)", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("target_uri"),
            F.col("payload").cast("string").alias("html"),
        )
    )
    # --- HTML → lines (tag strip is pure codegen string work) ---------
    raw_lines = F.filter(
        F.split(F.regexp_replace(F.col("html"), "<[^>]+>", "\n"), "\n"),
        lambda x: x != "",
    )
    kept_lines = F.filter(
        F.col("raw_lines"),
        lambda x: F.size(F.split(x, " ")) >= MIN_LINE_WORDS,
    )
    shaped = (
        resp.withColumn("raw_lines", raw_lines)
        .withColumn("kept_lines", kept_lines)
        .select(
            "doc_id",
            "target_uri",
            F.size("raw_lines").cast("bigint").alias("n_lines_raw"),
            F.size("kept_lines").cast("bigint").alias("n_lines_kept"),
            F.aggregate(
                F.transform(
                    "kept_lines", lambda x: F.size(F.split(x, " "))
                ),
                F.lit(0).cast("bigint"),
                lambda acc, n: acc + n,
            ).alias("n_tokens"),
            F.md5(
                F.encode(F.array_join("kept_lines", "\n"), "UTF-8")
            ).alias("checksum"),
        )
        .filter(F.col("n_lines_kept") >= MIN_KEPT_LINES)
    )
    # --- canonicalize the URI actually read off the archive -----------
    canon = shaped.withColumn("url_canonical", _canonical_url())
    url_dedup = (
        canon.withColumn(
            "rep",
            F.min("doc_id").over(Window.partitionBy("url_canonical")),
        )
        .filter(F.col("doc_id") == F.col("rep"))
        .drop("rep")
    )
    content_dedup = (
        url_dedup.withColumn(
            "crep", F.min("doc_id").over(Window.partitionBy("checksum"))
        )
        .filter(F.col("doc_id") == F.col("crep"))
        .drop("crep")
    )
    return content_dedup.select(
        "doc_id",
        "url_canonical",
        "n_lines_raw",
        "n_lines_kept",
        "n_tokens",
        "checksum",
    )


def _canonical_url(uri: Column | None = None) -> Column:
    """Canonicalize a crawl URL: drop the fragment and query string,
    lowercase the scheme://host, strip a default :443 port and any
    trailing slash.  Column.substr accepts Column offsets, so the path
    derives from the SAME loc/scheme_host expressions as the host —
    one definition of the canonicalization rule shared by every lane."""
    if uri is None:
        uri = F.col("target_uri")
    base = F.regexp_replace(uri, "#.*$", "")
    loc = F.split_part(base, F.lit("?"), F.lit(1))
    scheme_host = F.regexp_extract(loc, "^[^/]+//[^/]+", 0)
    host_clean = F.regexp_replace(F.lower(scheme_host), ":443$", "")
    path_clean = F.regexp_replace(
        loc.substr(F.length(scheme_host) + 1, F.length(loc)), "/$", ""
    )
    return F.concat(host_clean, path_clean)


def _read_pages(
    spark: SparkSession, sf_dir: str, tag: str, mojibake: bool = False
) -> DataFrame:
    """Synthesize chrome-wrapped WARC shards and read the 200-status
    HTML pages back through the warc source, one string column per
    page (the wire forms — gzip/chunked/identity — already undone by
    the source)."""
    from reindexer_spark.sources.warc import WarcDataSource

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out_dir = _fixture_dir(tag, sf_dir)
    _synth_warc_shards(docs, out_dir, chrome=True, mojibake=mojibake)

    spark.dataSource.register(WarcDataSource)
    raw = spark.read.format("warc").load(out_dir)
    return (
        raw.filter(F.col("warc_type") == "response")
        .filter(F.col("http_status") == 200)
        .filter(F.col("content_type").startswith("text/html"))
        .select(
            F.regexp_extract(F.col("record_id"), r"doc:(\d+)", 1)
            .cast("bigint")
            .alias("doc_id"),
            "target_uri",
            F.col("payload").cast("string").alias("page"),
        )
    )


def _classify_paragraphs(pages: DataFrame) -> DataFrame:
    """Split each page into <p> blocks and attach each block's
    tag-stripped text plus its jusText-style main-content verdict
    (>= MIN_LINE_WORDS words AND link density < 1/3, integer-exact).
    Non-``page`` columns pass through onto every block row.  One
    definition, so crawl_main_content, crawl_refined_corpus and
    crawl_encoding_repair cannot diverge on the classifier."""
    carried = [c for c in pages.columns if c != "page"]
    paras = pages.select(
        *carried,
        F.posexplode(
            F.regexp_extract_all(
                F.col("page"), F.lit(r"<p[^>]*>(.*?)</p>"), F.lit(1)
            )
        ).alias("pi", "para"),
    )
    text = F.regexp_replace("para", r"<[^>]+>", "")
    link_chars = F.aggregate(
        F.regexp_extract_all("para", F.lit(r"<a [^>]*>(.*?)</a>"), F.lit(1)),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )
    return paras.select(
        *carried,
        "pi",
        text.alias("text"),
        (
            (F.size(F.split(text, " ")) >= MIN_LINE_WORDS)
            & (3 * link_chars < F.length(text))
        ).alias("good"),
    )


def _judged_paragraphs(spark: SparkSession, sf_dir: str, tag: str) -> DataFrame:
    """Shared front half of the main-content lanes: pages off the WARC
    wire, split and judged (see _read_pages / _classify_paragraphs)."""
    return _classify_paragraphs(_read_pages(spark, sf_dir, tag))


@query(
    "crawl_main_content",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1
               AS wi,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ), lines AS (
      SELECT doc_id, wi // {LINE_WORDS} AS li,
             string_agg(w, ' ' ORDER BY wi) AS line,
             CAST(COUNT(*) AS BIGINT) AS n_words
      FROM words GROUP BY doc_id, wi // {LINE_WORDS}
    ), paras AS (
      -- the content paragraphs: every 4th line carries one inline link
      -- on its first word (tag-stripped text is unchanged)
      SELECT doc_id, li, line, n_words,
             CAST(CASE WHEN li % 4 = 0
                  THEN length(string_split(line, ' ')[1])
                  ELSE 0 END AS BIGINT) AS link_chars
      FROM lines
    ), judged AS (
      SELECT doc_id, li, line,
             n_words >= {MIN_LINE_WORDS}
               AND 3 * link_chars < length(line) AS good
      FROM paras
    ), stats AS (
      -- + 3 chrome paragraphs (nav / related / footer), all
      -- link-dominated and provably boilerplate under the density rule
      SELECT doc_id,
             CAST(COUNT(*) + 3 AS BIGINT) AS n_paras,
             CAST(COUNT(*) FILTER (good) AS BIGINT) AS n_content,
             CAST(COUNT(*) FILTER (NOT good) + 3 AS BIGINT) AS n_boiler,
             CAST(COALESCE(SUM(length(line)) FILTER (good), 0) AS BIGINT)
               AS content_chars,
             md5(string_agg(line, chr(10) ORDER BY li) FILTER (good))
               AS content_digest
      FROM judged GROUP BY doc_id
    )
    SELECT doc_id, n_paras, n_content, n_boiler, content_chars,
           content_digest
    FROM stats
    WHERE doc_id % 13 <> 4 AND doc_id % 17 <> 5
    """,
)
def crawl_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction (round-7 VERDICT item #4): the crawl
    shaping step between tag-stripping and curation that real corpora
    need.  Pages are synthesized WITH the chrome every real page has —
    a nav bar, a related-links block, a footer, and inline links inside
    the body text — written as WARC shards (same rotating
    gzip/chunked/identity wire forms as crawl_corpus_e2e), read back
    through the warc source, split into <p> blocks, and each block is
    classified by the jusText-style signal (Pomikálek 2011, §3.3
    simplified): LINK DENSITY (chars inside <a> vs total text chars —
    boilerplate is link-dominated) and length (short blocks are
    boilerplate).  A block is main content iff it has >=
    {MIN_LINE_WORDS} words AND link_chars/chars < 1/3 (integer-exact as
    3*link_chars < chars).  Emits per page the block attrition and the
    md5 of the surviving text, so the oracle — which reconstructs every
    paragraph arithmetically from `documents` — proves the chrome was
    dropped and EXACTLY the body text survived, through the full WARC
    wire round trip.

    Scale shape: pure codegen column ops end-to-end — regexp block
    split + per-block density arithmetic + one hash-agg by doc; no
    Python, no shuffle beyond the final per-doc aggregation, and the
    classifier runs scan-side so at 100 TB the dropped chrome never
    reaches the shuffle."""
    judged = _judged_paragraphs(spark, sf_dir, "boiler")
    kept = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("good"), F.struct(F.col("pi"), F.col("text")))
            )
        ),
        lambda s: s["text"],
    )
    return judged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_paras"),
        F.sum(F.col("good").cast("int")).cast("bigint").alias("n_content"),
        F.sum((~F.col("good")).cast("int")).cast("bigint").alias("n_boiler"),
        F.sum(F.when(F.col("good"), F.length("text")).otherwise(0))
        .cast("bigint")
        .alias("content_chars"),
        F.when(
            F.sum(F.col("good").cast("int")) > 0,
            F.md5(F.concat_ws("\n", kept)),
        ).alias("content_digest"),
    )


@query(
    "crawl_refined_corpus",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1
               AS wi,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ), lines AS (
      SELECT doc_id, wi // {LINE_WORDS} AS li,
             string_agg(w, ' ' ORDER BY wi) AS line,
             CAST(COUNT(*) AS BIGINT) AS n_words
      FROM words GROUP BY doc_id, wi // {LINE_WORDS}
    ), judged AS (
      SELECT doc_id, li, line, n_words,
             n_words >= {MIN_LINE_WORDS}
               AND 3 * (CASE WHEN li % 4 = 0
                        THEN length(string_split(line, ' ')[1])
                        ELSE 0 END) < length(line) AS good
      FROM lines
    ), stats AS (
      SELECT doc_id,
             CAST(COUNT(*) + 3 AS BIGINT) AS n_paras,
             CAST(COUNT(*) FILTER (good) AS BIGINT) AS n_content,
             CAST(COALESCE(SUM(n_words) FILTER (good), 0) AS BIGINT)
               AS n_tokens,
             md5(string_agg(line, chr(10) ORDER BY li) FILTER (good))
               AS checksum
      FROM judged GROUP BY doc_id
    ), eligible AS (
      SELECT s.*,
             'https://crawl.example.com/page/'
               || CAST(doc_id % 150 AS VARCHAR) AS url_canonical
      FROM stats s
      WHERE doc_id % 13 <> 4 AND doc_id % 17 <> 5
        AND n_content >= {MIN_KEPT_LINES}
    ), url_dedup AS (
      SELECT * FROM (
        SELECT e.*, MIN(doc_id) OVER (PARTITION BY url_canonical) AS rep
        FROM eligible e
      ) WHERE doc_id = rep
    ), content_dedup AS (
      SELECT * FROM (
        SELECT u.*, MIN(doc_id) OVER (PARTITION BY checksum) AS crep
        FROM url_dedup u
      ) WHERE doc_id = crep
    )
    SELECT doc_id, url_canonical, n_paras, n_content, n_tokens, checksum
    FROM content_dedup
    """,
)
def crawl_refined_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The refined source-to-corpus flagship: crawl_corpus_e2e's
    curation with MAIN-CONTENT EXTRACTION in the loop — the pipeline a
    real crawl actually needs, since real pages carry chrome that
    tag-stripping alone would let into the corpus.  Chrome-wrapped
    pages (nav/related/footer + inline body links) ride the full WARC
    wire round trip, each <p> block is classified by the shared
    jusText-style density rule (ONE definition with
    crawl_main_content), pages gate on >= {MIN_KEPT_LINES} surviving
    content blocks, URLs canonicalize through the shared rule (ONE
    definition with crawl_corpus_e2e), and the corpus dedups by
    canonical URL then by content checksum OF THE EXTRACTED TEXT —
    so two pages differing only in chrome dedup together, which is
    exactly why extraction must precede content dedup at 100 TB.

    The oracle replays the whole composition from `documents`:
    paragraph reconstruction, density verdicts, gate, canonicalization,
    and both dedups — hash equality proves the five-stage pipeline
    value-exact end to end.

    Scale shape: same as the parent lanes — codegen classification
    scan-side, then two hash aggregations on ~60-byte URLs and 32-byte
    checksums; extracted text is hashed in-task and never shuffles."""
    judged = _judged_paragraphs(spark, sf_dir, "refined")
    kept = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("good"), F.struct(F.col("pi"), F.col("text")))
            )
        ),
        lambda s: s["text"],
    )
    per_doc = (
        judged.groupBy("doc_id")
        .agg(
            F.first("target_uri").alias("target_uri"),
            F.count("*").cast("bigint").alias("n_paras"),
            F.sum(F.col("good").cast("int"))
            .cast("bigint")
            .alias("n_content"),
            F.sum(
                F.when(
                    F.col("good"), F.size(F.split("text", " "))
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_tokens"),
            F.md5(F.concat_ws("\n", kept)).alias("checksum"),
        )
        .filter(F.col("n_content") >= MIN_KEPT_LINES)
    )
    canon = per_doc.withColumn("url_canonical", _canonical_url())
    url_dedup = (
        canon.withColumn(
            "rep", F.min("doc_id").over(Window.partitionBy("url_canonical"))
        )
        .filter(F.col("doc_id") == F.col("rep"))
        .drop("rep")
    )
    content_dedup = (
        url_dedup.withColumn(
            "crep", F.min("doc_id").over(Window.partitionBy("checksum"))
        )
        .filter(F.col("doc_id") == F.col("crep"))
        .drop("crep")
    )
    return content_dedup.select(
        "doc_id",
        "url_canonical",
        "n_paras",
        "n_content",
        "n_tokens",
        "checksum",
    )


@query(
    "crawl_encoding_repair",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text,
             224 + CAST(('0x' || substr(sha256(text), 1, 2)) AS INT) % 32
               AS cc1,
             192 + CAST(('0x' || substr(sha256(text), 3, 2)) AS INT) % 24
               AS cc2
      FROM documents
    ), words AS (
      SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1
               AS wi,
             unnest(string_split(text, ' ')) AS w
      FROM s
    ), bodies AS (
      SELECT doc_id, wi // {LINE_WORDS} AS li,
             string_agg(w, ' ' ORDER BY wi) AS body,
             CAST(COUNT(*) AS BIGINT) AS n_raw
      FROM words GROUP BY doc_id, wi // {LINE_WORDS}
    ), lines AS (
      -- every content line carries the digest-derived accented token
      SELECT b.doc_id, li,
             body || ' ' || chr(cc1) || chr(cc2) AS line,
             n_raw + 1 AS n_words,
             CAST(CASE WHEN li % 4 = 0
                  THEN length(string_split(body, ' ')[1])
                  ELSE 0 END AS BIGINT) AS link_chars
      FROM bodies b JOIN s USING (doc_id)
    ), judged AS (
      SELECT doc_id, li, line,
             n_words >= {MIN_LINE_WORDS}
               AND 3 * link_chars < length(line) AS good
      FROM lines
    ), stats AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(COUNT(*) FILTER (good) AS BIGINT) AS n_content,
             CAST(COALESCE(SUM(length(line)) FILTER (good), 0) AS BIGINT)
               AS content_chars,
             md5(string_agg(line, chr(10) ORDER BY li) FILTER (good))
               AS content_digest
      FROM judged GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END AS INT)
             AS was_corrupted,
           -- 2 mojibake sequences per accented line + 1 for the
           -- footer's '©' on corrupted pages
           CAST(CASE WHEN doc_id % 5 = 3 THEN 2 * n_lines + 1 ELSE 0 END
                AS INT) AS n_moji_seqs,
           n_content, content_chars, content_digest
    FROM stats
    WHERE doc_id % 13 <> 4 AND doc_id % 17 <> 5
    """,
)
def crawl_encoding_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl ENCODING-REPAIR flagship: main-content extraction with
    mojibake repair in the loop — the composition a real crawl needs,
    because encoding corruption arrives ON THE WIRE (a fetcher or an
    origin server that declared charset=utf-8 while re-encoding
    Latin-1-misread bytes) and must be repaired between wire decode and
    curation or the corrupted pages poison dedup checksums and quality
    gates.  Pages carry accented content (digest-derived token per
    line, plus the chrome's real '©'); every doc_id % 5 == 3 page is
    shipped mojibake'd (UTF-8 read as Latin-1, re-encoded — exactly the
    corruption class ftfy exists for), riding the same rotating
    gzip/chunked/identity wire forms as the sibling lanes.  The lane
    reads the shards back, counts mojibake signatures per page, applies
    ONE guarded repair round (the shared encoding_fix — identical
    expression to text_encoding_repair), then runs the shared
    jusText-style paragraph classifier and digests the surviving text.

    The oracle reconstructs the CLEAN page arithmetically from
    `documents` — so hash equality proves three things at once: repair
    fired on exactly the corrupted pages (was_corrupted), it undid the
    corruption byte-exactly THROUGH the WARC wire round trip (the
    digest of extracted content equals the never-corrupted
    construction), and it touched nothing else (clean accented pages
    pass through with the same digests).

    Scale shape: identical to crawl_main_content — the repair is three
    regex/charset codegen ops scan-side, corrupted text never reaches
    the shuffle, and the only aggregation hashes ~32-byte digests."""
    from reindexer_spark.operators.text_clean import MOJI_SIG, encoding_fix

    pages = _read_pages(spark, sf_dir, "encrepair", mojibake=True)
    # Evaluate the (expensive: encode/decode/rlike over whole pages)
    # repair expression ONCE per row and derive was_corrupted from the
    # materialized column — relying on codegen CSE to dedup two copies
    # of the chain roughly doubled scan cost when it didn't fire.
    repaired = pages.select(
        "doc_id",
        F.size(F.regexp_extract_all("page", F.lit(MOJI_SIG), 0))
        .cast("int")
        .alias("n_moji_seqs"),
        F.col("page").alias("raw_page"),
        encoding_fix(F.col("page")).alias("page"),
    ).select(
        "doc_id",
        "n_moji_seqs",
        "page",
        (F.col("page") != F.col("raw_page")).cast("int").alias("was_corrupted"),
    )
    judged = _classify_paragraphs(repaired)
    kept = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("good"), F.struct(F.col("pi"), F.col("text")))
            )
        ),
        lambda s: s["text"],
    )
    return judged.groupBy("doc_id").agg(
        F.first("was_corrupted").alias("was_corrupted"),
        F.first("n_moji_seqs").alias("n_moji_seqs"),
        F.sum(F.col("good").cast("int")).cast("bigint").alias("n_content"),
        F.sum(F.when(F.col("good"), F.length("text")).otherwise(0))
        .cast("bigint")
        .alias("content_chars"),
        F.when(
            F.sum(F.col("good").cast("int")) > 0,
            F.md5(F.concat_ws("\n", kept)),
        ).alias("content_digest"),
    )


# --- crawl-to-MEDIA-corpus: the multimodal twin of crawl_corpus_e2e ---

MEDIA_CTYPE = {
    "image-bmp": "image/bmp",
    "image-jpeg": "image/jpeg",
    "image-png": "image/png",
    "image-gif": "image/gif",
    "audio-wav": "audio/x-wav",
    "audio-flac": "audio/flac",
    "video-avi": "video/x-msvideo",
    "video-mjpeg": "video/x-msvideo",
    "video-mp4": "video/mp4",
    "video-mkv": "video/x-matroska",
}
HARVEST_DOCS = 120


def _synth_media_warc(media: DataFrame, out_dir: str) -> None:
    """Write media payloads as WARC response records — gzip wire
    encoding on some (binary bodies compress on the wire too), paired
    request records, 404s, an HTML decoy, and a JUNK class that CLAIMS
    image/bmp but carries garbage (the probe must catch it)."""

    def write_shard(key, pdf):
        import gzip as _gzip

        import pandas as pd

        from reindexer_spark.sources.warc import write_warc_records

        (bucket,) = key
        pdf = pdf.sort_values("media_id")
        records = []
        for r in pdf.itertuples(index=False):
            mid = int(r.media_id)
            if mid % 10 == 6:
                records.append(
                    {
                        "warc_type": "request",
                        "record_id": f"<urn:req:{mid}>",
                        "target_uri": f"https://media.example/{mid}",
                        "block": b"GET / HTTP/1.1\r\nHost: m\r\n\r\n",
                        "content_type": "application/http; msgtype=request",
                    }
                )
            if mid % 11 == 7:  # junk: bytes that aren't what they claim
                body = b"\x00garbage" + bytes(r.payload)[:32][::-1]
                ctype = "image/bmp"
            elif mid % 9 == 2:  # HTML decoy, dropped by the media filter
                body = b"<html><body>not media</body></html>"
                ctype = "text/html"
            else:
                body = bytes(r.payload)
                ctype = MEDIA_CTYPE[r.kind]
            status = 404 if mid % 13 == 4 else 200
            headers = [("Content-Type", ctype)]
            if mid % 5 == 3:
                body = _gzip.compress(body, mtime=0)
                headers.append(("Content-Encoding", "gzip"))
            records.append(
                {
                    "warc_type": "response",
                    "record_id": f"<urn:doc:{mid}>",
                    "target_uri": f"https://media.example/{mid}",
                    "http": (status, headers, body),
                }
            )
        path = os.path.join(out_dir, f"media-{int(bucket):03d}.warc.gz")
        write_warc_records(path, records, compress=True)
        return pd.DataFrame(
            {"bucket": [int(bucket)], "n_records": [len(records)]}
        )

    (
        media.withColumn(
            "bucket", (F.col("media_id") % CRAWL_SHARDS).cast("int")
        )
        .groupBy("bucket")
        .applyInPandas(write_shard, "bucket int, n_records bigint")
        .count()
    )


def _harvest_core(
    spark: SparkSession, sf_dir: str, tag: str = "mediacrawl"
) -> DataFrame:
    """Shared body of crawl_media_harvest and its signature twin — ONE
    definition, so the rows-only lane and the hash gate cannot diverge.
    See crawl_media_harvest for the full pipeline story.
    Real media payloads (the ten-format fixture rotation) are written
    into WARC shards by executor tasks — some gzip wire-encoded, plus
    request records, 404s, HTML decoys, and junk bytes that CLAIM to be
    BMP — read back through the ``warc`` DataSource, then curated the
    way a 100 TB crawl actually is: status/content-type filter →
    header-only PROBE (dims/frames/samples, no entropy decoding — the
    junk class dies here for the cost of reading a header) → full
    decode to features on the survivors (per-row quarantine).  Emits
    one row per response with its fate and the probe-vs-decode
    dimensions, so the attrition at every stage is visible in the
    gate's row set.

    Scale shape: payloads move task-locally through the probe and
    decode mapInPandas stages (Arrow-batched, never shuffled); the
    probe pass costs header bytes per object and rejects junk before
    the decode pass pays for pixels — the ordering that matters when
    decode is 100-1000× the probe cost.  Deterministic but byte-level
    (container synthesis + codecs) → rows-only check; the stage
    attrition and probe≡decode agreement are pinned in unit tests."""
    from reindexer_spark.multimodal import LibraryCodec, extract_media_features
    from reindexer_spark.operators.multimodal import _synth_media

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < HARVEST_DOCS
    )
    media = _synth_media(docs)
    out_dir = _fixture_dir(tag, sf_dir)
    _synth_media_warc(media, out_dir)

    from reindexer_spark.sources.warc import WarcDataSource

    spark.dataSource.register(WarcDataSource)
    raw = spark.read.format("warc").load(out_dir)
    resp = (
        raw.filter(F.col("warc_type") == "response")
        .filter(F.col("http_status") == 200)
        .filter(
            F.col("content_type").startswith("image/")
            | F.col("content_type").startswith("audio/")
            | F.col("content_type").startswith("video/")
        )
        .select(
            F.regexp_extract(F.col("record_id"), r"doc:(\d+)", 1)
            .cast("bigint")
            .alias("media_id"),
            F.col("content_type").alias("kind"),
            "payload",
        )
    )

    probe_schema = (
        "media_id bigint, kind string, payload binary, probe_ok int, "
        "probe_w int, probe_h int, probe_frames int, probe_rate int, "
        "probe_samples bigint"
    )

    def probe(batches):
        import pandas as pd

        from reindexer_spark.codecs import MediaFormatError, probe_media

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                row = {
                    "media_id": r.media_id,
                    "kind": r.kind,
                    "payload": r.payload,
                    "probe_ok": 0,
                    "probe_w": None,
                    "probe_h": None,
                    "probe_frames": None,
                    "probe_rate": None,
                    "probe_samples": None,
                }
                try:
                    p = probe_media(bytes(r.payload))
                    row.update(
                        probe_ok=1,
                        probe_w=p["width"],
                        probe_h=p["height"],
                        probe_frames=p["n_frames"],
                        probe_rate=p["sample_rate"],
                        probe_samples=p["n_samples"],
                    )
                except MediaFormatError:
                    pass
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "probe_ok", "probe_w",
                    "probe_h", "probe_frames", "probe_rate",
                    "probe_samples",
                ],
            )

    from reindexer_spark.cache import track

    # probed feeds BOTH the survivors->decode branch and the final
    # report join; without a persist the whole WARC-read + header-probe
    # subtree executes twice — the exact pass the probe-first design
    # exists to pay only once
    probed = track(resp.mapInPandas(probe, probe_schema))
    survivors = probed.filter(F.col("probe_ok") == 1).select(
        "media_id", "kind", "payload",
        F.create_map(F.lit("stage"), F.lit("probe-pass")).alias("meta"),
    )
    feats = extract_media_features(survivors, codec=LibraryCodec()).select(
        "media_id",
        F.col("width").alias("dec_w"),
        F.col("height").alias("dec_h"),
        "n_bytes",
        "checksum",
    )
    return (
        probed.drop("payload")
        .join(feats, "media_id", "left")
        .select(
            "media_id",
            "kind",
            "probe_ok",
            "probe_w",
            "probe_h",
            "probe_frames",
            "probe_rate",
            "probe_samples",
            "dec_w",
            "dec_h",
            "n_bytes",
            "checksum",
        )
    )


@query("crawl_media_harvest")  # Python codec output → rows-only check
def crawl_media_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-to-media-corpus: the multimodal twin of crawl_corpus_e2e.
    Real media payloads (the ten-format fixture rotation) are written
    into WARC shards by executor tasks — some gzip wire-encoded, plus
    request records, 404s, HTML decoys, and junk bytes that CLAIM to be
    BMP — read back through the ``warc`` DataSource, then curated the
    way a 100 TB crawl actually is: status/content-type filter →
    header-only PROBE (dims/frames/samples, no entropy decoding — the
    junk class dies here for the cost of reading a header) → full
    decode to features on the survivors (per-row quarantine).  Emits
    one row per response with its fate and the probe-vs-decode
    dimensions, so the attrition at every stage is visible in the
    gate's row set.

    Scale shape: payloads move task-locally through the probe and
    decode mapInPandas stages (Arrow-batched, never shuffled); the
    probe pass costs header bytes per object and rejects junk before
    the decode pass pays for pixels — the ordering that matters when
    decode is 100-1000× the probe cost.  The byte-level columns
    (checksum, n_bytes) keep THIS lane rows-only; everything else is
    hash-gated by crawl_media_harvest_sig."""
    return _harvest_core(spark, sf_dir)


@query(
    "crawl_media_harvest_sig",
    oracle=f"""
    WITH base AS (
      SELECT doc_id AS media_id, sha256(text) AS dg
      FROM documents
      WHERE doc_id < {HARVEST_DOCS}
        AND doc_id % 13 <> 4
        AND (doc_id % 11 = 7 OR doc_id % 9 <> 2)
    ),
    s AS (
      SELECT media_id,
             CAST(('0x' || substr(dg, 1, 2)) AS INT) AS s0,
             CAST(('0x' || substr(dg, 3, 2)) AS INT) AS s1,
             CAST(('0x' || substr(dg, 5, 2)) AS INT) AS s2,
             media_id % 11 = 7 AS junk,
             media_id % 12 = 2 AS gif,
             media_id % 11 <> 7 AND media_id % 12 <> 2
               AND media_id % 3 = 2 AS audio,
             media_id % 11 <> 7 AND media_id % 12 <> 2
               AND media_id % 3 = 1 AS video
      FROM base
    )
    SELECT media_id,
      CASE
        WHEN junk THEN 'image/bmp'
        WHEN gif THEN 'image/gif'
        WHEN audio AND media_id % 12 = 8 THEN 'audio/flac'
        WHEN audio THEN 'audio/x-wav'
        WHEN video AND media_id % 12 = 7 THEN 'video/mp4'
        WHEN video AND media_id % 12 = 10 THEN 'video/x-matroska'
        WHEN video THEN 'video/x-msvideo'
        WHEN media_id % 6 = 0 THEN 'image/jpeg'
        WHEN media_id % 12 = 3 THEN 'image/png'
        ELSE 'image/bmp'
      END AS kind,
      CAST(CASE WHEN junk THEN 0 ELSE 1 END AS INT) AS probe_ok,
      CAST(CASE WHEN junk OR audio THEN NULL
                WHEN video THEN 6 + s0 % 7
                ELSE 8 + s0 % 9 END AS INT) AS probe_w,
      CAST(CASE WHEN junk OR audio THEN NULL
                WHEN video THEN 6 + s1 % 7
                ELSE 8 + s1 % 9 END AS INT) AS probe_h,
      CAST(CASE WHEN junk OR audio THEN NULL
                WHEN gif THEN 2 + s2 % 3
                WHEN video THEN 3 + s2 % 4
                ELSE 1 END AS INT) AS probe_frames,
      CAST(CASE WHEN audio THEN 8000 END AS INT) AS probe_rate,
      CAST(CASE WHEN audio THEN 16000 END AS BIGINT) AS probe_samples,
      CAST(CASE WHEN junk THEN NULL
                WHEN audio THEN 16000
                WHEN video THEN 6 + s0 % 7
                ELSE 8 + s0 % 9 END AS INT) AS dec_w,
      CAST(CASE WHEN junk THEN NULL
                WHEN audio THEN 8000
                WHEN video THEN 6 + s1 % 7
                ELSE 8 + s1 % 9 END AS INT) AS dec_h
    FROM s
    """,
)
def crawl_media_harvest_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HASH-GATED signature of crawl_media_harvest (round-7 VERDICT
    item #6): the same WARC-write → wire-decode → probe → full-decode
    pipeline (one shared core, so the gate and the rows-only lane
    cannot diverge), projected onto the columns an oracle CAN recompute
    — identity, MIME class, probe fate, probed dimensions/frames/rate,
    and decoded dimensions.  The media payloads are synthesized from
    sha256(text), and DuckDB has sha256, so the oracle re-derives every
    expected value arithmetically from `documents`: equality proves the
    wire round trip, the content-type/status curation, the junk
    rejection at probe, AND that probe and decoder agree on dimensions
    — for every container format in the rotation.  Only the pixel-level
    checksum/n_bytes stay rows-only (in the parent lane)."""
    return _harvest_core(spark, sf_dir, tag="mediasig").select(
        "media_id",
        "kind",
        "probe_ok",
        "probe_w",
        "probe_h",
        "probe_frames",
        "probe_rate",
        "probe_samples",
        "dec_w",
        "dec_h",
    )


# --- reindex → search: the reference's job composed with retrieval ----

RS_K1 = 1.2
RS_B = 0.75
RS_TOPK = 10
RS_QUERIES: dict[int, tuple[str, ...]] = {
    1: ("table", "scan"),
    2: ("fast", "merge"),
    3: ("key", "order", "sort"),
}
_RS_TERMS = tuple(sorted({t for q in RS_QUERIES.values() for t in q}))
_RS_QUERY_SQL = " UNION ALL ".join(
    f"SELECT {qid} AS query_id, '{t}' AS word"
    for qid, terms in RS_QUERIES.items()
    for t in terms
)


@query(
    "reindex_then_search",
    oracle=f"""
    WITH q(query_id, word) AS ({_RS_QUERY_SQL}),
    indexed AS (
      SELECT 'id' || lpad(CAST(doc_id AS VARCHAR), 7, '0') AS id,
             string_split(SUBSTRING(text, 1, 40), ' ') AS t
      FROM documents
      WHERE doc_id % 10 <> 9 AND doc_id % 31 <> 3
    ), dl AS (
      SELECT id, CAST(len(t) AS BIGINT) AS dl FROM indexed
    ), corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST((SUM(dl) * 1000000) // COUNT(*) AS DOUBLE) / 1000000.0
               AS avgdl
      FROM dl
    ), words AS (
      SELECT id, unnest(t) AS word FROM indexed
    ), tf AS (
      SELECT id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM words WHERE word IN {_RS_TERMS!r}
      GROUP BY id, word
    ), df AS (
      SELECT word, CAST(COUNT(DISTINCT id) AS BIGINT) AS df
      FROM words WHERE word IN {_RS_TERMS!r}
      GROUP BY word
    ), scored AS (
      SELECT qq.query_id, tf.id,
             CAST(ROUND(
               ROUND(LN((c.n - df.df + 0.5) / (df.df + 0.5) + 1.0), 6)
               * ((tf.tf * 2.2)
                  / (tf.tf + {RS_K1} * (1.0 - {RS_B}
                     + {RS_B} * (CAST(dl.dl AS DOUBLE) / c.avgdl)))),
               6) AS DECIMAL(20,6)) AS term_score
      FROM q qq
      JOIN tf ON tf.word = qq.word
      JOIN df ON df.word = qq.word
      JOIN dl ON dl.id = tf.id
      CROSS JOIN corpus c
    ), totals AS (
      SELECT query_id, id, CAST(SUM(term_score) AS DOUBLE) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      FROM scored GROUP BY query_id, id
    )
    SELECT query_id, rnk, id, score, n_terms_hit FROM (
      SELECT query_id, id, score, n_terms_hit,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, id) AS rnk
      FROM totals
    ) WHERE rnk <= {RS_TOPK}
    """,
)
def reindex_then_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's END-TO-END purpose, closed: its job shapes
    Postgres rows through parse→flatten→suffix into Solr documents
    (reference driver.go scan → argot → bulk upsert) so that Solr can
    SEARCH them — this query runs the whole arc natively.  The real
    docpipe executes (spofford-shaped scan, JSON parse with quarantine,
    soft-delete filter, flatten + dynamic-field suffixing, batched sink
    through the capture transport), the sunk Solr documents are read
    BACK from the capture directory, and Okapi BM25 — Solr's default
    similarity — ranks them over the indexed `title_main_t` field.

    The DuckDB oracle recomputes the ranking straight from `documents`
    under the pipeline's eligibility rules (soft-deleted %10==9 rows
    filtered, corrupt %31==3 payloads quarantined), so hash equality
    proves the ENTIRE docpipe round trip value-exact — every document
    the pipeline should index, exactly once, with its indexed field
    intact — while the ranking math reuses docs_bm25_search's
    determinism contract (integer-exact avgdl, once-rounded idf,
    DECIMAL-summed term scores, id tie-breaks).

    Scale shape: the docpipe is the reference's own (batched sink,
    per-partition transport); search-side statistics are tiny
    broadcast aggregates and scoring touches candidate postings only."""
    from reindexer_spark.docpipe import ReindexConfig, SolrSink
    from reindexer_spark.docpipe.pipeline import (
        documents_as_spofford,
        run_reindex,
    )
    from reindexer_spark.docpipe.solr_sink import DirectoryCaptureTransport

    docs = documents_as_spofford(
        load_table(spark, sf_dir, "documents")
    )
    cap_dir = _fixture_dir("search", sf_dir)
    conf = ReindexConfig(password="search", solr_url="capture://search")
    sink = SolrSink(
        conf.solr_url,
        batch_size=conf.chunk_size,
        transport_factory=lambda: DirectoryCaptureTransport(cap_dir),
    )
    run_reindex(docs, conf, sink=sink)

    # cached (optimization r16): bm25_rank scans its input three ways
    # (doc lengths, corpus stats, postings) and a multiLine JSON source
    # additionally pays a whole-file schema-inference pass — uncached,
    # the capture dir was re-read four times per run
    indexed = track(
        spark.read.option("multiLine", "true")
        .json(cap_dir)
        .select("id", F.split("title_main_t", " ").alias("t"))
    )
    from reindexer_spark.operators.text import bm25_rank

    return bm25_rank(
        spark, indexed, "id", _RS_TERMS, RS_QUERIES, RS_K1, RS_B, RS_TOPK
    )


@query(
    "stream_crawl_ingest_live",
    oracle="""
    WITH base AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS n_words
      FROM documents
    ),
    h AS (
      SELECT doc_id, text, (n_words + 7) // 8 AS n_lines FROM base
    ),
    html AS (
      SELECT doc_id,
             58 + len(CAST(doc_id AS VARCHAR)) + 7 * n_lines
                + len(text) - (n_lines - 1) AS nb
      FROM h
    )
    SELECT 'request' AS warc_type, CAST(NULL AS INT) AS http_status,
           'application/http' AS content_class,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(COUNT(*) * 27 AS BIGINT) AS total_bytes
    FROM documents WHERE doc_id % 10 = 6
    UNION ALL
    SELECT 'response', 200, 'application/pdf',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(18 + len(CAST(doc_id AS VARCHAR))) AS BIGINT)
    FROM documents WHERE doc_id % 17 = 5
    UNION ALL
    SELECT 'response', 404, 'text/html',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(nb) AS BIGINT)
    FROM html WHERE doc_id % 13 = 4 AND doc_id % 17 <> 5
    UNION ALL
    SELECT 'response', 200, 'text/html',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(nb) AS BIGINT)
    FROM html WHERE doc_id % 13 <> 4 AND doc_id % 17 <> 5
    ORDER BY warc_type, http_status, content_class
    """,
)
def stream_crawl_ingest_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl ingestion under the REAL streaming engine: the custom warc
    DataSource's streaming reader tails a landing directory (each
    micro-batch ingests the WARC shards that appeared since the last
    offset; one new file = one input partition, so the stream
    distributes exactly like the batch source), and the gate aggregates
    per record class — type, HTTP status, content class — with record
    counts AND exact payload byte totals.

    The byte totals are the teeth: shard wire forms rotate
    identity/gzip/chunked per document, so the totals only match the
    oracle (which recomputes every page's decompressed size from
    `documents` arithmetically) if the streaming path undoes every wire
    encoding byte-exactly — the same proof crawl_corpus_e2e makes for
    batch, now under readStream.

    Scale shape: file-granular exactly-once (the offset is the ingested
    file set, a shard is assigned to exactly one micro-batch), state
    bounded by the class aggregation, payloads never shuffle — only the
    per-class partial sums do."""
    from reindexer_spark.sources.warc import WarcDataSource
    from reindexer_spark.streaming import run_stream_to_memory

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out_dir = _fixture_dir("streamcrawl", sf_dir)
    _synth_warc_shards(docs, out_dir)

    spark.dataSource.register(WarcDataSource)
    raw = spark.readStream.format("warc").load(out_dir)
    agg = (
        raw.select(
            "warc_type",
            "http_status",
            F.split("content_type", ";").getItem(0).alias("content_class"),
            "n_bytes",
        )
        .groupBy("warc_type", "http_status", "content_class")
        .agg(
            F.count("*").cast("bigint").alias("n_records"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        )
    )
    return run_stream_to_memory(agg, output_mode="complete").orderBy(
        "warc_type", "http_status", "content_class"
    )
