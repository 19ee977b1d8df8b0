"""Content-defined chunking dedup (dedup_cdc_chunks) — round 14.

The load-bearing properties of a CDC chunker, each pinned directly:

- EXACT COVERAGE: chunks tile the document — concatenating them
  reproduces the text, so total_chars ≡ doc length.
- RESYNCHRONIZATION: boundaries depend only on a 16-char window, so a
  prefix edit changes ONLY the chunks up to the first boundary after
  the edit; everything later re-aligns and deduplicates.  This is the
  property fixed-size chunking lacks and the reason CDC exists.
- DETERMINISM + cross-engine agreement is the lane's oracle gate; here
  we pin the boundary RULE itself (md5-window, last hex digit '0') on
  a hand-checked case so both engines can't drift together.
- PLAN: pure JVM (higher-order functions, no Python eval nodes).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from reindexer_spark.operators.dedup import CDC_W, _cdc_chunks, dedup_cdc_chunks


def _chunks_of(spark, texts):
    rows = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    out = {
        r["doc_id"]: r["c"]
        for r in rows.select(
            "doc_id", _cdc_chunks(F.col("text")).alias("c")
        ).collect()
    }
    return [out[i] for i in range(len(texts))]


def _ref_chunks(text: str) -> list[str]:
    """Python reference of the boundary rule: cut after position p
    (1-based) iff md5 of the CDC_W chars ending at p ends in hex '0'
    and p < len."""
    n = len(text)
    cuts = [
        p
        for p in range(CDC_W, n + 1)
        if p < n
        and hashlib.md5(
            text[p - CDC_W : p].encode("utf-8")
        ).hexdigest()[-1]
        == "0"
    ]
    starts = [0] + [p for p in cuts]
    ends = cuts + [n]
    return [text[s:e] for s, e in zip(starts, ends)]


def test_chunks_match_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog " * 6,
        "pack my box with five dozen liquor jugs. " * 4,
        "short",
        "",
        "exactly sixteen!",  # len == CDC_W: position W == n → no cut
    ]
    got = _chunks_of(spark, texts)
    for t, g in zip(texts, got):
        assert list(g) == _ref_chunks(t)


def test_chunks_tile_the_document(spark):
    texts = ["abcdefghij" * 50, "κόσμος αβγδε " * 40]  # incl. multibyte
    for t, g in zip(texts, _chunks_of(spark, texts)):
        assert "".join(g) == t


def test_prefix_edit_resynchronizes(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    edited = "XY" + base
    c_base, c_edit = _chunks_of(spark, [base, edited])
    assert len(c_base) > 3  # fixture long enough to be meaningful
    # everything after the first boundary re-aligns
    assert list(c_base[1:]) == list(c_edit[1:])
    # and the shared fraction is what dedup banks on
    shared = sum(1 for ch in c_edit if ch in set(c_base))
    assert shared >= len(c_edit) - 1


def test_lane_plan_is_jvm_only_and_totals_pin_coverage(spark, sf_dir):
    df = dedup_cdc_chunks(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    rows = df.collect()
    assert rows
    from reindexer_spark.catalog import load_table

    lens = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["total_chars"] == lens[r["doc_id"]]
        assert r["shared_occ"] <= r["n_chunks"]
        assert r["distinct_chunks"] <= r["n_chunks"]


def test_corpus_actually_shares_chunks(spark, sf_dir):
    """The documents table carries near-dup families — chunk-level
    sharing must be nonzero or the lane is measuring nothing."""
    rows = dedup_cdc_chunks(spark, sf_dir).collect()
    assert sum(r["shared_occ"] for r in rows) > 0
