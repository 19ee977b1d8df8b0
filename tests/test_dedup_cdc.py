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


def test_lane_plan_is_arrow_batched_and_totals_pin_coverage(spark, sf_dir):
    """Optimization r17: the cut scan moved from an interpreted JVM
    md5-per-position HOF into ONE vectorized Arrow pass (_md5_cuts_vec)
    — the plan must show exactly one ArrowEvalPython lineage and never
    a row-at-a-time BatchEvalPython; chunk substrings and the rollup
    stay JVM-side."""
    df = dedup_cdc_chunks(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # the UDF runs once, at cache materialization: every textual
    # ArrowEvalPython occurrence must be cached lineage reprinted
    # under an InMemoryRelation (the topic-balance convention), never
    # a stacked duplicate evaluation (guide §4.4)
    n_arrow = plan.count("ArrowEvalPython")
    n_cached = plan.count("InMemoryRelation")
    assert n_arrow == n_cached, plan
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


# ---------------------------------------------------------------------------
# Gear-hash CDC (round 15)
# ---------------------------------------------------------------------------


def _gear_ref_cuts(text: str) -> list[int]:
    """Python reference of the ROLLING fold: h' = (2h + GEAR[cp%256])
    mod 2^48, cut at p (1-based) iff (h_p & mask) == 0 and p < n."""
    from reindexer_spark.operators.dedup import (
        _GEAR,
        _GEAR_MASK,
        _GEAR_MOD,
    )

    h, cuts = 0, []
    for p, ch in enumerate(text, 1):
        h = (h * 2 + _GEAR[ord(ch) % 256]) & _GEAR_MOD
        if (h & _GEAR_MASK) == 0 and p < len(text):
            cuts.append(p)
    return cuts


def _gear_windowed_cuts(text: str) -> list[int]:
    """The oracle's WINDOWED formulation: masked test at p from the
    last min(p, 48) chars only — must equal the rolling fold."""
    from reindexer_spark.operators.dedup import (
        _GEAR,
        _GEAR_BITS,
        _GEAR_MASK,
    )

    n = len(text)
    cuts = []
    for p in range(1, n):
        s = 0
        for j in range(min(p, _GEAR_BITS)):
            g = _GEAR[ord(text[p - 1 - j]) % 256]
            s += (g % (1 << (_GEAR_BITS - j))) * (1 << j)
        if (s & _GEAR_MASK) == 0:
            cuts.append(p)
    return cuts


def test_gear_rolling_equals_windowed_formulation():
    """The algebraic identity both engines rely on: the mod-2^48
    rolling fold and the 48-char windowed sum produce identical
    boundary sets (mod distributes over the sum; (G<<j) mod 2^48
    vanishes for j >= 48)."""
    import numpy as np

    rng = np.random.default_rng(48)
    texts = [
        "the quick brown fox jumps over the lazy dog " * 20,
        "".join(chr(32 + int(v)) for v in rng.integers(0, 900, 3000)),
        "a" * 200,
        "xy",
        "",
    ]
    for t in texts:
        assert _gear_ref_cuts(t) == _gear_windowed_cuts(t), t[:30]


def test_gear_chunks_match_python_reference(spark):
    from reindexer_spark.operators.dedup import _gear_chunks

    texts = [
        "the quick brown fox jumps over the lazy dog " * 6,
        "pack my box with five dozen liquor jugs. " * 4,
        "short",
        "",
        "κόσμος αβγδε " * 40,  # multibyte codepoints (cp % 256)
    ]
    rows = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: list(r["c"])
        for r in rows.select(
            "doc_id", _gear_chunks(F.col("text")).alias("c")
        ).collect()
    }
    for i, t in enumerate(texts):
        cuts = _gear_ref_cuts(t)
        starts = [0] + cuts
        ends = cuts + [len(t)]
        exp = [t[s:e] for s, e in zip(starts, ends)]
        assert got[i] == exp, i
        assert "".join(got[i]) == t  # exact coverage


def test_gear_prefix_edit_resynchronizes(spark):
    """Gear boundaries depend on a 48-char window, so a prefix edit
    re-aligns after the first boundary past the edit."""
    base = "the quick brown fox jumps over the lazy dog " * 10
    edited = "XY" + base
    cb, ce = _gear_ref_cuts(base), _gear_ref_cuts(edited)
    assert len(cb) > 2
    # boundaries past the first window re-align (shifted by 2)
    tail_b = [p for p in cb if p > 48]
    tail_e = [p - 2 for p in ce if p > 50]
    assert tail_b == tail_e


def test_gear_lane_plan_arrow_batched(spark, sf_dir):
    """Round 16: the hot lane's cut positions come from ONE
    Arrow-batched numpy UDF (a clean A/B showed the interpreted JVM
    fold losing to the md5 twin on both corpus shapes); the plan must
    show exactly that — ArrowEvalPython for the cuts, never
    row-at-a-time BatchEvalPython, chunking/rollup JVM-side."""
    from reindexer_spark.operators.dedup import dedup_cdc_gear

    df = dedup_cdc_gear(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    # the rollup's two branches read the TRACKED hash relation — the
    # UDF subtree prints under InMemoryTableScan, it does not re-run
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
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
    assert sum(r["shared_occ"] for r in rows) > 0


def test_gear_vectorized_equals_fold_reference():
    """The Arrow-batched numpy cuts (_gear_cuts_vec) must equal the
    rolling-fold definition exactly — directed shapes (empty, single
    char, long uniform, >255 codepoints) plus random sweeps.  The
    fold is the definition; the vectorized form is the hot path."""
    import numpy as np

    from reindexer_spark.operators.dedup import (
        _GEAR,
        _GEAR_MASK,
        _GEAR_MOD,
        _gear_cuts_vec,
    )

    def fold_ref(t):
        h = 0
        cuts = []
        n = len(t)
        for p, ch in enumerate(t, 1):
            h = (2 * h + _GEAR[ord(ch) % 256]) & _GEAR_MOD
            if (h & _GEAR_MASK) == 0 and p < n:
                cuts.append(p)
        return cuts

    rng = np.random.default_rng(3)
    cases = [
        "",
        "a",
        "ab",
        "x" * 3000,
        "".join(chr(int(c)) for c in rng.integers(32, 1200, 500)),
    ]
    for _ in range(60):
        ln = int(rng.integers(0, 400))
        cases.append(
            "".join(chr(int(c)) for c in rng.integers(32, 127, ln))
        )
    got = _gear_cuts_vec(cases)
    for t, g in zip(cases, got):
        assert list(g) == fold_ref(t), t[:40]


# ---------------------------------------------------------------------------
# Vectorized md5-window cuts (optimization r17)
# ---------------------------------------------------------------------------


def test_md5_vectorized_equals_scalar_reference():
    """The numpy single-block-MD5 cuts (_md5_cuts_vec) must equal the
    hashlib-per-position reference (_md5_cuts_scalar) — which itself
    mirrors the JVM HOF rule pinned above — on directed edges (empty,
    sub-window, exact-window, window+1) and random texts, including
    the non-ASCII fallback dispatch."""
    import random

    import pandas as pd

    from reindexer_spark.operators.dedup import (
        _md5_cuts_scalar,
        _md5_cuts_vec,
    )

    rng = random.Random(20260818)
    cases = ["", "a" * (CDC_W - 1), "b" * CDC_W, "c" * (CDC_W + 1)]
    cases += [
        "".join(rng.choice("abcdef ghij.") for _ in range(rng.randrange(0, 500)))
        for _ in range(200)
    ]
    cases += ["κόσμος αβγδε " * 30, "ascii head " * 10 + "日本語" * 20]
    got = _md5_cuts_vec(pd.Series(cases))
    for t, v in zip(cases, got):
        assert list(v) == _md5_cuts_scalar(t), repr(t[:40])


def test_md5_d16_vec_matches_hashlib():
    """The vectorized MD5 kernel's d register must equal hashlib's
    digest bytes 12..16 on random 16-byte messages."""
    import hashlib
    import random

    import numpy as np

    from reindexer_spark.operators.dedup import _md5_d16_vec

    rng = random.Random(7)
    msgs = [bytes(rng.randrange(256) for _ in range(16)) for _ in range(256)]
    m = np.ascontiguousarray(
        np.frombuffer(b"".join(msgs), dtype=np.uint8).reshape(-1, 16)
    )
    d = _md5_d16_vec(m)
    for i, msg in enumerate(msgs):
        ref = int.from_bytes(hashlib.md5(msg).digest()[12:16], "little")
        assert int(d[i]) == ref
