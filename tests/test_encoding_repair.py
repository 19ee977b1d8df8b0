"""Adversarial edge cases for the encoding-repair family — strings the
oracle fixtures never produce.  The repair guard's whole job is to NEVER
rewrite text it cannot prove corrupted; these pin that contract on the
inputs that historically break mojibake fixers (lone lead bytes, clean
smart quotes, non-Latin scripts, already-repaired text)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _fix_one(spark, fix, s: str) -> str:
    df = spark.createDataFrame([(s,)], "x string").select(
        fix(F.col("x")).alias("y")
    )
    return df.collect()[0].y


@pytest.fixture(scope="module")
def latin1_fix():
    from reindexer_spark.operators.text_clean import encoding_fix

    return encoding_fix


@pytest.fixture(scope="module")
def cp1252_fix():
    from reindexer_spark.operators.text_clean import encoding_fix_cp1252

    return encoding_fix_cp1252


def test_latin1_single_and_double_repair(spark, latin1_fix):
    clean = "café crème"
    single = clean.encode("utf-8").decode("latin-1")
    double = single.encode("utf-8").decode("latin-1")
    assert _fix_one(spark, latin1_fix, single) == clean
    # one fix round undoes exactly one corruption round
    assert _fix_one(spark, latin1_fix, double) == single


@pytest.mark.parametrize(
    "untouchable",
    [
        "plain ascii only",
        "café already clean",  # clean accented text
        "ends with a lone lead Ã",  # Ã with nothing after
        "lone continuation © char",  # © not preceded by a lead
        "Ã! lead before ascii",  # Ã then invalid continuation
        "mixed 中文 and ascii",  # CJK: not Latin-1-page, guard (a)
        "",
    ],
)
def test_latin1_fix_never_rewrites_unprovable(spark, latin1_fix, untouchable):
    assert _fix_one(spark, latin1_fix, untouchable) == untouchable


def test_latin1_fix_is_noop_on_its_own_output(spark, latin1_fix):
    clean = "résumé"
    moji = clean.encode("utf-8").decode("latin-1")
    repaired = _fix_one(spark, latin1_fix, moji)
    assert repaired == clean
    assert _fix_one(spark, latin1_fix, repaired) == repaired


def test_cp1252_repairs_real_corruption_classes(spark, cp1252_fix):
    # the classes CP1252 actually mangles: smart quotes, em dash, euro,
    # trademark — every corrupted form contains codepoints > 0xFF that
    # the plain Latin-1 fix cannot even see
    # (no right-double-quote case: U+201D's UTF-8 form contains byte
    # 0x9D, undefined in strict CP1252 — a strict mis-decoder would have
    # errored rather than produced mojibake, so there is nothing to
    # repair; lenient decoders that map 0x9D→U+009D are out of scope)
    for clean in (
        "it’s fine",
        "a — dash",
        "price €9",
        "brand™ name",
        "“left quoted text",
    ):
        corrupted = clean.encode("utf-8").decode("windows-1252")
        assert corrupted != clean
        assert _fix_one(spark, cp1252_fix, corrupted) == clean


@pytest.mark.parametrize(
    "untouchable",
    [
        "it’s already clean",  # real smart quote stays
        "— clean em dash —",
        "price €9 unharmed",
        "plain ascii",
        "mixed 中文 smart ’ text",  # CJK + specials
    ],
)
def test_cp1252_fix_never_rewrites_clean_text(spark, cp1252_fix, untouchable):
    assert _fix_one(spark, cp1252_fix, untouchable) == untouchable


def test_cp1252_fix_handles_latin1_class_too(spark, cp1252_fix):
    # utf8-as-cp1252 and utf8-as-latin1 agree outside 0x80-0x9F, so the
    # cp1252 fix also repairs plain Latin-1 accent mojibake
    clean = "café"
    assert (
        _fix_one(spark, cp1252_fix, clean.encode("utf-8").decode("latin-1"))
        == clean
    )


# ---- property tests: the roundtrip invariant over the full domain ----


def _fix_many(spark, fix, strings):
    df = spark.createDataFrame([(s,) for s in strings], "x string").select(
        "x", fix(F.col("x")).alias("y")
    )
    return {r.x: r.y for r in df.collect()}


def test_latin1_roundtrip_property(spark, latin1_fix):
    """fix(corrupt(s)) == s for EVERY Latin-1 string s: the corruption
    (UTF-8 bytes re-read as Latin-1) always yields a Latin-1-page,
    signature-bearing, valid-UTF-8-re-encodable string, so the guard
    provably fires and inverts it.  Hypothesis drives the whole
    printable Latin-1 page incl. the C1 controls the fixtures avoid."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    latin1 = st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0xFF),
        max_size=40,
    )

    @settings(max_examples=6, deadline=None)
    @given(st.lists(latin1, min_size=1, max_size=25, unique=True))
    def run(strings):
        corrupted = {s.encode("utf-8").decode("latin-1"): s for s in strings}
        out = _fix_many(spark, latin1_fix, list(corrupted))
        for c, s in corrupted.items():
            assert out[c] == s, (c, s)

    run()


def test_cp1252_roundtrip_property(spark, cp1252_fix):
    """Same invariant for the CP1252 fix, over Latin-1 text PLUS the 27
    CP1252-specific characters.  Strings whose UTF-8 form contains one
    of CP1252's five undefined bytes (0x81/0x8D/0x8F/0x90/0x9D) cannot
    be mis-decoded by a strict decoder at all and are skipped — there
    is no corrupted form to repair."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from reindexer_spark.operators.text_clean import CP1252_SRC

    domain = st.text(
        alphabet=st.sampled_from(
            [chr(c) for c in range(0x20, 0x100)] + list(CP1252_SRC)
        ),
        max_size=40,
    )

    @settings(max_examples=6, deadline=None)
    @given(st.lists(domain, min_size=1, max_size=25, unique=True))
    def run(strings):
        corrupted = {}
        for s in strings:
            try:
                corrupted[s.encode("utf-8").decode("windows-1252")] = s
            except UnicodeDecodeError:
                continue  # hits an undefined CP1252 byte: unrepresentable
        if not corrupted:
            return
        out = _fix_many(spark, cp1252_fix, list(corrupted))
        for c, s in corrupted.items():
            assert out[c] == s, (c, s)

    run()


def test_ascii_is_always_a_noop_property(spark, latin1_fix, cp1252_fix):
    """Pure-ASCII text can never carry a mojibake signature, so both
    fixes must be identity on all of it."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ascii_text = st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        max_size=60,
    )

    @settings(max_examples=4, deadline=None)
    @given(st.lists(ascii_text, min_size=1, max_size=25, unique=True))
    def run(strings):
        for fix in (latin1_fix, cp1252_fix):
            out = _fix_many(spark, fix, strings)
            for s in strings:
                assert out[s] == s

    run()
