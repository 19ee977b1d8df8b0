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
