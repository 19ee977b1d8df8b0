"""Unit tests for the partitioned JDBC source plan construction.

No database exists in the test environment (SURVEY §1.1); these tests
pin the *SQL text* Spark would push down — the two latent production
bugs the round-4 audit found live entirely in that text:

1. ``abs(hashtext(id))`` overflows for the id whose int4 hash is exactly
   -2^31 ("integer out of range" kills the whole read) — must be the
   bigint mask instead.
2. A naive ``rindex("ORDER BY")`` strip truncates queries *ending in* a
   parenthesized subquery containing ORDER BY into invalid SQL.
"""

from __future__ import annotations

import json

import pytest

from reindexer_spark.docpipe.config import ReindexConfig
from reindexer_spark.sources.jdbc import (
    jdbc_reader_options,
    strip_toplevel_trailing_order_by,
)


def conf_with_query(tmp_path, query: str) -> ReindexConfig:
    p = tmp_path / "config.json"
    p.write_text(
        json.dumps({"password": "x", "solrUrl": "http://s/solr/c", "query": query})
    )
    return ReindexConfig.load(str(p))


# ---------- partition column expression (INT_MIN hash landmine) ----------

def test_partition_expr_uses_bigint_mask_not_abs(tmp_path):
    conf = conf_with_query(tmp_path, "SELECT id, content FROM documents")
    opts = jdbc_reader_options(conf)
    assert "abs(" not in opts["dbtable"].lower()
    assert "(hashtext(q.id)::bigint & 2147483647)" in opts["dbtable"]
    # Bounds cover the masked range exactly.
    assert int(opts["lowerBound"]) == 0
    assert int(opts["upperBound"]) == 1 << 31


@pytest.mark.parametrize(
    "dialect,part_expr",
    [
        # Postgres (production default): hashtext int4 → bigint mask.
        ("postgres", None),
        # Derby (the live-test stand-in): numeric suffix of the id.
        ("derby", "CAST(SUBSTR(q.id, 3) AS INT)"),
    ],
)
def test_emitted_partition_sql_exact_per_dialect(tmp_path, dialect, part_expr):
    """Round-8 VERDICT next #7: the hashtext branch can't run against a
    real Postgres here, but its SQL GENERATION can be pinned exactly —
    a dialect regression (quoting, alias, wrapping shape) fails this
    test instead of hiding behind the missing server."""
    conf = conf_with_query(
        tmp_path, "SELECT id, content FROM documents ORDER BY id"
    )
    kwargs = {} if part_expr is None else {"partition_expr": part_expr}
    opts = jdbc_reader_options(conf, **kwargs)
    expr = (
        "(hashtext(q.id)::bigint & 2147483647)"
        if dialect == "postgres"
        else part_expr
    )
    # the ORDER BY is stripped, the user query wrapped once, the
    # partition expression aliased to the declared partitionColumn
    assert opts["dbtable"] == (
        f"(SELECT q.*, {expr} AS doc_seq "
        "FROM (SELECT id, content FROM documents) q) AS partitioned_src"
    )
    assert opts["partitionColumn"] == "doc_seq"
    assert (int(opts["lowerBound"]), int(opts["upperBound"])) == (0, 1 << 31)
    assert opts["pushDownPredicate"] == "true"
    assert int(opts["fetchsize"]) == 10_000  # pg driver's whole-result trap


def test_bigint_mask_semantics_on_int_min():
    # The expression semantics the SQL relies on: masking INT_MIN in
    # 64-bit space is in-range where abs() raises.
    int_min = -(1 << 31)
    assert int_min & 2147483647 == 0  # in [0, 2^31), no overflow
    for h in (int_min, -1, 0, 1, (1 << 31) - 1):
        assert 0 <= (h & 2147483647) < (1 << 31)


# ---------- ORDER BY strip (paren-depth aware) ----------

@pytest.mark.parametrize(
    "query,expected",
    [
        # Plain trailing top-level sort: stripped (the reference's own
        # query shape, config.go:78 + driver.go:172).
        ("SELECT id FROM t ORDER BY id", "SELECT id FROM t"),
        ("SELECT id FROM t order by id asc, txn desc", "SELECT id FROM t"),
        # Query ENDING in a subquery containing ORDER BY: left intact —
        # rindex-based stripping truncated this mid-expression.
        (
            "SELECT * FROM (SELECT id FROM t ORDER BY x LIMIT 5) s",
            "SELECT * FROM (SELECT id FROM t ORDER BY x LIMIT 5) s",
        ),
        # Window ORDER BY inside OVER(...): intact.
        (
            "SELECT id, row_number() OVER (ORDER BY id) rn FROM t",
            "SELECT id, row_number() OVER (ORDER BY id) rn FROM t",
        ),
        # Top-level ORDER BY *after* a subquery sort: only the top-level
        # one goes.
        (
            "SELECT * FROM (SELECT id FROM t ORDER BY x LIMIT 5) s ORDER BY id",
            "SELECT * FROM (SELECT id FROM t ORDER BY x LIMIT 5) s",
        ),
        # ORDER BY under a top-level LIMIT: semantics-bearing, left alone.
        (
            "SELECT id FROM t ORDER BY id LIMIT 10",
            "SELECT id FROM t ORDER BY id LIMIT 10",
        ),
        # 'ORDER BY' inside a string literal: not a clause.
        (
            "SELECT id FROM t WHERE note = 'use ORDER BY here'",
            "SELECT id FROM t WHERE note = 'use ORDER BY here'",
        ),
        # Identifier containing the letters: word boundary respected.
        (
            "SELECT reorder_by FROM t",
            "SELECT reorder_by FROM t",
        ),
        # No ORDER BY at all: untouched.
        ("SELECT id FROM t WHERE NOT deleted", "SELECT id FROM t WHERE NOT deleted"),
    ],
)
def test_strip_toplevel_trailing_order_by(query, expected):
    assert strip_toplevel_trailing_order_by(query) == expected


def test_wrapped_query_keeps_subquery_sort_valid(tmp_path):
    q = "SELECT id, content FROM (SELECT * FROM docs ORDER BY id LIMIT 100) s"
    conf = conf_with_query(tmp_path, q)
    opts = jdbc_reader_options(conf)
    # The full subquery survives inside the wrapper; balanced parens.
    assert "ORDER BY id LIMIT 100" in opts["dbtable"]
    assert opts["dbtable"].count("(") == opts["dbtable"].count(")")


# ---------- property-based: the stripper never corrupts a query ----------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    sql_fragments = st.lists(
        st.sampled_from(
            [
                "SELECT id FROM t",
                " WHERE a = 'x ORDER BY y'",
                " ORDER BY id",
                " order by a, b DESC",
                " (SELECT 1 ORDER BY 2 LIMIT 3)",
                " LIMIT 5",
                " OFFSET 2",
                ' "ORDER BY"',
                " JOIN u ON t.a = u.a",
                " (",
                " )",
                " reorder_by",
                "''",
            ]
        ),
        min_size=1,
        max_size=8,
    ).map("".join)

    @settings(max_examples=300, deadline=None)
    @given(sql_fragments)
    def test_strip_is_prefix_and_preserves_balance(q):
        """For ANY input: the output is a prefix of the input (the
        stripper only ever removes a trailing clause), and if the input
        had balanced parens outside quotes, so does the output — the
        round-4 rindex bug violated both."""
        from reindexer_spark.sources.jdbc import (
            strip_toplevel_trailing_order_by as strip,
        )

        out = strip(q)
        assert q.startswith(out)
        removed = q[len(out):]
        # whatever was removed starts with ORDER (modulo whitespace)
        if removed:
            assert removed.lstrip()[:5].upper() == "ORDER"

        def balance(s: str) -> int | None:
            depth, quote = 0, None
            for ch in s:
                if quote:
                    if ch == quote:
                        quote = None
                elif ch in ("'", '"'):
                    quote = ch
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
            return depth if quote is None else None

        if balance(q) == 0:
            assert balance(out) == 0

    @settings(max_examples=200, deadline=None)
    @given(sql_fragments)
    def test_strip_is_idempotent(q):
        from reindexer_spark.sources.jdbc import (
            strip_toplevel_trailing_order_by as strip,
        )

        assert strip(strip(q)) == strip(q)
