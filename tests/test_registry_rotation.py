"""Correctness-gate ordering: family interleave + rotation by prior
driver coverage (round-2 VERDICT structural fix: a fixed ~50-query gate
budget over a static order re-checks the same prefix forever)."""

from __future__ import annotations

import json

from reindexer_spark.registry import _driver_checked, gate_order

NAMES = [
    "agg_a", "agg_b", "agg_c",
    "join_a", "join_b",
    "text_a", "text_b",
    "window_a",
]


def _write_correctness(path, rows: dict) -> None:
    path.write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}
RED = {"rows_match": True, "schema_match": True, "hash_match": False,
       "spark_rows": 1, "oracle_rows": 1, "err": None}
ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 3, "oracle_rows": None, "err": "no_oracle"}


def test_interleave_spans_families_without_prior_results(tmp_path):
    order = gate_order(NAMES, root=tmp_path)  # no CORRECTNESS files
    assert sorted(order) == sorted(NAMES)
    # any prefix of size = #families touches every family once
    first = [n.split("_", 1)[0] for n in order[:4]]
    assert sorted(first) == ["agg", "join", "text", "window"]


def test_green_checked_queries_rotate_to_the_back(tmp_path):
    _write_correctness(
        tmp_path / "CORRECTNESS_r01.json",
        {"agg_a": GREEN, "join_a": GREEN, "text_a": GREEN, "window_a": GREEN},
    )
    order = gate_order(NAMES, root=tmp_path)
    fresh, done = order[:4], order[4:]
    assert sorted(fresh) == ["agg_b", "agg_c", "join_b", "text_b"]
    assert sorted(done) == ["agg_a", "join_a", "text_a", "window_a"]
    # both groups stay family-interleaved internally
    assert [n.split("_")[0] for n in fresh[:3]] == ["agg", "join", "text"]


def test_red_rows_stay_in_the_priority_group(tmp_path):
    _write_correctness(
        tmp_path / "CORRECTNESS_r01.json", {"agg_a": GREEN, "agg_b": RED}
    )
    checked = _driver_checked(tmp_path)
    assert "agg_a" in checked
    assert "agg_b" not in checked  # failed → must be re-verified first


def test_rows_only_counts_only_while_query_has_no_oracle(tmp_path):
    # rows-only rows for names not in the registry (or registered without
    # an oracle) count as checked; a registered query WITH an oracle that
    # only ever had a rows-only row does not (it was upgraded and needs a
    # fresh value-checked driver row).
    _write_correctness(
        tmp_path / "CORRECTNESS_r01.json",
        {"not_in_registry": ROWS_ONLY, "agg_approx_sketches": ROWS_ONLY},
    )
    import reindexer_spark.operators  # noqa: F401 — populate the registry

    checked = _driver_checked(tmp_path)
    assert "not_in_registry" in checked
    # agg_approx_sketches gained an oracle in round 3 → unchecked again
    assert "agg_approx_sketches" not in checked


def test_coverage_accumulates_across_rounds(tmp_path):
    _write_correctness(tmp_path / "CORRECTNESS_r01.json", {"agg_a": GREEN})
    _write_correctness(tmp_path / "CORRECTNESS_r02.json", {"join_a": GREEN})
    order = gate_order(NAMES, root=tmp_path)
    assert set(order[-2:]) == {"agg_a", "join_a"}


def test_unreadable_files_degrade_to_unchecked(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    assert _driver_checked(tmp_path) == set()
    assert sorted(gate_order(NAMES, root=tmp_path)) == sorted(NAMES)
