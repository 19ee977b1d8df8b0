"""Registry-WIDE plan lint: the anti-pattern sweep run as CI.

Every batch query's optimized physical plan is checked for the two
unambiguous scale-killers:

- ``CartesianProduct`` — the O(n*m) shape that cannot survive a 100 TB
  join; allowed only where it is the documented point of the query.
- ``BatchEvalPython`` — Spark's row-at-a-time (non-Arrow) Python UDF
  node; the package's contract is pandas/Arrow-only Python
  (ArrowEvalPython, FlatMapGroupsInPandas*, MapInPandas are the
  sanctioned nodes), so a stray @udf slipping into any of the 200+
  queries fails here instead of surfacing as a 10x regression on a
  cluster.

Streaming lanes are excluded (their fn() executes a live stream rather
than returning an unexecuted plan); the per-lane plan properties they
need are asserted in test_plans/test_streaming instead.
"""

from __future__ import annotations

import pytest

from reindexer_spark.registry import all_queries, get_query

# Cartesian products that ARE the documented semantics:
CARTESIAN_OK = {
    "join_cross",  # the intentional cross-join operator (plan-asserted
    #                elsewhere to at least be broadcast-nested-loop)
    "dedup_embedding",  # bounded exact-quadratic validation baseline
}

BATCH_QUERIES = sorted(
    n for n in all_queries() if not n.endswith("_live")
)


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_plan_has_no_scale_killers(spark, sf_dir, name):
    df = get_query(name).fn(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF (non-Arrow) in plan"
    )
