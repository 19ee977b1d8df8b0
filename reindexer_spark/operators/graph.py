"""Iterative graph computation expressed Spark-first: PageRank over the
nation-level trade graph (customer nation → supplier nation, weighted by
lineitem count).

The scale design is aggregate-first: the four-table join collapses the
fact data to a |nations|² edge relation BEFORE any iteration, so the
iterative phase — the part frameworks usually reach for GraphX/Pregel
for — runs on a relation of a few hundred rows regardless of corpus
size.  Iterations are unrolled into the logical plan (a driver-side loop
building DataFrames, no collect/feedback), which keeps the whole
computation one Catalyst-optimized job and makes it expressible as a
chained-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reindexer_spark.cache import track
from reindexer_spark.catalog import load_table
from reindexer_spark.registry import query

DAMPING = 0.85
N_ITER = 3

_EDGES_SQL = """
    edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             COUNT(*) AS w
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ), outw AS (
      SELECT src, SUM(w) AS total_w FROM edges GROUP BY src
    ), ratio AS (
      SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.total_w AS r
      FROM edges e JOIN outw o USING (src)
    ), nodes AS (
      SELECT DISTINCT n FROM (
        SELECT src AS n FROM edges UNION SELECT dst FROM edges
      )
    ), nn AS (SELECT COUNT(*) AS n_nodes FROM nodes)
"""


def _pr_iter_sql(i: int) -> str:
    prev = "pr0" if i == 1 else f"pr{i - 1}"
    return f"""
    pr{i} AS (
      SELECT nd.n,
             (1 - {DAMPING}) / nn.n_nodes
               + {DAMPING} * COALESCE(CAST(SUM(
                   CAST(p.pr * r.r AS DECIMAL(28,15))
                 ) AS DOUBLE), 0.0) AS pr
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN ratio r ON r.dst = nd.n
      LEFT JOIN {prev} p ON p.n = r.src
      GROUP BY nd.n, nn.n_nodes
    )"""


@query(
    "graph_nation_pagerank",
    oracle=f"""
    WITH {_EDGES_SQL},
    pr0 AS (
      SELECT n, 1.0 / (SELECT n_nodes FROM nn) AS pr FROM nodes
    ),
    {",".join(_pr_iter_sql(i) for i in range(1, N_ITER + 1))}
    SELECT na.n_name, ROUND(p.pr, 9) AS pagerank
    FROM pr{N_ITER} p JOIN nation na ON na.n_nationkey = p.n
    """,
)
def graph_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{N_ITER}-iteration weighted PageRank over the nation trade graph.

    Heavy phase: one aggregation of lineitem⋈orders⋈customer⋈supplier
    down to the edge matrix (dimension joins broadcast; the fact table
    shuffles once on the grouping key).  Iterative phase: plan-unrolled
    relational PageRank on the tiny edge set.  Per-target contributions
    are summed as DECIMAL so the result is independent of partitioning
    and join order — terms are identical doubles on both engines, and
    the decimal sum removes the float-reduction-order sensitivity.
    """
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    edges = track(
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy(
            c.c_nationkey.alias("src"), s.s_nationkey.alias("dst")
        )
        .agg(F.count("*").alias("w"))
        # materialized once: every unrolled iteration re-references this
        # subtree, and without the persist each one would re-run the
        # whole fact-table aggregation (|iterations|+2 lineitem scans).
        # Coalesced to one partition first — the edge matrix is
        # |nations|² rows, and iterating over 32 near-empty partitions
        # costs more in task launches than the data itself.
        .coalesce(1)
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("total_w"))
    ratio = track(
        edges.join(outw, "src").select(
            "src", "dst",
            (F.col("w").cast("double") / F.col("total_w")).alias("r"),
        )
    )
    nodes = track(
        edges.select(F.col("src").alias("n"))
        .union(edges.select(F.col("dst").alias("n")))
        .distinct()
    )
    n_nodes = nodes.count()  # tiny, intentional (the one driver-side scalar)
    # run-unique view names (ADVICE r16): spark.sql resolves views at
    # analysis time, so a fixed name is safe serially but would
    # cross-wire two concurrent invocations in one session; the views
    # are dropped right after the plan is built below
    import uuid as _uuid

    _sfx = _uuid.uuid4().hex[:8]
    vratio, vnodes = f"__pr_ratio_{_sfx}", f"__pr_nodes_{_sfx}"
    ratio.createOrReplaceTempView(vratio)
    nodes.createOrReplaceTempView(vnodes)

    # The iterative phase as ONE chained-CTE SQL text over the two
    # cached tiny relations (optimization r16): the old per-iteration
    # DataFrame loop re-built the join/agg expression forest through
    # Py4J each call (~0.7 s of driver time for a 625-row relation) and
    # every iteration re-derived nodes from the edge cache.  Expression
    # structure is op-for-op the old one — pr·r cast DECIMAL(28,15),
    # decimal SUM (reduction-order-free), CAST AS DOUBLE, the same
    # base/damping binary64 literals (repr round-trips exactly) — so
    # the trajectory is bit-identical; only the plan authoring changed.
    base = (1 - DAMPING) / n_nodes
    parts = [
        f"WITH pr0 AS (SELECT n, CAST('{1.0 / n_nodes!r}' AS DOUBLE) AS pr"
        f" FROM {vnodes})"
    ]
    for i in range(1, N_ITER + 1):
        parts.append(f"""
        , c{i} AS (
          SELECT r.dst AS n, CAST(p.pr * r.r AS DECIMAL(28,15)) AS term
          FROM {vratio} r JOIN pr{i - 1} p ON r.src = p.n
        ), s{i} AS (
          SELECT n, CAST(SUM(term) AS DOUBLE) AS s FROM c{i} GROUP BY n
        ), pr{i} AS (
          SELECT nd.n,
                 CAST('{base!r}' AS DOUBLE)
                   + CAST('{DAMPING!r}' AS DOUBLE) * COALESCE(s.s, 0.0D) AS pr
          FROM {vnodes} nd LEFT JOIN s{i} s ON s.n = nd.n
        )""")
    parts.append(f"SELECT n, pr FROM pr{N_ITER}")
    pr = spark.sql("".join(parts))
    # analyzed — the resolved plan no longer needs the names
    spark.catalog.dropTempView(vratio)
    spark.catalog.dropTempView(vnodes)
    return pr.join(F.broadcast(n), pr.n == n.n_nationkey).select(
        "n_name", F.round("pr", 9).alias("pagerank")
    )


LP_ITER = 3

_LP_EDGES_SQL = """
    raw AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ), und AS (
      SELECT node, nbr, SUM(w) AS w FROM (
        SELECT src AS node, dst AS nbr, w FROM raw
        UNION ALL SELECT dst AS node, src AS nbr, w FROM raw
      ) GROUP BY 1, 2
    ), stats AS (SELECT AVG(w) AS avg_w FROM und),
    edges AS (
      SELECT node, nbr, w FROM und CROSS JOIN stats
      WHERE w > 1.5 * avg_w
    ), l0 AS (
      SELECT DISTINCT node AS n, node AS label FROM edges
    )
"""


def _lp_iter_sql(i: int) -> str:
    prev = f"l{i - 1}"
    return f"""
    v{i} AS (
      SELECT e.node AS n, p.label, SUM(e.w) AS wt
      FROM edges e JOIN {prev} p ON p.n = e.nbr
      GROUP BY 1, 2
    ), l{i} AS (
      SELECT n, label FROM (
        SELECT n, label,
               ROW_NUMBER() OVER (
                 PARTITION BY n ORDER BY wt DESC, label ASC
               ) AS rk
        FROM v{i}
      ) WHERE rk = 1
    )"""


@query(
    "graph_label_propagation",
    oracle="WITH "
    + _LP_EDGES_SQL
    + ","
    + ",".join(_lp_iter_sql(i) for i in range(1, LP_ITER + 1))
    + f"""
    SELECT nt.n_name, l.label AS community,
           COUNT(*) OVER (PARTITION BY l.label) AS community_size
    FROM l{LP_ITER} l JOIN nation nt ON nt.n_nationkey = l.n
    ORDER BY nt.n_name
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    undirected nation trade graph — {LP_ITER} unrolled iterations,
    each node adopting the label with the highest incident edge
    weight (ties broken toward the smaller label, making the whole
    iterative algorithm value-exact across engines — the reason LP
    implementations are usually non-deterministic is unordered tie
    breaks, not the math).  Edges first sparsify by a relative
    threshold (> 1.5× mean weight — scale-adaptive, the standard
    cleaning step before community detection); a uniform-random trade
    graph is near-complete, so even sparsified it yields only coarse
    structure — the gate's value here is exactness of the iterative
    machinery, not the synthetic graph's sociology.

    Same aggregate-first scale design as graph_nation_pagerank: the
    fact tables collapse to a |nations|²-bounded weighted edge
    relation BEFORE any iteration, so the LP loop — the part that
    looks like it needs GraphX/Pregel — runs on a few hundred rows
    regardless of corpus size, unrolled into one Catalyst plan with
    no driver feedback.  At 100 TB the same unrolling works on any
    aggregated entity graph (domains, authors, repos); for
    billion-node graphs the iteration becomes a join-per-step job
    with the label relation checkpointed — the edge build is the
    corpus-sized part either way."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    und = (
        raw.select(F.col("src").alias("node"), F.col("dst").alias("nbr"), "w")
        .unionAll(
            raw.select(
                F.col("dst").alias("node"), F.col("src").alias("nbr"), "w"
            )
        )
        .groupBy("node", "nbr")
        .agg(F.sum("w").alias("w"))
    )
    # relative-threshold sparsification: keep edges above 1.5x the mean
    # weight — the standard graph-cleaning step before community
    # detection (scale-adaptive, unlike an absolute cutoff), and what
    # gives a near-complete random trade graph any structure at all
    stats = und.agg(F.avg("w").alias("avg_w"))
    edges = track(
        und.crossJoin(F.broadcast(stats)).filter(
            F.col("w") > 1.5 * F.col("avg_w")
        ).select("node", "nbr", "w")
    )
    labels = edges.select(F.col("node").alias("n")).distinct().select(
        "n", F.col("n").alias("label")
    )
    from pyspark.sql import Window

    for _ in range(LP_ITER):
        votes = (
            edges.join(labels, edges.nbr == labels.n)
            .groupBy(F.col("node").alias("vn"), "label")
            .agg(F.sum("w").alias("wt"))
        )
        rk = Window.partitionBy("vn").orderBy(
            F.desc("wt"), F.asc("label")
        )
        labels = (
            votes.withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") == 1)
            .select(F.col("vn").alias("n"), "label")
        )
    sized = labels.withColumn(
        "community_size",
        F.count("*").over(Window.partitionBy("label")),
    )
    return (
        sized.join(F.broadcast(n), sized.n == n.n_nationkey)
        .select(
            "n_name",
            F.col("label").alias("community"),
            "community_size",
        )
        .orderBy("n_name")
    )
