"""Scale-pattern joins: the three join shapes that decide whether a plan
survives a 100 TB fact table, each expressed so the *result* stays
oracle-checkable while the *plan* demonstrates the technique.

The reference delegates every join to PostgreSQL through its user SQL
(/root/reference/config/config.go:20); at Spark scale the interesting
part is not join semantics but join *strategy*:

- **Bloom-filter runtime pruning** (`join_bloom_prune`) — the pattern
  behind Spark's own ``spark.sql.optimizer.runtime.bloomFilter.enabled``:
  build a compact membership sketch from the selective dimension side,
  push it into the fact scan as a cheap pre-filter, and let the real join
  remove the false positives.  At 100 TB this turns "shuffle every fact
  row" into "shuffle the ~selectivity fraction that can possibly match";
  the final broadcast join makes the output *exactly* the plain join, so
  the query is value-checked, not rows-only.
- **Salting** (`join_skew_salted`) — the standard fix for a hot key: the
  fact side gets a deterministic salt in [0, S), the dimension side is
  exploded ×S, and the join key becomes (key, salt) so one hot key's rows
  spread across S reducers instead of one straggler.  Semantically a
  no-op (every fact row still meets its dimension row exactly once), so
  the oracle is the plain join.
- **MERGE upsert** (`merge_upsert`) — the batch-ELT MERGE INTO shape
  (update matched, keep unmatched targets, insert unmatched sources)
  as a single full-outer join + conditional projection: one shuffle,
  no driver loop, and the three-way branch is pure column logic.

Plus `graph_triangle_count`: triangle enumeration on the brand
co-occurrence graph — the classic "join explosion you must bound"
exercise.  The edge relation is support-thresholded and canonically
ordered (a < b < c) so each triangle is produced exactly once and the
two self-joins stay on a dimension-sized relation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reindexer_spark.cache import track
from reindexer_spark.catalog import load_table
from reindexer_spark.functions import dec, dsum
from reindexer_spark.registry import query

# Bloom parameters: sized for dimension-side key sets (the selective side
# of a fact-dim join).  BITS_PER_KEY=16 with K=7 hashes → ~0.2% false
# positives, which only costs a few spurious rows into the verifying
# join, never wrong output.
_BLOOM_BITS_PER_KEY = 16
_BLOOM_K = 7
_C1 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio multiplier
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)  # xxhash64 prime
_F1 = np.uint64(0xBF58476D1CE4E5B9)  # splitmix64 finalizer constants
_F2 = np.uint64(0x94D049BB133111EB)


def _mix64(k: np.ndarray) -> np.ndarray:
    """splitmix64 avalanche: every output bit depends on every input
    bit.  A bare multiplicative hash concentrates its entropy in the
    HIGH bits, while the bloom slot index below keeps the LOW bits
    (``& (m-1)``) — without this mix the slot index is a linear
    permutation of ``k mod m`` and the false-positive rate lands ~1000x
    above theory (measured 3.8% vs 0.004% at 26 bits/key)."""
    k = k ^ (k >> np.uint64(30))
    k *= _F1
    k = k ^ (k >> np.uint64(27))
    k *= _F2
    return k ^ (k >> np.uint64(31))


def _bloom_build(keys: np.ndarray) -> tuple[np.ndarray, int]:
    """Build a bitset bloom filter over int64 keys (double hashing)."""
    m = 1 << max(10, int(np.ceil(np.log2(max(1, len(keys)) * _BLOOM_BITS_PER_KEY))))
    bits = np.zeros(m, dtype=bool)
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = _mix64(k * _C1)
        h2 = _mix64(k * _C2) | np.uint64(1)
        for i in range(_BLOOM_K):
            bits[(h1 + np.uint64(i) * h2) & np.uint64(m - 1)] = True
    return bits, m


def _bloom_maybe(bits: np.ndarray, m: int, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: True → possibly present."""
    k = keys.astype(np.uint64)
    out = np.ones(len(k), dtype=bool)
    with np.errstate(over="ignore"):
        h1 = _mix64(k * _C1)
        h2 = _mix64(k * _C2) | np.uint64(1)
        for i in range(_BLOOM_K):
            out &= bits[(h1 + np.uint64(i) * h2) & np.uint64(m - 1)]
    return out


@query(
    "join_bloom_prune",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned fact-dim join: BUILDING-segment customer spend.

    Plan at scale: the dimension side (segment-filtered customers) is
    collected once — it is dimension-sized by construction, the same
    driver-side bound the authority snapshot loader uses — and packed
    into a ~16-bits/key bloom bitset broadcast to every executor.  An
    Arrow-vectorized pandas_udf probes the bitset over the fact scan, so
    ~(1 - selectivity) of the 100 TB fact table is dropped BEFORE the
    join shuffle/broadcast; the subsequent broadcast hash join removes
    bloom false positives, making the result bit-identical to the plain
    join the oracle runs.  This is Spark's runtime row-group filter
    pattern, made explicit and testable.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    keys = np.array([r[0] for r in cust.select("c_custkey").collect()], dtype=np.int64)
    bits, m = _bloom_build(keys)
    bc = spark.sparkContext.broadcast((np.packbits(bits), m))

    # Unpack the bitset once per deserialized UDF instance, not per
    # Arrow batch: np.unpackbits over the whole filter is O(m) and a
    # ~10k-row batch would repeat it thousands of times per partition.
    # The closure cell is per-task state on the worker, so no keying is
    # needed — a different bloom filter is a different closure.
    _unpacked: list = []

    def probe(s: pd.Series) -> pd.Series:
        if not _unpacked:
            packed, m_ = bc.value
            _unpacked.append((np.unpackbits(packed).astype(bool), m_))
        bitset, m_ = _unpacked[0]
        return pd.Series(_bloom_maybe(bitset, m_, s.to_numpy(dtype=np.int64)))

    maybe_member = F.pandas_udf(probe, "boolean")
    orders = load_table(spark, sf_dir, "orders").filter(maybe_member("o_custkey"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("order_cnt"),
            dsum(dec("o_totalprice"), "total_spend"),
        )
    )


_NSALT = 8


@query(
    "join_skew_salted",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join: per-nation order revenue, skew-proofed.

    The fact side tags each row with ``salt = xxhash64(unique key) mod S``
    and the dimension side explodes ×S, so the shuffle key is
    (custkey, salt): a hot customer's rows land on S reducers instead of
    one.  Every fact row still matches exactly one exploded dimension row,
    so the result equals the plain join (the oracle).  The salt is
    computed from ``o_orderkey`` — deterministic, uniform, and free (no
    rand(), which would break retry idempotence at scale: a re-executed
    task must salt identically or AQE retries double-count).
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(_NSALT)).cast("int")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(_NSALT - 1)))
        )
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("order_cnt"),
            dsum(dec("o_totalprice"), "total_revenue"),
        )
    )


# scalejoin_salted hot-key threshold: a key carrying >= 3/2 the mean
# per-key load is "hot" (2*cnt*n_keys >= 3*total — pure integer math so
# Spark and DuckDB classify identically).  Production would also cap the
# hot set (top-K by count); the threshold alone suffices here because a
# skewed corpus has FEW hot keys by definition — that is what skew is.
_HOT_NUM = 3
_HOT_DEN = 2


def hot_key_relation(fact: DataFrame, key: str) -> DataFrame:
    """The dq_key_skew diagnosis as a relation: fact keys above the
    {_HOT_NUM}/{_HOT_DEN}-of-mean load threshold, as (key, is_hot)."""
    counts = fact.groupBy(F.col(key).alias("key")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .filter(
            F.lit(_HOT_DEN) * F.col("cnt") * F.col("n_keys")
            >= F.lit(_HOT_NUM) * F.col("total")
        )
        .select("key", F.lit(True).alias("is_hot"))
    )


def salt_fact_by_hot_keys(
    fact: DataFrame, key: str, uniq: str, hot: DataFrame, n_salt: int
) -> DataFrame:
    """Tag fact rows with the remediation salt: hot keys spread over
    ``n_salt`` salts (deterministically, from the row's unique key so
    task retries salt identically), cold keys pinned to salt 0."""
    return (
        fact.join(F.broadcast(hot), fact[key] == hot.key, "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot"),
                F.pmod(F.xxhash64(uniq), F.lit(n_salt)),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("key")
    )


def salted_hot_join(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    n_salt: int = _NSALT,
) -> DataFrame:
    """Core of ``scalejoin_salted``, factored out so tests and the
    SCALE_PROOF leg can drive it with a synthetic hot-key corpus (see
    the query docstring)."""
    # Tracked because BOTH join sides consult the hot set — without the
    # persist each broadcast would recount the fact table.
    hot = track(hot_key_relation(orders, "o_custkey"))
    o = salt_fact_by_hot_keys(orders, "o_custkey", "o_orderkey", hot, n_salt)
    c = (
        customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(hot), customer.c_custkey == hot.key, "left")
        .withColumn(
            "salt",
            F.explode(
                F.when(
                    F.col("is_hot"),
                    F.sequence(F.lit(0), F.lit(n_salt - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .select("c_custkey", "c_nationkey", "salt")
    )
    n = nation.select("n_nationkey", "n_name")
    return (
        o.join(
            c.hint("shuffle_hash"),
            (o.o_custkey == c.c_custkey) & (o.salt == c.salt),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("order_cnt"),
            F.sum(F.when(F.col("is_hot"), 1).otherwise(0))
            .cast("bigint")
            .alias("hot_orders"),
            dsum(dec("o_totalprice"), "total_revenue"),
        )
    )


@query(
    "scalejoin_salted",
    oracle=f"""
    WITH counts AS (
      SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM counts
    ),
    hot AS (
      SELECT c.key FROM counts c CROSS JOIN stats s
      WHERE {_HOT_DEN} * c.cnt * s.n_keys >= {_HOT_NUM} * s.total
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           CAST(SUM(CASE WHEN h.key IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS hot_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS total_revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    LEFT JOIN hot h ON h.key = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def scalejoin_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnose-then-remediate skew join: the composition dq_key_skew
    recommends, as one query.  Phase 1 is the diagnosis (per-key counts
    on the prospective shuffle key, thresholded at {_HOT_NUM}/{_HOT_DEN}
    of the mean per-key load — the same integer-exact skew measure
    dq_key_skew reports); phase 2 is the remediation: ONLY the hot keys
    get salted (fact rows of a hot key spread over {_NSALT} salts via
    xxhash64 of the row's unique key — deterministic, so AQE task
    retries salt identically), and the dimension replicates x{_NSALT}
    ONLY for hot keys (cold keys ride salt 0 unreplicated).  This is
    the production shape: uniform salting (join_skew_salted) multiplies
    the WHOLE dimension shuffle by S, targeted salting pays replication
    only on the keys that need it.

    Every fact row still meets exactly one (key, salt) dimension row,
    so the result equals the plain join — the oracle — with hot_orders
    exposing how many rows rode the salted path (which also value-checks
    the hot classification itself against the oracle's recomputation).

    Scale shape: one count agg on the key (the diagnosis — same
    exchange the join pays anyway), hot set broadcast to both sides,
    shuffle on (key, salt) hash-spread across reducers; the
    shuffle_hash hint keeps the exchange real instead of letting the
    small test dimension collapse to a broadcast.  SCALE_PROOF's
    salted_join section measures the straggler factor (max/mean
    partition load) this buys on a zipf-keyed corpus."""
    return salted_hot_join(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


_MERGE_CUT = "1998-01-01"
_INSERT_OFFSET = 10_000_000


@query(
    "merge_upsert",
    oracle=f"""
    WITH src AS (
      SELECT o_custkey AS key,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      FROM orders
      WHERE o_orderdate >= DATE '{_MERGE_CUT}'
      GROUP BY o_custkey
    ), source AS (
      SELECT key, n_orders, spend FROM src
      UNION ALL
      SELECT key + {_INSERT_OFFSET} AS key, n_orders, spend
      FROM src WHERE n_orders >= 4
    )
    SELECT
      COALESCE(t.c_custkey, s.key) AS key,
      CASE WHEN t.c_custkey IS NULL THEN 'insert'
           WHEN s.key IS NULL THEN 'keep'
           ELSE 'update' END AS action,
      COALESCE(t.c_name, 'new-' || CAST(s.key AS VARCHAR)) AS name,
      CAST(ROUND(COALESCE(CAST(t.c_acctbal AS DECIMAL(12,2)), 0)
                 + COALESCE(CAST(s.spend AS DECIMAL(12,2)), 0), 2) AS DOUBLE)
        AS balance_after
    FROM customer t
    FULL OUTER JOIN source s ON s.key = t.c_custkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as one full-outer join: update / keep / insert.

    Target = the customer table; source = recent-order spend per customer,
    plus a disjoint-key slice standing in for genuinely new keys (TPC-H
    referential integrity means every o_custkey exists in customer, so
    the insert branch needs a synthetic key domain — offset by 10M,
    documented, deterministic).  The three MERGE branches are a single
    conditional projection over one full-outer shuffle join — the shape
    Delta/Iceberg MERGE compiles to when the source is not tiny.  At
    scale both sides hash-partition on the key once; no driver loop, no
    per-row lookups.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_MERGE_CUT).cast("date")
    )
    src = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("n_orders"),
        dsum(dec("o_totalprice"), "spend"),
    )
    source = src.unionByName(
        src.filter(F.col("n_orders") >= 4).withColumn(
            "key", F.col("key") + F.lit(_INSERT_OFFSET)
        )
    )
    t = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    j = t.join(source, t.c_custkey == source.key, "full_outer")
    return j.select(
        F.coalesce(t.c_custkey, source.key).alias("key"),
        F.when(t.c_custkey.isNull(), "insert")
        .when(source.key.isNull(), "keep")
        .otherwise("update")
        .alias("action"),
        F.coalesce(
            t.c_name, F.concat(F.lit("new-"), source.key.cast("string"))
        ).alias("name"),
        F.round(
            F.coalesce(dec("c_acctbal"), F.lit(0).cast("decimal(12,2)"))
            + F.coalesce(F.col("spend").cast("decimal(12,2)"), F.lit(0).cast("decimal(12,2)")),
            2,
        )
        .cast("double")
        .alias("balance_after"),
    )


_TRI_SUPPORT = 5


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), edges AS (
      SELECT a.p_brand AS src, b.p_brand AS dst
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_TRI_SUPPORT}
    )
    SELECT e1.src AS brand_a, e1.dst AS brand_b, e2.dst AS brand_c
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the brand co-occurrence graph.

    The fact-sized work is the first aggregation (order×brand distinct →
    support-thresholded edges); everything after runs on the
    dimension-sized edge relation (|brands|² upper bound), which Spark
    broadcasts for both self-joins — zero shuffles in the triangle phase
    (plan-asserted in tests).  Canonical ordering a < b < c emits each
    triangle exactly once, the standard trick that divides the naive
    join-explosion by 6 and removes duplicate-orientation output.  At
    100 TB the edge relation stays brand-bounded, so the triangle phase
    is scale-invariant.
    """
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    p = load_table(spark, sf_dir, "part")
    items = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("src"), F.col("b.p_brand").alias("dst")
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _TRI_SUPPORT)
        .select("src", "dst")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    return (
        e1.join(F.broadcast(e2), F.col("e2.src") == F.col("e1.dst"))
        .join(
            F.broadcast(e3),
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("brand_a"),
            F.col("e1.dst").alias("brand_b"),
            F.col("e2.dst").alias("brand_c"),
        )
    )


_LP_SUPPORT = 2  # min co-occurrences for an observed edge
_LP_MIN_CN = 2  # predict only pairs sharing >= 2 neighbors
_LP_DEGREE_CAP = 64  # drop hub nodes before pairing (bounds fan-out)


@query(
    "graph_link_prediction",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {_LP_SUPPORT}
    ),
    und AS (
      SELECT src AS u, dst AS v FROM edges
      UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
    capped AS (
      SELECT un.u, un.v FROM und un
      JOIN deg du ON du.u = un.u AND du.d <= {_LP_DEGREE_CAP}
      JOIN deg dv ON dv.u = un.v AND dv.d <= {_LP_DEGREE_CAP}
    ),
    common AS (
      SELECT a.u AS x, b.u AS y, COUNT(*) AS cn
      FROM capped a JOIN capped b ON a.v = b.v AND a.u < b.u
      GROUP BY 1, 2 HAVING COUNT(*) >= {_LP_MIN_CN}
    )
    SELECT c.x AS part_a, c.y AS part_b, c.cn AS n_common_neighbors,
           CAST(c.cn AS DOUBLE) / (da.d + db.d - c.cn) AS jaccard
    FROM common c
    JOIN deg da ON da.u = c.x
    JOIN deg db ON db.u = c.y
    WHERE NOT EXISTS (
      SELECT 1 FROM edges e WHERE e.src = c.x AND e.dst = c.y
    )
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the part co-occurrence graph:
    for part pairs NOT yet co-ordered (support < 2), the Jaccard of
    their neighbor sets — the 'frequently bought together, predicted'
    recommender primitive, and the 4th graph operator next to PageRank,
    triangles, and connected components.

    Scale shape: the fact-sized work is the one distinct+pair
    aggregation building the observed edge relation (same bound as
    orders_basket_pairs: per-order item count squared).  The
    common-neighbor self-join runs on the DEGREE-CAPPED adjacency list —
    hub nodes above degree 64 are excluded from candidate generation
    (the graph analogue of the shingle DF cap: a hub of degree d
    contributes d² candidate pairs and predicts nothing specific), so
    the wedge fan-out is bounded by cap² per node regardless of graph
    size.  The anti-join against observed edges keeps only genuinely
    novel predictions."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    items = l.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = track(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _LP_SUPPORT)
        .select("src", "dst")
    )
    und = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    deg = track(und.groupBy("u").agg(F.count("*").alias("d")))
    low = deg.filter(F.col("d") <= _LP_DEGREE_CAP).select("u")
    capped = (
        und.join(F.broadcast(low), "u", "left_semi")
        .join(
            F.broadcast(low.select(F.col("u").alias("v"))), "v", "left_semi"
        )
    )
    ca = capped.select(F.col("u").alias("x"), "v")
    cb = capped.select(F.col("u").alias("y"), F.col("v").alias("v2"))
    common = (
        ca.join(cb, (F.col("v") == F.col("v2")) & (F.col("x") < F.col("y")))
        .groupBy("x", "y")
        .agg(F.count("*").alias("cn"))
        .filter(F.col("cn") >= _LP_MIN_CN)
    )
    novel = common.join(
        edges,
        (common.x == edges.src) & (common.y == edges.dst),
        "left_anti",
    )
    da = deg.select(F.col("u").alias("x"), F.col("d").alias("dx"))
    db = deg.select(F.col("u").alias("y"), F.col("d").alias("dy"))
    jac = F.col("cn").cast("double") / (
        F.col("dx") + F.col("dy") - F.col("cn")
    )
    return (
        novel.join(F.broadcast(da), "x")
        .join(F.broadcast(db), "y")
        .select(
            F.col("x").alias("part_a"),
            F.col("y").alias("part_b"),
            F.col("cn").alias("n_common_neighbors"),
            jac.alias("jaccard"),
        )
    )
