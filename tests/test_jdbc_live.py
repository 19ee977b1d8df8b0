"""LIVE JDBC integration: the partitioned documents read against a real
database — embedded Derby, which ships in Spark's own jars for the
metastore, driven through the exact same option-map mechanics the
Postgres production path uses.

No Postgres exists in this environment; what these tests prove is the
Spark-side contract the round-4 audit flagged as never executed: the
wrapped-subquery ``dbtable``, numeric range partitioning over a derived
partition column, exactly-once row coverage across partition ranges
(including the unbounded first/last strides), predicate pushdown into
the wrapped query, and the ``deleted`` filter.  Only the Postgres
``hashtext`` expression itself stays text-only (Derby has no analogue;
the dialect seam is ``partition_expr``).
"""

from __future__ import annotations

import json

import pytest

from reindexer_spark.docpipe.config import ReindexConfig
from reindexer_spark.sources.jdbc import (
    DERBY_FIXTURE_PART_EXPR as DERBY_PART_EXPR,
    jdbc_reader_options,
    read_documents_jdbc,
)

N_DOCS = 100
DERBY_URL = "jdbc:derby:memory:livedocs"


@pytest.fixture(scope="module")
def derby_docs(spark):
    """documents table in an in-memory Derby created through the JVM
    Spark already runs (DriverManager via py4j)."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(DERBY_URL + ";create=true")
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE documents (id VARCHAR(16) PRIMARY KEY, "
        "txn_id VARCHAR(16), owner VARCHAR(16), content VARCHAR(200), "
        "deleted BOOLEAN)"
    )
    ps = conn.prepareStatement("INSERT INTO documents VALUES (?,?,?,?,?)")
    for i in range(N_DOCS):
        ps.setString(1, f"id{i:05d}")
        ps.setString(2, f"txn{i % 10}")
        ps.setString(3, f"owner{i % 3}")
        ps.setString(4, json.dumps({"id": f"id{i:05d}", "n": i}))
        ps.setBoolean(5, i % 10 == 9)
        ps.addBatch()
    ps.executeBatch()
    conn.commit()
    yield
    try:
        jvm.java.sql.DriverManager.getConnection(DERBY_URL + ";drop=true")
    except Exception:
        pass  # derby signals successful drop via SQLException


def live_conf(tmp_path_factory) -> ReindexConfig:
    p = tmp_path_factory.mktemp("jdbccfg") / "config.json"
    p.write_text(
        json.dumps(
            {
                "password": "unused-by-derby",
                "solrUrl": "http://s/solr/c",
                # Derby resolves the JDBC user as the schema; the table
                # lives in the default APP schema
                "dbuser": "APP",
                "query": (
                    "SELECT id, txn_id, owner, content FROM documents "
                    "WHERE NOT deleted ORDER BY id ASC"
                ),
            }
        )
    )
    return ReindexConfig.load(str(p))


def test_partitioned_read_exactly_once(spark, derby_docs, tmp_path_factory):
    """Every live row appears exactly once across 4 partition ranges —
    the property the masked partition expression must preserve (range
    partitioning covers (-inf, lb) and [ub, inf) in the edge tasks)."""
    conf = live_conf(tmp_path_factory)
    df = read_documents_jdbc(
        spark,
        conf,
        partition_expr=DERBY_PART_EXPR,
        url=DERBY_URL,
        num_partitions=4,
        lower_bound=0,
        upper_bound=N_DOCS,  # deliberately tight: edge strides must catch rest
    )
    assert df.rdd.getNumPartitions() == 4
    ids = [r.ID for r in df.collect()]
    expected = [f"id{i:05d}" for i in range(N_DOCS) if i % 10 != 9]
    assert sorted(ids) == expected  # no loss, no duplication
    assert len(ids) == len(set(ids))
    # the partition helper column does not leak into the result
    assert "doc_seq" not in [c.lower() for c in df.columns]


def test_resume_predicate_pushes_into_wrapped_query(
    spark, derby_docs, tmp_path_factory
):
    conf = live_conf(tmp_path_factory)
    df = read_documents_jdbc(
        spark,
        conf,
        partition_expr=DERBY_PART_EXPR,
        url=DERBY_URL,
        num_partitions=2,
    )
    from pyspark.sql import functions as F

    resumed = df.filter(F.col("ID") > "id00050")
    rows = resumed.collect()
    assert len(rows) == sum(
        1 for i in range(51, N_DOCS) if i % 10 != 9
    )
    # pushdown reaches the JDBC scan node (PushedFilters in the plan)
    plan = resumed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "ID" in plan


def test_order_by_strip_against_live_engine(
    spark, derby_docs, tmp_path_factory
):
    """The config query ends in ORDER BY; the stripped+wrapped SQL must
    still be VALID for a real engine (the round-4 rindex bug produced
    unparseable text for subquery sorts)."""
    conf = live_conf(tmp_path_factory)
    opts = jdbc_reader_options(
        conf, partition_expr=DERBY_PART_EXPR, url=DERBY_URL
    )
    assert "ORDER BY" not in opts["dbtable"].upper()
    # and a query whose ONLY sort is inside a subquery keeps it — Derby
    # requires FETCH for subquery ORDER BY, proving the text is legal
    p = tmp_path_factory.mktemp("jdbccfg2") / "config.json"
    p.write_text(
        json.dumps(
            {
                "password": "x",
                "solrUrl": "u",
                "dbuser": "APP",
                "query": (
                    "SELECT id, txn_id, owner, content FROM ("
                    "SELECT * FROM documents ORDER BY id "
                    "FETCH FIRST 20 ROWS ONLY) s"
                ),
            }
        )
    )
    conf2 = ReindexConfig.load(str(p))
    df = read_documents_jdbc(
        spark,
        conf2,
        partition_expr=DERBY_PART_EXPR,
        url=DERBY_URL,
        num_partitions=2,
    )
    assert df.count() == 20


def test_full_reference_pipeline_from_live_db(
    spark, derby_docs, tmp_path_factory, tmp_path
):
    """The reference's ENTIRE job, source to sink, against a live
    database: partitioned JDBC scan -> JSON parse -> flatten -> suffix
    -> batched capture sink. Every stage is the production code path;
    only the engine (Derby for Postgres) and transport (directory for
    Solr) are stand-ins."""
    import glob
    import json as _json

    from reindexer_spark.docpipe import SolrSink
    from reindexer_spark.docpipe.pipeline import run_reindex
    from reindexer_spark.docpipe.solr_sink import DirectoryCaptureTransport

    conf = live_conf(tmp_path_factory)
    docs = read_documents_jdbc(
        spark,
        conf,
        partition_expr=DERBY_PART_EXPR,
        url=DERBY_URL,
        num_partitions=3,
    )
    # Derby uppercases unquoted identifiers; the pipeline contract is
    # the reference's lowercase schema (driver.go:21-26)
    docs = docs.toDF(*[c.lower() for c in docs.columns])
    cap = tmp_path / "cap"
    cap.mkdir()
    sink = SolrSink(
        "capture://test",
        batch_size=25,
        transport_factory=lambda: DirectoryCaptureTransport(str(cap)),
    )
    result = run_reindex(docs, conf, sink=sink)
    # 90 live rows (10% soft-deleted were filtered in the DB query
    # itself), all parse (fixture content is valid JSON)
    assert result.ingested == 90
    assert result.quarantined == 0
    submitted = []
    for f in glob.glob(str(cap / "*.json")):
        submitted.extend(_json.load(open(f)))
    assert len(submitted) == 90
    assert {d["id"] for d in submitted} == {
        f"id{i:05d}" for i in range(N_DOCS) if i % 10 != 9
    }
    # suffixed field from the flattened JSON payload made it through
    sample = submitted[0]
    assert any(k.startswith("n_") or k == "n_l" for k in sample), sample


def test_dialect_profile_inferred_from_url_live(
    spark, derby_docs, tmp_path_factory
):
    """Round-11 VERDICT next #6 + round-12 review: the partition_expr
    dialect seam resolves schema-AGNOSTIC profiles (server-side hashes)
    from the JDBC URL subprotocol, but Derby — whose only in-range key
    is schema-specific id arithmetic — deliberately does NOT
    auto-resolve: it raises with a hint at CONFIGURATION time instead
    of mis-partitioning at read time.  The live partitioned read with
    the explicit fixture expression still tiles exactly-once."""
    from reindexer_spark.sources.jdbc import (
        DERBY_FIXTURE_PART_EXPR,
        PARTITION_EXPRS,
        partition_expr_for_url,
    )

    assert "derby" not in PARTITION_EXPRS
    with pytest.raises(ValueError, match="DERBY_FIXTURE_PART_EXPR"):
        partition_expr_for_url(DERBY_URL)
    assert (
        partition_expr_for_url("jdbc:postgresql://h:5432/db")
        == PARTITION_EXPRS["postgresql"]
    )
    with pytest.raises(ValueError, match="no partition-key dialect"):
        partition_expr_for_url("jdbc:oracle:thin:@h:1521/db")
    conf = live_conf(tmp_path_factory)
    df = read_documents_jdbc(
        spark,
        conf,
        url=DERBY_URL,
        partition_expr=DERBY_FIXTURE_PART_EXPR,  # explicit by contract
        num_partitions=3,
        lower_bound=0,
        upper_bound=N_DOCS,
    )
    ids = [r.ID for r in df.collect()]
    assert sorted(ids) == [
        f"id{i:05d}" for i in range(N_DOCS) if i % 10 != 9
    ]


def _spark_stride_clauses(col, lb, ub, n):
    """Spark JDBCRelation.columnPartition's stride arithmetic: the
    first partition is unbounded below (and catches NULL), the last
    unbounded above, so the ranges tile the whole line regardless of
    the configured bounds."""
    stride = ub // n - lb // n
    clauses = []
    current = lb
    for i in range(n):
        lclause = f"{col} >= {current}" if i > 0 else None
        current += stride
        uclause = f"{col} < {current}" if i < n - 1 else None
        if lclause and uclause:
            clauses.append(f"{lclause} AND {uclause}")
        elif uclause:
            clauses.append(f"{uclause} OR {col} IS NULL")
        else:
            clauses.append(lclause)
    return clauses


def test_duckdb_profile_live_replay(tmp_path_factory):
    """Second LIVE dialect leg: the hash-and-mask profile (the
    postgres-shaped one, with DuckDB's hash()) executed by DuckDB
    against the EXACT wrapped dbtable SQL jdbc_reader_options emits,
    partitioned with Spark's own stride arithmetic — every row exactly
    once, every partition key inside [0, 2^31).  This validates the
    wrapper + masking contract on a REAL hash distribution, which the
    Derby numeric-suffix profile cannot exercise."""
    import duckdb

    from reindexer_spark.sources.jdbc import jdbc_reader_options

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS "
        "SELECT 'id' || lpad(CAST(i AS VARCHAR), 5, '0') AS id, "
        "'txn' || CAST(i % 10 AS VARCHAR) AS txn_id, "
        "'owner' || CAST(i % 3 AS VARCHAR) AS owner, "
        "'{}' AS content, (i % 10 = 9) AS deleted "
        "FROM range(100) t(i)"
    )
    conf = live_conf(tmp_path_factory)
    opts = jdbc_reader_options(
        conf,
        url="jdbc:duckdb:memory:x",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1 << 31,
    )
    assert "hash(q.id)" in opts["dbtable"]
    inner = opts["dbtable"].rsplit(" AS partitioned_src", 1)[0]
    seen = []
    for clause in _spark_stride_clauses(
        opts["partitionColumn"],
        int(opts["lowerBound"]),
        int(opts["upperBound"]),
        int(opts["numPartitions"]),
    ):
        rows = con.execute(
            f"SELECT id, doc_seq FROM {inner} WHERE {clause}"
        ).fetchall()
        seen.extend(rows)
    assert sorted(r[0] for r in seen) == sorted(
        f"id{i:05d}" for i in range(100) if i % 10 != 9
    )  # exactly-once across the stride tiling
    assert all(0 <= r[1] < (1 << 31) for r in seen)  # mask contract
    # keys actually spread (a real hash, not a constant)
    assert len({r[1] for r in seen}) > 50
