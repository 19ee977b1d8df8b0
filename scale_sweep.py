#!/usr/bin/env python
"""10x bench sweep (round-7 VERDICT item #1): the headline + flagship
query set at sf0.1 vs an sf1-equivalent corpus, with per-query growth
ratios.

SCALE_PROOF.json answers "does the dedup/ANN family scale" on purpose-
built corpora; this sweep answers the broader question the plan claims
imply — does EVERY headline query's wall and shuffle volume grow like
the plan says (near-linearly) when the data grows 10x.

The sf1 corpus (scaledata/sf1/) is built by REPLICATING the driver's
sf0.1 tables 10x with per-replica key offsets: every marginal
distribution, group cardinality ratio, and join fan-out is preserved
EXACTLY (each replica joins to its own replica of its dimensions), so
the 10x comparison measures scaling, not a distribution shift.  Facts
and their dimensions offset together (custkey/orderkey/partkey/suppkey/
user_id); nation/region stay fixed (they are genuinely fixed-size
dimensions at any scale).  documents/embeddings reuse the proven
scale_proof corpora (dense-50k / emb-20k — the driver testdata's own
distribution at 10x).

Replication is pure Spark (one scan, explode x10, key remap in
codegen) — the same generator shape would produce the 100 TB corpus.

Timing convention: min-of-N (default 2) per query per scale — this VM's
wall variance hits ~5x on single legs (SCALE_PROOF history), and the
minimum is the least-contended observation; shuffle-write RECORDS are
the noise-robust scaling signal (bytes conflate compression).  Output:
SCALE_SWEEP.json, attached to bench.py's JSON line like SCALE_PROOF.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = os.path.join(REPO, "scaledata", "sf1")
REPLICAS = 10
REPS = max(1, int(os.environ.get("SPARK_GRAFT_SWEEP_REPS", "2")))

# per-table (key column -> offset stride) remaps; stride = sf0.1 row
# count of the table that owns the key, so replica k's keys occupy
# [k*stride, (k+1)*stride)
_KEY_STRIDES = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
}
_COPY_TABLES = ("region", "nation")


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    from reindexer_spark.catalog import load_table

    os.makedirs(SF1_DIR, exist_ok=True)
    # write timestamps as INT64 micros, not Spark's legacy INT96
    # default — the streaming source reads an explicit schema and the
    # batch/stream ts-unit probe distinguishes physical types
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    for t in _COPY_TABLES:
        out = os.path.join(SF1_DIR, f"{t}.parquet")
        if not os.path.exists(out):
            load_table(spark, SF01, t).write.mode("overwrite").parquet(out)
    for t, strides in _KEY_STRIDES.items():
        out = os.path.join(SF1_DIR, f"{t}.parquet")
        if os.path.exists(out):
            continue
        print(f"replicating {t} x{REPLICAS}", file=sys.stderr)
        df = load_table(spark, SF01, t).withColumn(
            "_rep", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
        )
        for col, stride in strides.items():
            dtype = dict(df.dtypes)[col]
            df = df.withColumn(
                col, (F.col(col) + F.col("_rep") * stride).cast(dtype)
            )
        # events matches the driver testdata's ONE-file layout so the
        # streaming lane pays the same trigger count at both scales
        # (maxFilesPerTrigger=1: 32 part files would mean 32 micro-
        # batches and the ratio would measure trigger overhead, not
        # data scaling); batch tables split 32-way for scan parallelism
        df = df.drop("_rep")
        df = df.coalesce(1) if t == "events" else df.repartition(32)
        df.write.mode("overwrite").parquet(out)
    # documents/embeddings: the scale_proof corpora ARE the 10x of the
    # driver testdata's distribution — reuse, don't re-generate
    import scale_proof as sp

    docs_out = os.path.join(SF1_DIR, "documents.parquet")
    if not os.path.exists(docs_out):
        src = os.path.join(REPO, "scaledata", "dense-50k")
        if not os.path.exists(os.path.join(src, "documents.parquet")):
            sp.generate_corpus(spark, src, zipf_tail=False, n_docs=50_000)
        spark.read.parquet(
            os.path.join(src, "documents.parquet")
        ).write.mode("overwrite").parquet(docs_out)
    emb_out = os.path.join(SF1_DIR, "embeddings.parquet")
    if not os.path.exists(emb_out):
        src = os.path.join(REPO, "scaledata", "emb-20k")
        if not os.path.exists(os.path.join(src, "embeddings.parquet")):
            sp.generate_embeddings(spark, src, n_vecs=20_000)
        spark.read.parquet(
            os.path.join(src, "embeddings.parquet")
        ).write.mode("overwrite").parquet(emb_out)


DENSE10_DIR = os.path.join(REPO, "scaledata", "dense10")

# Round-8 VERDICT missing #1: the replica sweep grows KEY CARDINALITY
# but never rows-per-key, so group-by/window/join lanes never see
# per-key state grow — the regime that actually breaks at 100x.  The
# DENSITY axis grows exactly that: facts replicate 10x with their OWN
# primary key offset (rows stay unique) but the PARENT key unchanged —
# each customer gets 10x orders, each part/supplier 10x lineitems,
# each user 10x events, while key cardinality stays fixed.  Dimensions
# are NOT replicated (a real corpus growing denser doesn't clone its
# customers).
_DENSITY_STRIDES = {
    # table -> (offset cols, unchanged parent keys documented)
    "orders": {"o_orderkey": 150_000},      # o_custkey unchanged
    "lineitem": {"l_orderkey": 150_000},    # l_partkey/l_suppkey unchanged
    "events": {"event_id": 100_000},        # user_id unchanged
}
# documents/embeddings ride along untouched: no density query reads
# them, but the user-SQL lanes register every catalog view
_DENSITY_COPY = (
    "region", "nation", "customer", "supplier", "part",
    "documents", "embeddings",
)

# the join/window/group-by headliners whose plans carry per-key state
DENSITY_QUERIES = [
    "q1_pricing_summary",
    "q5_regional_revenue",
    "window_topn_per_group",
    "window_session",
    "sql_tpch_q3ish",
    "scalejoin_salted",
]


def build_dense10(spark) -> None:
    from pyspark.sql import functions as F

    from reindexer_spark.catalog import load_table

    os.makedirs(DENSE10_DIR, exist_ok=True)
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    for t in _DENSITY_COPY:
        out = os.path.join(DENSE10_DIR, f"{t}.parquet")
        if not os.path.exists(out):
            load_table(spark, SF01, t).write.mode("overwrite").parquet(out)
    for t, strides in _DENSITY_STRIDES.items():
        out = os.path.join(DENSE10_DIR, f"{t}.parquet")
        if os.path.exists(out):
            continue
        print(f"densifying {t} x{REPLICAS} (parent keys fixed)", file=sys.stderr)
        df = load_table(spark, SF01, t).withColumn(
            "_rep", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
        )
        for col, stride in strides.items():
            dtype = dict(df.dtypes)[col]
            df = df.withColumn(
                col, (F.col(col) + F.col("_rep") * stride).cast(dtype)
            )
        df = df.drop("_rep")
        # same file-layout convention as build_sf1 (events one file so
        # the streaming trigger count is scale-invariant)
        df = df.coalesce(1) if t == "events" else df.repartition(32)
        df.write.mode("overwrite").parquet(out)


def run_density_axis(spark, ui_port: int, result: dict) -> None:
    """The rows-per-key growth leg, merged into ``result`` under
    ``density_axis`` with the same min-of-reps wall + shuffle-record
    convention as the replica axis."""
    from reindexer_spark import get_query
    from scale_proof import _shuffle_totals

    build_dense10(spark)
    prior = result.setdefault(
        "density_axis",
        {
            "note": (
                "dense10 = facts replicated 10x with their own PK "
                "offset but PARENT keys unchanged (10x orders/customer, "
                "10x lineitems/part+supplier, 10x events/user; "
                "dimensions not replicated) — grows rows-per-key at "
                "fixed key cardinality, the regime the replica axis "
                "cannot exercise. growth_at_10x near 10 = linear in "
                "per-key density."
            ),
            "queries": {},
        },
    )
    for name in DENSITY_QUERIES:
        q = get_query(name)
        per_scale: dict = {}
        # warm BOTH scales: with REPS=1 a cold first dense10 rep would
        # bias the growth ratio upward (parquet footers, codegen)
        q.fn(spark, SF01).write.format("noop").mode("overwrite").save()
        q.fn(spark, DENSE10_DIR).write.format("noop").mode("overwrite").save()
        for label, d in (("sf0.1", SF01), ("dense10", DENSE10_DIR)):
            walls, recs = [], []
            for _ in range(REPS):
                b0, r0 = _shuffle_totals(ui_port)
                t0 = time.perf_counter()
                q.fn(spark, d).write.format("noop").mode("overwrite").save()
                walls.append(round(time.perf_counter() - t0, 3))
                b1, r1 = _shuffle_totals(ui_port)
                recs.append(round((r1 - r0) / 1e6, 3))
            per_scale[label] = {
                "wall_sec": min(walls),
                "wall_all": walls,
                "shuffle_write_mrec": min(recs),
            }
        a, b = per_scale["sf0.1"], per_scale["dense10"]
        per_scale["growth_at_10x"] = {
            "wall": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
            "shuffle_records": (
                round(b["shuffle_write_mrec"] / a["shuffle_write_mrec"], 2)
                if a["shuffle_write_mrec"] >= 0.01
                else None
            ),
        }
        prior["queries"][name] = per_scale
        print(f"density {name}: {json.dumps(per_scale)}", file=sys.stderr)
        with open(os.path.join(REPO, "SCALE_SWEEP.json"), "w") as fh:
            json.dump(result, fh, indent=1)


def run_sweep(seed_queries: dict | None = None) -> dict:
    """Full sweep, or — with ``seed_queries`` — a subset re-run whose
    incremental writes carry the prior results forward, so a crash
    mid-subset can never destroy the rest of the ledger."""
    import bench
    from reindexer_spark import get_query, get_spark
    from reindexer_spark.catalog import TABLES, load_table
    from scale_proof import _shuffle_totals

    spark = get_spark(
        "reindexer-scale-sweep",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    ui_port = int(spark.conf.get("spark.ui.port", "4040"))
    build_sf1(spark)

    scales = (("sf0.1", SF01), ("sf1", SF1_DIR))
    for _, d in scales:
        for t in TABLES:
            load_table(spark, d, t).limit(1).count()

    names = list(bench.HEADLINE) + list(bench.HEADLINE2)
    result: dict = {
        "replicas": REPLICAS,
        "reps": REPS,
        "note": (
            "sf1 = sf0.1 replicated 10x with per-replica key offsets "
            "(distribution-preserving; each replica joins its own "
            "dimension replica) + dense-50k documents / emb-20k "
            "embeddings. wall_sec is min-of-reps (VM noise envelope); "
            "shuffle-write records are the scaling signal. growth_at_10x "
            "near 10 = linear; sublinear means a fixed-size stage "
            "(broadcast dim, bounded state) dominates. Two ratio classes "
            "ABOVE 10 are diagnosed-benign, with linear ceilings: "
            "(1) partial-reduction effectiveness — map-side combines "
            "(WindowGroupLimit top-k, except/intersect partial counts) "
            "reduce by rows-per-key-per-task, and sf0.1's single-file "
            "scan (1 map task sees every key's rows) reduces maximally "
            "while sf1's 32 tasks see <k rows/key each, so the shuffle "
            "approaches its min(input, k*keys*tasks) ceiling — LINEAR "
            "in input, verified per-stage via the status API; "
            "(2) text-dedup pair growth on the DENSE 31-word corpus, "
            "where shingle DF grows with corpus size by construction — "
            "the adversarial regime SCALE_PROOF's zipf legs complement "
            "with the natural-corpus (scale-invariant DF) measurement. A third benign class: sub-second lanes with zero shuffle (sample_weighted_mix) scale by SCAN TASK COUNT, not data — the sf0.1 table is one file (one task) while sf1 splits 32 ways, so per-task scheduling overhead dominates walls this small; at real scale task runtime amortizes it."
        ),
        "queries": dict(seed_queries or {}),
    }
    for name in names:
        q = get_query(name)
        per_scale: dict = {}
        # untimed warmup (codegen/broadcast spin-up), smallest scale
        q.fn(spark, SF01).write.format("noop").mode("overwrite").save()
        for label, d in scales:
            walls, recs = [], []
            for _ in range(REPS):
                b0, r0 = _shuffle_totals(ui_port)
                t0 = time.perf_counter()
                q.fn(spark, d).write.format("noop").mode("overwrite").save()
                walls.append(round(time.perf_counter() - t0, 3))
                b1, r1 = _shuffle_totals(ui_port)
                recs.append(round((r1 - r0) / 1e6, 3))
            per_scale[label] = {
                "wall_sec": min(walls),
                "wall_all": walls,
                "shuffle_write_mrec": min(recs),
            }
        a, b = per_scale["sf0.1"], per_scale["sf1"]
        per_scale["growth_at_10x"] = {
            "wall": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
            "shuffle_records": (
                round(
                    b["shuffle_write_mrec"] / a["shuffle_write_mrec"], 2
                )
                if a["shuffle_write_mrec"] >= 0.01
                else None
            ),
        }
        result["queries"][name] = per_scale
        print(f"{name}: {json.dumps(per_scale)}", file=sys.stderr)
        # incremental write: a crash late in the sweep keeps every
        # finished leg (round-8 lesson: query 27 of 31 died and took
        # 25 minutes of results with it)
        with open(os.path.join(REPO, "SCALE_SWEEP.json"), "w") as fh:
            json.dump(result, fh, indent=1)
    return result


def main() -> int:
    result = run_sweep()
    _append_density(result)
    out = os.path.join(REPO, "SCALE_SWEEP.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"written": out, "n_queries": len(result["queries"])}))
    return 0


def _append_density(result: dict | None = None) -> None:
    """Run (or re-run) the density axis, merging into SCALE_SWEEP.json.
    Standalone entry: ``python scale_sweep.py --density``."""
    from reindexer_spark import get_spark

    out = os.path.join(REPO, "SCALE_SWEEP.json")
    if result is None:
        try:
            with open(out) as fh:
                result = json.load(fh)
        except (OSError, json.JSONDecodeError):
            result = {"queries": {}}
        result.pop("density_axis", None)  # re-measure, don't mix runs
    spark = get_spark(
        "reindexer-scale-sweep",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    ui_port = int(spark.conf.get("spark.ui.port", "4040"))
    run_density_axis(spark, ui_port, result)
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"density_queries": len(result["density_axis"]["queries"])}))


def _run_subset(names: list[str]) -> None:
    """Re-run only ``names`` and merge into the existing
    SCALE_SWEEP.json (post-fix re-measurement of a diagnosed lane)."""
    import bench

    saved_h, saved_h2 = bench.HEADLINE, bench.HEADLINE2
    bench.HEADLINE, bench.HEADLINE2 = list(names), []
    try:
        out = os.path.join(REPO, "SCALE_SWEEP.json")
        try:
            with open(out) as fh:
                prior = json.load(fh)
        except (OSError, json.JSONDecodeError):
            prior = None
        seed = prior["queries"] if prior else None
        result = run_sweep(seed_queries=seed)
        with open(out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(json.dumps({"merged": names}))
    finally:
        bench.HEADLINE, bench.HEADLINE2 = saved_h, saved_h2


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--density":
        _append_density()
        sys.exit(0)
    if len(sys.argv) > 1:
        _run_subset(sys.argv[1:])
        sys.exit(0)
    sys.exit(main())
