"""Scale-correctness properties of the deterministic sampling family:
membership must be a pure function of the row, never of the physical
plan — the property that makes the samples safe under task retries,
speculative execution, and cluster-dependent input splits.
"""

from __future__ import annotations

import math

from reindexer_spark import get_query
from reindexer_spark.catalog import load_table


def _ids(spark, sf_dir, name):
    rows = get_query(name).fn(spark, sf_dir).select("doc_id").collect()
    return sorted(r.doc_id for r in rows)


def test_bernoulli_sample_invariant_to_input_partitioning(spark, sf_dir):
    """Same sample membership regardless of how the scan is split."""
    baseline = _ids(spark, sf_dir, "sample_hash_bernoulli")
    assert baseline, "sample should be non-empty"
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # Force many tiny input splits → different partitioning of the scan.
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
        assert _ids(spark, sf_dir, "sample_hash_bernoulli") == baseline
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_stratified_sample_exact_sizes(spark, sf_dir):
    """Per-stratum output size is exactly ceil(frac * |stratum|)."""
    from reindexer_spark.operators.sampling import STRATA_FRAC

    docs = load_table(spark, sf_dir, "documents")
    expected = {
        r.lang: math.ceil(STRATA_FRAC * r.n)
        for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    got = {
        r.lang: r.n
        for r in get_query("sample_stratified_exact")
        .fn(spark, sf_dir)
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == expected


def test_shard_positions_are_dense_and_disjoint(spark, sf_dir):
    """corpus_shuffle_shard: every shard's positions are 1..n with no
    gaps, and every doc appears exactly once."""
    out = get_query("corpus_shuffle_shard").fn(spark, sf_dir).collect()
    docs = [r.doc_id for r in out]
    assert len(docs) == len(set(docs))
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard


def test_pack_greedy_invariants(spark, sf_dir):
    """Beyond the value-exact oracle: every packed sequence respects the
    token budget unless it is a single oversized document; every document
    is assigned exactly once; sequence ids are contiguous from their
    shard's first id."""
    from reindexer_spark.operators.sampling import GREEDY_BUDGET

    rows = get_query("corpus_pack_greedy").fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs

    seqs: dict[tuple[int, int], list[int]] = {}
    for r in rows:
        seqs.setdefault((r.shard, r.seq_id), []).append(r.n_tokens)
    for (shard, seq_id), toks in seqs.items():
        if len(toks) > 1:
            assert sum(toks) <= GREEDY_BUDGET, (shard, seq_id)
    # per shard: seq ids contiguous
    by_shard: dict[int, set[int]] = {}
    for (shard, seq_id) in seqs:
        by_shard.setdefault(shard, set()).add(seq_id)
    for shard, ids in by_shard.items():
        assert ids == set(range(min(ids), max(ids) + 1)), shard
