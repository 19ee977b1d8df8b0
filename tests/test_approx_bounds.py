"""Accuracy bounds for the approximate operators against their exact,
oracle-checked counterparts (the README's contract: every rows-only
query is sanity-bounded by an exact one).

These are tolerance tests, not equality tests — the point is that the
sketch/LSH parameters chosen in the operators actually deliver the
accuracy they claim at testdata scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reindexer_spark.registry import get_query


def test_sketch_error_bands_all_hold(spark, sf_dir):
    """agg_approx_sketches now asserts its own accuracy contract as
    boolean columns (round 3: that is what the value-checked oracle
    verifies); here we confirm every band holds at test scale AND that
    the exact counts it carries match an independent computation."""
    from reindexer_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: (r.orders, r.parts)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    rows = get_query("agg_approx_sketches").fn(spark, sf_dir).collect()
    assert {r.l_returnflag for r in rows} == set(exact)
    for r in rows:
        assert (r.exact_orders, r.exact_parts) == exact[r.l_returnflag]
        assert r.orders_in_band and r.parts_in_band
        assert r.median_in_band and r.p25_in_band and r.p75_in_band


def test_minhash_recall_of_high_jaccard_pairs(spark, sf_dir):
    """LSH banding must recover (nearly) all truly-similar pairs: with
    8 bands × 4 rows, a pair at jaccard 0.9 collides in some band with
    p = 1-(1-0.9^4)^8 ≈ 0.9996 — so requiring ≥90% recall of the exact
    jaccard ≥ 0.9 pairs is loose but meaningful."""
    exact = {
        (r.d1, r.d2)
        for r in get_query("dedup_ngram_jaccard").fn(spark, sf_dir).collect()
        if r.jaccard >= 0.9
    }
    if not exact:
        import pytest

        pytest.skip("no high-similarity pairs at this scale factor")
    cand = {
        (r.d1, r.d2)
        for r in get_query("dedup_minhash").fn(spark, sf_dir).collect()
    }
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall:.3f} over {len(exact)} pairs"


def test_ivf_lsh_knn_consistent_with_bruteforce(spark, sf_dir):
    """Bucketed ANN consistency bounds.  (A recall-vs-bruteforce bar
    would be dishonest here: the testdata embeddings are random noise,
    so true-neighbor cosines sit around 0.3 where single-band
    8-hyperplane LSH collides with probability (1-θ/π)^8 ≈ 2% — LSH
    recall claims only apply to genuinely similar vectors, which this
    corpus does not contain.  What LSH DOES guarantee regardless of data:
    it searches a subset of the brute-force space.)"""
    exact_rows = get_query("knn_bruteforce").fn(spark, sf_dir).collect()
    approx_rows = get_query("knn_ivf_lsh").fn(spark, sf_dir).collect()
    assert exact_rows, "bruteforce returned nothing"
    best = {}
    exact_cos = {}
    for r in exact_rows:
        exact_cos[(r.query_id, r.neighbor_id)] = r.cosine
        if r.rnk == 1:
            best[r.query_id] = r.cosine
    for r in approx_rows:
        # approx queries come from the same fixed query set
        assert r.query_id in best
        # a bucket-restricted search can never beat the brute-force best
        assert r.cosine <= best[r.query_id] + 1e-9
        # where both report the same pair, the exact re-rank cosine agrees
        if (r.query_id, r.neighbor_id) in exact_cos:
            assert abs(r.cosine - exact_cos[(r.query_id, r.neighbor_id)]) < 1e-9


def test_multiband_lsh_beats_single_band_recall(spark, sf_dir):
    """Banding is the recall lever: union-of-4-bands candidates must
    recover far more of the true top-k than the single wide band
    (measured ~0.4-0.5 vs ~0.02 on this data; bounds set loosely)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in get_query("knn_bruteforce").fn(spark, sf_dir).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in get_query("knn_multiband_lsh").fn(spark, sf_dir).collect()
    }
    single = {
        (r.query_id, r.neighbor_id)
        for r in get_query("knn_ivf_lsh").fn(spark, sf_dir).collect()
    }
    r_multi = len(exact & multi) / len(exact)
    r_single = len(exact & single) / len(exact)
    assert r_multi >= 0.2, f"multiband recall {r_multi:.3f}"
    assert r_multi > r_single, (r_multi, r_single)


def test_simhash_production_recall_is_total(spark, sf_dir):
    """The production (xxhash64) SimHash lane must return EXACTLY the
    hamming <= 6 relation over its own sketches: 8x8-bit banding
    guarantees a shared band at hamming <= 7 (pigeonhole), and the
    filter is an exact xor+bit_count — so this is set equality, not a
    tolerance band.  The exact relation is brute-forced here over the
    collected sketch column (test scale), independent of the banding
    path under test."""
    import numpy as np

    from reindexer_spark.catalog import load_table
    from reindexer_spark.operators.dedup import (
        SIMHASH_HAMMING,
        simhash_sketches,
    )

    rows = simhash_sketches(
        load_table(spark, sf_dir, "documents")
    ).collect()
    ids = np.array([r.doc_id for r in rows], dtype=np.int64)
    sigs = np.array([r.simhash for r in rows], dtype=np.int64).astype(
        np.uint64
    )
    # brute-force all-pairs hamming via xor popcount (vectorized)
    x = sigs[:, None] ^ sigs[None, :]
    ham = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        ham += (x & 1).astype(np.int64)
        x >>= np.uint64(1)
    i, j = np.where(
        np.triu(ham <= SIMHASH_HAMMING, k=1)
    )
    lo = np.minimum(ids[i], ids[j])
    hi = np.maximum(ids[i], ids[j])
    exact = set(zip(lo.tolist(), hi.tolist()))
    got = {
        (r.d1, r.d2)
        for r in get_query("dedup_simhash").fn(spark, sf_dir).collect()
    }
    assert got == exact, (
        f"banding lost {len(exact - got)} pairs / invented "
        f"{len(got - exact)} over {len(exact)} exact pairs"
    )
    assert exact, "fixture produced no near-duplicate pairs to check"


def test_unigram_train_contract(spark, sf_dir):
    """text_unigram_train's structural guarantees beyond the value-exact
    oracle: the vocabulary shrinks monotonically round over round (EM
    drops unused pieces, the prune round caps multi-char pieces at
    UNI_TARGET), every single character survives to the final vocabulary
    (coverage floor — segmentation can never dead-end), and EM strictly
    improves the quantized corpus cost before the prune trades cost back
    for vocabulary size."""
    from reindexer_spark.operators.text_clean import UNI_TARGET

    rows = {
        r["round"]: r
        for r in get_query("text_unigram_train").fn(spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert rows[0].vocab_size >= rows[1].vocab_size >= rows[2].vocab_size
    # EM re-estimation never worsens the Viterbi-optimal corpus cost
    assert rows[1].corpus_cost <= rows[0].corpus_cost
    # the prune round caps multi-char pieces: final vocab is at most the
    # corpus's distinct in-band characters (never pruned) + UNI_TARGET
    from pyspark.sql import functions as F

    from reindexer_spark.catalog import load_table
    from reindexer_spark.operators.text_clean import UNI_L

    n_chars = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= UNI_L))
        .select(F.explode(F.split("w", "")).alias("c"))
        .distinct()
        .count()
    )
    assert rows[2].vocab_size <= n_chars + UNI_TARGET
    for r in rows.values():
        assert r.corpus_tokens > 0 and r.corpus_cost > 0


def _uni_dp(w: str, vocab: dict[str, int]):
    """Pure-Python mirror of the text_unigram_train DP SPEC (the same
    integer recurrence both engines run): enc state = cost*16 +
    chosen_piece_len, MIN is simultaneously relaxation and argmin."""
    enc = [0]
    for i in range(1, len(w) + 1):
        cands = []
        for p in range(1, min(4, i) + 1):
            piece = w[i - p : i]
            if piece in vocab:
                cands.append((enc[i - p] // 16 + vocab[piece]) * 16 + p)
        enc.append(min(cands))
    pieces, pos = [], len(w)
    while pos > 0:
        p = enc[pos] % 16
        pieces.append(w[pos - p : pos])
        pos -= p
    return enc[len(w)] // 16, list(reversed(pieces))


def _uni_brute(w: str, vocab: dict[str, int]) -> int:
    """Minimum segmentation cost by exhaustive enumeration."""
    best = {0: 0}
    for i in range(1, len(w) + 1):
        costs = [
            best[i - p] + vocab[w[i - p : i]]
            for p in range(1, min(4, i) + 1)
            if w[i - p : i] in vocab and (i - p) in best
        ]
        if costs:
            best[i] = min(costs)
    return best[len(w)]


def test_unigram_dp_encoding_equals_bruteforce():
    """Property: the cost*16+len encoding never corrupts the Viterbi
    optimum (piece lengths < 16 keep the cost ordering intact), and the
    enc%16 traceback reconstructs a valid segmentation achieving it —
    over randomized vocabularies and words, not just the gate corpus."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        w=st.text(alphabet="abcd", min_size=1, max_size=8),
        data=st.data(),
    )
    def check(w, data):
        # vocabulary: every single char (coverage floor) plus random
        # multi-char substrings of w, with random quantized nll weights
        subs = {
            w[i : i + p]
            for i in range(len(w))
            for p in range(2, 5)
            if i + p <= len(w)
        }
        chosen = data.draw(
            st.sets(st.sampled_from(sorted(subs)), max_size=len(subs))
            if subs
            else st.just(set())
        )
        vocab = {
            piece: data.draw(
                st.integers(min_value=0, max_value=20_000_000),
                label=f"nll[{piece}]",
            )
            for piece in sorted(set(w) | set(chosen))
        }
        cost, pieces = _uni_dp(w, vocab)
        assert cost == _uni_brute(w, vocab)
        assert "".join(pieces) == w
        assert all(p in vocab for p in pieces)
        assert sum(vocab[p] for p in pieces) == cost

    check()


def test_prefix_filter_lossless_vs_all_shingles_baseline(spark, sf_dir):
    """dedup_ngram_prefix must return EXACTLY the rows of
    dedup_ngram_jaccard — the PPJoin prefix filter is a lossless
    candidate prune, not an approximation (both lanes also share one
    oracle SQL, so the driver gate re-proves this every round)."""
    exact = {
        (r.d1, r.d2, r.n_common, r.jaccard)
        for r in get_query("dedup_ngram_jaccard").fn(spark, sf_dir).collect()
    }
    pref = {
        (r.d1, r.d2, r.n_common, r.jaccard)
        for r in get_query("dedup_ngram_prefix").fn(spark, sf_dir).collect()
    }
    assert pref == exact
    assert exact, "baseline returned no near-dup pairs at this scale"


def test_prefix_length_integer_arithmetic():
    """ceil(4n/5) via (4n+4) div 5 — the float form 0.8*n overshoots at
    multiples of 5 (0.8*5 = 4.000000000000001 → ceil 5), which would
    shorten the prefix and silently drop true pairs."""
    import math

    for n in range(1, 500):
        assert (4 * n + 4) // 5 == math.ceil(
            __import__("fractions").Fraction(4 * n, 5)
        )
