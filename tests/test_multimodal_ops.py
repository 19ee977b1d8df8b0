

def test_phash_dedup_finds_only_perturbed_copies(spark, sf_dir):
    """Every detected pair must link an original to ITS perturbed copy
    (media_id + 1e6) within the hamming bound — no cross-image false
    positives among the ~67 decoded images."""
    from reindexer_spark.registry import get_query

    rows = get_query("multimodal_phash_dedup").fn(spark, sf_dir).collect()
    assert rows, "perturbed-copy lane must produce detectable pairs"
    for r in rows:
        assert r.m2 == r.m1 + 1_000_000, (r.m1, r.m2)
        assert 0 <= r.hamming <= 6
