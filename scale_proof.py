#!/usr/bin/env python
"""Scale proof for the dedup family: sf0.1 vs a 10× (sf1-shape) corpus.

The SURVEY's 100 TB claims for the bucketed dedup pipeline (banded
MinHash LSH, DF-capped inverted shingle index, edge-sized connected
components) are plan-asserted in tests but, before round 3, never
EXECUTED above sf0.1.  This script is the execution: it generates a
50 k-document corpus (10× sf0.1) with the same vocabulary / length /
lang / source / duplication shape as the driver's testdata, runs
``dedup_minhash``, ``dedup_ngram_jaccard`` and ``dedup_clusters`` at
both scales on the same session, and records wall-time plus ACTUAL
shuffle read/write bytes per query (from Spark's status REST API) to
``SCALE_PROOF.json``.  bench.py attaches that file to its JSON line, so
the numbers land in the round's BENCH record.

The bucketed design's promise is near-linear growth: 10× the rows may
cost ~10× the shuffle, never ~100× (the quadratic all-pairs shape).
That promise is conditional on the corpus's shingle-DF distribution, so
the proof runs TWO 10× corpora:

- ``sf1-dense`` — the driver testdata's own shape (31-word vocabulary).
  The 3-gram shingle space is ~30 k, so shingle document frequency
  grows LINEARLY with corpus size and candidate pairs quadratically;
  this is the adversarial regime the DF cap + length filter exist for.
- ``sf1-zipf`` — realistic long-tail vocabulary (a Zipf tail of rare
  tokens over the same common words, like any natural corpus).  Shingle
  DF is scale-invariant, which is the regime the near-linear claim is
  actually about.

Generation is DISTRIBUTED (mapInPandas, per-row seeding from doc_id) —
the same generator shape would produce the 100 TB corpus; nothing goes
through the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_DOCS = 50_000
N_VECS = 20_000
QUERIES = (
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    # prune-off leg: same inverted-index shape as dedup_ngram_jaccard
    # but with the (Jaccard-only, lossless) length-ratio prune DISABLED
    # — containment semantics forbid it — so the DF cap alone bounds
    # pair volume.  The derived containment_vs_jaccard section below
    # attaches the number to the docstring's "budgets more shuffle than
    # a Jaccard pass" claim (round-5 VERDICT item #5).
    "dedup_containment",
    # LM-build leg: the bigram-LM perplexity scorer is vocabulary-bounded
    # on the dense corpus and vocabulary-growing on the zipf corpus — the
    # two regimes an n-gram LM build meets at 100 TB.
    "text_perplexity_bigram",
    # maintenance-mode leg: the ~10% new batch checked against the
    # standing corpus; compared against dedup_ngram_jaccard (the
    # from-scratch rebuild) in the derived incremental_vs_rebuild
    # section below.
    "dedup_incremental",
    # line-level cleaning leg: the line-DF aggregation is the one
    # corpus-sized shuffle; the boilerplate relation stays tiny on both
    # corpora, so growth should track the line explode (~linear).
    "text_line_filter",
    # tokenizer-training leg: after the corpus-sized word count, all
    # three merge iterations run at VOCABULARY scale — flat on the
    # dense corpus (31-word vocab), vocab-growing on the zipf corpus —
    # the same two regimes as the LM-build leg.
    "text_bpe_train",
    # retrieval leg: the BM25 posting-list build is one explode + hash
    # agg (the only corpus-sized shuffle); scoring touches candidate
    # postings only, so growth should track the posting relation.
    "docs_bm25_search",
    # learned-filter leg: 12 unrolled GD iterations, each ONE corpus
    # scan + a 4-value integer reduction — per-iteration cost should
    # grow linearly and the iteration count is scale-free.
    "quality_logreg_train",
)
ANN_QUERIES = (
    "knn_ivf_lsh",
    "dedup_embedding_lsh",
    # iterative-algorithm leg: Lloyd k-means broadcast-assign/recompute
    "embed_kmeans_lloyd",
    # semantic-dedup leg: map-side broadcast-matrix assign then
    # within-cluster pairwise — quadratic ONLY inside a cluster
    # (SemDeDup's contract), and since round 12 K = ceil(n/64) grows
    # with the corpus (semdedup_k), so cluster sizes — and pair volume
    # per vector — stay bounded: wall and shuffle should grow ~linearly
    # here (the round-11 fixed K=8 measured wall ×19.2 at 10×).
    "embed_semdedup",
    # quantized-ANN legs: codes and integer distance tables move, never
    # floats; candidate volume is nprobe/K (IVF) or the corpus code
    # relation (flat PQ scan + 50-candidate float re-rank).
    "knn_ivf_adc",
    "knn_pq_adc",
)

VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
LANGS = ["en"] * 8 + ["de", "es", "fr", "zh"] * 3  # ≈40 % en, rest even


def generate_corpus(spark, out_dir: str, zipf_tail: bool, n_docs: int) -> None:
    """Word-salad documents matching the testdata distribution:
    10-100 words per doc, 5 langs, 20 sources, ~0.2 % exact duplicates
    plus ~1 % near-duplicates (a copy with one word substituted) so the
    dedup queries have real work at 10×.  ``zipf_tail=False`` uses the
    driver testdata's closed 31-word vocabulary; ``zipf_tail=True``
    replaces ~30 % of tokens with draws from a 200 k rare-token space
    (the long-tail shape every natural corpus has)."""

    def draw_words(rng, n_words: int) -> list:
        words = [VOCAB[i] for i in rng.integers(0, len(VOCAB), n_words)]
        if zipf_tail:
            n_rare = n_words * 3 // 10
            pos = rng.choice(n_words, size=n_rare, replace=False)
            rare = rng.integers(0, 200_000, n_rare)
            for p, r in zip(pos, rare):
                words[p] = f"tok{r:05d}"
        return words

    def build(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                rng = np.random.default_rng(doc_id + 7)
                n_words = int(rng.integers(10, 101))
                words = draw_words(rng, n_words)
                dup_roll = rng.random()
                if doc_id >= 100 and dup_roll < 0.012:
                    # duplicate an earlier doc by re-deriving its words
                    src = int(rng.integers(0, doc_id - 1))
                    rng2 = np.random.default_rng(src + 7)
                    words = draw_words(rng2, int(rng2.integers(10, 101)))
                    if dup_roll >= 0.002:  # near-dup: swap one word
                        words[int(rng.integers(0, len(words)))] = VOCAB[
                            int(rng.integers(0, len(VOCAB)))
                        ]
                text = " ".join(words)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "text": text,
                        "lang": LANGS[int(rng.integers(0, len(LANGS)))],
                        "source": f"src{int(rng.integers(0, 20))}",
                        "n_chars": len(text),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
            )

    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    (
        spark.range(n_docs, numPartitions=32)
        .mapInPandas(build, schema)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )


def generate_embeddings(spark, out_dir: str, n_vecs: int) -> None:
    """Clustered 64-dim float vectors matching the testdata embeddings
    shape (10 label centroids + per-vector noise, L2-normalized), so LSH
    bucketing has the same structure at every size."""

    def build(batches):
        import numpy as np
        import pandas as pd

        cent_rng = np.random.default_rng(42)
        centroids = cent_rng.normal(size=(10, 64))
        centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
        for pdf in batches:
            rows = []
            for vec_id in pdf["id"]:
                rng = np.random.default_rng(vec_id + 11)
                label = int(rng.integers(0, 10))
                v = centroids[label] + 0.35 * rng.normal(size=64)
                v = (v / np.linalg.norm(v)).astype(np.float32)
                rows.append(
                    {"vec_id": vec_id, "embedding": v.tolist(), "label": label}
                )
            yield pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])

    schema = "vec_id bigint, embedding array<float>, label int"
    (
        spark.range(n_vecs, numPartitions=32)
        .mapInPandas(build, schema)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )


def _shuffle_totals(ui_port: int) -> tuple[int, int]:
    """(total shuffle write bytes, total shuffle write records) across
    all completed stages so far, from the Spark status REST API.
    Records are the scaling signal — shuffle BYTES are lz4-compressed,
    so a corpus with repetitive keys (the dense vocabulary) compresses
    far better than a high-entropy one and byte ratios conflate
    compression with volume."""
    base = f"http://localhost:{ui_port}/api/v1"
    try:
        apps = json.load(urllib.request.urlopen(f"{base}/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/applications/{app_id}/stages?status=complete", timeout=10
            )
        )
    except Exception:
        return (0, 0)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
    )


def run_proof() -> dict:
    from reindexer_spark import get_query, get_spark

    # the status REST API is the shuffle-bytes source → UI on for this
    # run.  Retention must exceed the WHOLE run's stage count: the
    # default (1000) evicts early stages mid-run, the "completed
    # stages" total shrinks between snapshots, and deltas go NEGATIVE
    # (first seen round 7 when the 12-iteration logreg leg pushed the
    # run past 1000 stages).
    spark = get_spark(
        "reindexer-scale-proof",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    ui_port = int(spark.conf.get("spark.ui.port", "4040"))

    # Both distributions at BOTH sizes: each 10x growth factor compares a
    # corpus against the same-shaped corpus, never across distributions.
    corpora = []
    for shape, zipf in (("dense", False), ("zipf", True)):
        for size, n in (("5k", N_DOCS // 10), ("50k", N_DOCS)):
            label = f"{shape}-{size}"
            out_dir = os.path.join(REPO, "scaledata", label)
            if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
                print(f"generating {n} docs at {out_dir}", file=sys.stderr)
                generate_corpus(spark, out_dir, zipf_tail=zipf, n_docs=n)
            corpora.append((label, out_dir))

    # Warm the JVM/codegen/file-listing paths once per corpus so the
    # FIRST timed query (historically dedup_minhash on dense-5k) measures
    # the query, not session initialization — same convention as bench.py.
    from reindexer_spark.catalog import load_table

    for _, sf_dir in corpora:
        load_table(spark, sf_dir, "documents").limit(1).count()

    result: dict = {
        "n_docs": {c[0]: (N_DOCS // 10 if "5k" in c[0] else N_DOCS) for c in corpora},
        "note": (
            "growth_at_10x compares 50k docs vs 5k docs of the SAME "
            "distribution (wall sec, shuffle-write records). 'dense' is "
            "the driver testdata's closed 31-word vocabulary, where the "
            "~30k-slot 3-gram shingle space saturates: per-shingle DF "
            "grows linearly with corpus size, so candidate pairs grow "
            "quadratically and the DF-cap/length-filter are what keep "
            "it bounded — the adversarial regime. 'zipf' adds the "
            "long-tail vocabulary every natural corpus has; per-shingle "
            "DF is scale-invariant there, which is the regime the "
            "near-linear design claim is about. Shuffle records, not "
            "bytes, are the scaling signal (bytes are lz4-compressed "
            "and the dense corpus's repetitive keys compress far "
            "better)."
        ),
        "queries": {},
    }
    for name in QUERIES:
        q = get_query(name)
        per_scale: dict = {}
        # Untimed warmup on the smallest corpus: first execution of a
        # query pays Python-worker spin-up / codegen / broadcast-build
        # costs that poisoned legs in past rounds (r4: the emb-2k
        # k-means leg read 5x slower than emb-20k purely from ordering).
        q.fn(spark, corpora[0][1]).write.format("noop").mode(
            "overwrite"
        ).save()
        for label, sf_dir in corpora:
            b0, r0 = _shuffle_totals(ui_port)
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 3)
            b1, r1 = _shuffle_totals(ui_port)
            per_scale[label] = {
                "wall_sec": wall,
                "shuffle_write_mb": round((b1 - b0) / 1e6, 2),
                "shuffle_write_mrec": round((r1 - r0) / 1e6, 3),
            }
        for shape in ("dense", "zipf"):
            a, b = per_scale[f"{shape}-5k"], per_scale[f"{shape}-50k"]
            per_scale[f"growth_at_10x_{shape}"] = {
                "wall": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
                "shuffle_records": round(
                    b["shuffle_write_mrec"] / max(a["shuffle_write_mrec"], 1e-9),
                    2,
                ),
            }
        result["queries"][name] = per_scale
        print(f"{name}: {json.dumps(per_scale)}", file=sys.stderr)

    # Derived: incremental maintenance vs full rebuild.  The claim worth
    # money at 100 TB is not that dedup_incremental is fast — it is that
    # its cost tracks the BATCH (and the batch's corpus-side candidate
    # postings), not the corpus, so the ratio to a full rebuild falls as
    # the corpus grows past the batch.
    inc = result["queries"].get("dedup_incremental")
    full = result["queries"].get("dedup_ngram_jaccard")
    if inc and full:
        result["incremental_vs_rebuild"] = {
            "note": (
                "dedup_incremental cost / dedup_ngram_jaccard rebuild cost "
                "on the same corpus (wall, and shuffle-write records — the "
                "noise-robust signal). At this 10:1 corpus:batch ratio the "
                "semi-join prune's own shuffles are still visible (ratios "
                "near 1 on the cheap zipf rebuild); the ratio falls as the "
                "corpus outgrows the batch — at a production 1000:1 the "
                "prune discards ~all corpus postings before pairing."
            ),
            **{
                label: {
                    "wall": round(
                        inc[label]["wall_sec"]
                        / max(full[label]["wall_sec"], 1e-9),
                        2,
                    ),
                    "shuffle_records": round(
                        inc[label]["shuffle_write_mrec"]
                        / max(full[label]["shuffle_write_mrec"], 1e-9),
                        2,
                    ),
                }
                for label, _ in corpora
            },
        }

    # Derived: the prune-off cost of containment vs the pruned Jaccard
    # path over the SAME corpus — the shuffle-record ratio is the
    # docstring's "budgets more shuffle" claim with a number attached.
    cont = result["queries"].get("dedup_containment")
    jacc = result["queries"].get("dedup_ngram_jaccard")
    if cont and jacc:
        result["containment_vs_jaccard"] = {
            "note": (
                "dedup_containment cost / dedup_ngram_jaccard cost on the "
                "same corpus (wall, shuffle-write records). Containment "
                "disables the lossless length-ratio prune (asymmetric "
                "metric — a small doc inside a big one is exactly the "
                "pair the prune would drop), so every co-occurring pair "
                "under the DF cap aggregates; ratios > 1 quantify the "
                "prune's value, and the dense corpus (saturated shingle "
                "space, prune-heavy) should exceed the zipf one."
            ),
            **{
                label: {
                    "wall": round(
                        cont[label]["wall_sec"]
                        / max(jacc[label]["wall_sec"], 1e-9),
                        2,
                    ),
                    "shuffle_records": round(
                        cont[label]["shuffle_write_mrec"]
                        / max(jacc[label]["shuffle_write_mrec"], 1e-9),
                        2,
                    ),
                }
                for label, _ in corpora
            },
        }

    # Media legs (round-7 VERDICT item #6): the decode-lane operators at
    # 10x clip counts drawn from the SAME dense-50k corpus via doc_id
    # caps, so both scales share one distribution.  The growth signal is
    # clip count; the design claim is that the decode+fingerprint map is
    # the only full-data pass and PAYLOADS NEVER SHUFFLE — shuffle
    # records stay fingerprint/row-sized while wall grows ~linearly with
    # clips.  Caps are smaller than the text legs because every clip
    # pays a pure-Python codec en/decode (FLAC rice coding dominates the
    # audio lane at ~0.2 s/clip single-threaded).
    from pyspark.sql import functions as F

    from reindexer_spark.operators.multimodal import (
        _audio_dedup_core,
        _scene_cut_core,
        _synth_media,
        _synth_scene_video,
    )

    dense50k_dir = dict(corpora)["dense-50k"]
    media_docs = load_table(spark, dense50k_dir, "documents")

    def _audio_at(cap: int):
        return _audio_dedup_core(
            _synth_media(media_docs.filter(F.col("doc_id") < cap)).filter(
                F.col("kind").isin("audio-wav", "audio-flac")
            )
        )

    def _video_at(cap: int):
        return _scene_cut_core(
            _synth_scene_video(media_docs.filter(F.col("doc_id") < cap))
        )

    for name, build, cap_small, cap_big in (
        ("audio_dedup_fingerprint", _audio_at, 200, 2000),
        ("video_scene_cuts", _video_at, 500, 5000),
    ):
        per_scale = {}
        # same untimed warmup convention as the other legs
        build(cap_small).write.format("noop").mode("overwrite").save()
        for cap in (cap_small, cap_big):
            b0, r0 = _shuffle_totals(ui_port)
            t0 = time.perf_counter()
            build(cap).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 3)
            b1, r1 = _shuffle_totals(ui_port)
            per_scale[f"docs-{cap}"] = {
                "wall_sec": wall,
                "shuffle_write_mb": round((b1 - b0) / 1e6, 2),
                "shuffle_write_mrec": round((r1 - r0) / 1e6, 3),
            }
        a, b = per_scale[f"docs-{cap_small}"], per_scale[f"docs-{cap_big}"]
        per_scale["growth_at_10x"] = {
            "wall": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
            "shuffle_records": (
                round(b["shuffle_write_mrec"] / a["shuffle_write_mrec"], 2)
                if a["shuffle_write_mrec"] >= 0.01
                else None
            ),
        }
        result["queries"][name] = per_scale
        print(f"{name}: {json.dumps(per_scale)}", file=sys.stderr)

    # Salted-join leg (round-7 VERDICT item #7): the dq_key_skew
    # remediation, executed on a zipf-KEYED fact relation derived from
    # the zipf corpora.  key = floor(K/(1+u)) with u uniform gives a
    # zipf(2)-shaped key distribution whose hottest key carries ~half
    # the rows — the straggler regime.  Two measurements per scale:
    # the straggler factor (max/mean reducer load at 32 partitions)
    # hash-partitioned on key vs on (key, salt), and the wall + shuffle
    # records of the aggregating join unsalted vs hot-salted.
    result["salted_join"] = _salted_join_leg(spark, corpora, ui_port)
    print(
        f"salted_join: {json.dumps(result['salted_join'])}", file=sys.stderr
    )

    ann_q, ann_n = ann_leg(spark, ui_port)
    result["queries"].update(ann_q)
    result["n_vecs"] = ann_n

    # Hot-bucket guard leg (round-9 VERDICT wrong #1 / next #1).
    result["boilerplate"] = boilerplate_leg(spark, ui_port)
    return result


def ann_leg(spark, ui_port: int) -> tuple[dict, dict]:
    """ANN leg: clustered embeddings at 2k and 20k vectors — the LSH
    bucketed kNN / embedding near-dup scale path."""
    from reindexer_spark import get_query

    queries: dict = {}
    ann_corpora = []
    for label, n in (("emb-2k", N_VECS // 10), ("emb-20k", N_VECS)):
        out_dir = os.path.join(REPO, "scaledata", label)
        if not os.path.exists(os.path.join(out_dir, "embeddings.parquet")):
            print(f"generating {n} vectors at {out_dir}", file=sys.stderr)
            generate_embeddings(spark, out_dir, n)
        ann_corpora.append((label, out_dir))
    n_vecs = {"emb-2k": N_VECS // 10, "emb-20k": N_VECS}
    for name in ANN_QUERIES:
        q = get_query(name)
        per_scale = {}
        # Same untimed warmup convention as the document legs above.
        q.fn(spark, ann_corpora[0][1]).write.format("noop").mode(
            "overwrite"
        ).save()
        for label, sf_dir in ann_corpora:
            b0, r0 = _shuffle_totals(ui_port)
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 3)
            b1, r1 = _shuffle_totals(ui_port)
            per_scale[label] = {
                "wall_sec": wall,
                "shuffle_write_mb": round((b1 - b0) / 1e6, 2),
                "shuffle_write_mrec": round((r1 - r0) / 1e6, 3),
            }
        a, b = per_scale["emb-2k"], per_scale["emb-20k"]
        per_scale["growth_at_10x"] = {
            "wall": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
            # the LSH kNN plans are broadcast-dominant: when neither size
            # produces ≥0.01M shuffle records the ratio is meaningless —
            # null here MEANS "no shuffle to grow", which is the result
            "shuffle_records": (
                round(b["shuffle_write_mrec"] / a["shuffle_write_mrec"], 2)
                if a["shuffle_write_mrec"] >= 0.01
                else None
            ),
        }
        queries[name] = per_scale
        print(f"{name}: {json.dumps(per_scale)}", file=sys.stderr)

    # Round-13 decade extension (round-12 VERDICT next #1): prove the
    # two-level semdedup assignment holds one more decade — emb-200k —
    # with wall growth <= ~3x per 10x and a SUBLINEAR seed collect
    # (kc = ceil(sqrt(ceil(n/64))) rows, the only driver-side collect).
    from reindexer_spark.operators.mlprep import semdedup_k, semdedup_kc

    label, n200 = "emb-200k", N_VECS * 10
    out_dir = os.path.join(REPO, "scaledata", label)
    if not os.path.exists(os.path.join(out_dir, "embeddings.parquet")):
        print(f"generating {n200} vectors at {out_dir}", file=sys.stderr)
        generate_embeddings(spark, out_dir, n200)
    n_vecs[label] = n200
    sem = queries["embed_semdedup"]
    q = get_query("embed_semdedup")
    b0, r0 = _shuffle_totals(ui_port)
    t0 = time.perf_counter()
    q.fn(spark, out_dir).write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 3)
    b1, r1 = _shuffle_totals(ui_port)
    sem[label] = {
        "wall_sec": wall,
        "shuffle_write_mb": round((b1 - b0) / 1e6, 2),
        "shuffle_write_mrec": round((r1 - r0) / 1e6, 3),
    }
    a, b = sem["emb-20k"], sem["emb-200k"]
    sem["growth_at_10x_2nd_decade"] = {
        "wall": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
        "shuffle_records": (
            round(b["shuffle_write_mrec"] / a["shuffle_write_mrec"], 2)
            if a["shuffle_write_mrec"] >= 0.01
            else None
        ),
    }
    sem["seed_collect_rows"] = {
        lbl: semdedup_kc(semdedup_k(nv)) for lbl, nv in n_vecs.items()
    }
    print(f"embed_semdedup (2nd decade): {json.dumps(sem)}", file=sys.stderr)
    return queries, n_vecs


_ZIPF_K = 1000  # key = floor(K/(1+u)): ~2*sqrt(K) distinct keys, hottest ~50%


def _salted_join_leg(spark, corpora, ui_port: int) -> dict:
    from pyspark.sql import functions as F

    from reindexer_spark.catalog import load_table
    from reindexer_spark.functions import dec, dsum
    from reindexer_spark.operators.scalejoin import (
        _NSALT,
        hot_key_relation,
        salt_fact_by_hot_keys,
        salted_hot_join,
    )

    def fact_of(sf_dir):
        return load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("o_orderkey"),
            (
                F.floor(
                    F.lit(_ZIPF_K)
                    / (F.pmod(F.xxhash64("doc_id"), F.lit(_ZIPF_K)) + 1)
                )
            ).alias("o_custkey"),
            ((F.col("n_chars") % 50) + 1)
            .cast("decimal(12,2)")
            .alias("o_totalprice"),
        )

    dim = spark.range(1, _ZIPF_K + 1).select(
        F.col("id").alias("c_custkey"),
        (F.col("id") % 25).cast("int").alias("c_nationkey"),
    )
    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("N"), F.col("id")).alias("n_name"),
    )

    def straggler(df, *cols) -> float:
        loads = [
            r["n"]
            for r in df.repartition(32, *cols)
            .groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        return round(max(loads) / (sum(loads) / 32), 2)

    def timed(df) -> tuple[float, float]:
        b0, r0 = _shuffle_totals(ui_port)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        b1, r1 = _shuffle_totals(ui_port)
        return wall, round((r1 - r0) / 1e6, 3)

    out: dict = {
        "note": (
            "dq_key_skew remediation on a zipf(2)-keyed fact (hottest "
            "key ~50% of rows). straggler = max/mean reducer load at 32 "
            "hash partitions; the salted key spreads the hot key across "
            "NSALT reducers so the factor should fall toward 1+NSALT "
            "overhead while the unsalted factor sits near 16 (half the "
            "corpus on one reducer). unsalted/salted joins are the SAME "
            "aggregation (shuffle_hash, no broadcast escape); equal "
            "results are asserted, walls compare the straggler cost."
        )
    }
    # warmup (same convention as the other legs)
    salted_hot_join(fact_of(corpora[0][1]), dim, nation).write.format(
        "noop"
    ).mode("overwrite").save()
    for label, sf_dir in corpora:
        if not label.startswith("zipf"):
            continue
        fact = fact_of(sf_dir)
        unsalted = (
            fact.join(
                dim.hint("shuffle_hash"),
                fact.o_custkey == dim.c_custkey,
            )
            .join(F.broadcast(nation), dim.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(
                F.count("*").cast("bigint").alias("order_cnt"),
                dsum(dec("o_totalprice"), "total_revenue"),
            )
        )
        salted = salted_hot_join(fact, dim, nation)
        u_wall, u_rec = timed(unsalted)
        s_wall, s_rec = timed(salted)
        # equal output — salting must be a semantic no-op
        u_rows = {
            (r["n_name"], r["order_cnt"], r["total_revenue"])
            for r in unsalted.collect()
        }
        s_rows = {
            (r["n_name"], r["order_cnt"], r["total_revenue"])
            for r in salted.select(
                "n_name", "order_cnt", "total_revenue"
            ).collect()
        }
        if u_rows != s_rows:
            raise RuntimeError(f"salted join diverged on {label}")
        # straggler metric uses the remediation's ACTUAL partitioning
        # key: hot-only salt, cold keys pinned to 0
        salted_fact = salt_fact_by_hot_keys(
            fact, "o_custkey", "o_orderkey",
            hot_key_relation(fact, "o_custkey"), _NSALT,
        )
        out[label] = {
            "straggler_unsalted": straggler(fact, "o_custkey"),
            "straggler_salted": straggler(salted_fact, "o_custkey", "salt"),
            "unsalted": {"wall_sec": u_wall, "shuffle_write_mrec": u_rec},
            "salted": {"wall_sec": s_wall, "shuffle_write_mrec": s_rec},
        }
    return out


def generate_boiler_corpus(spark, out_dir: str, n_docs: int) -> None:
    """Boilerplate-heavy corpus (round-9 VERDICT wrong #1's failure
    shape): 5% of documents are near-identical re-crawls — 5 fixed
    'pages' of 40 cluster-unique tokens whose LAST token rotates per
    crawl (the timestamp), so a cluster's docs share ~36 of 40 shingles
    (Jaccard ≈ 0.9) and, mostly, every MinHash band.  Cluster size
    grows WITH the corpus (re-crawls accumulate linearly in a rolling
    crawl), which is exactly the regime where the unguarded band join
    went quadratic while staying under the shingle DF cap.  The other
    95% are the zipf word-salad shape."""

    def build(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                rng = np.random.default_rng(doc_id + 7)
                if doc_id % 20 == 0:  # boilerplate re-crawl
                    cluster = (doc_id // 20) % 5
                    crng = np.random.default_rng(900_000 + cluster)
                    words = [
                        f"btok{cluster}x{int(t):05d}"
                        for t in crng.integers(0, 200_000, 40)
                    ]
                    words[-1] = f"ts{doc_id:08d}"
                else:
                    n_words = int(rng.integers(10, 101))
                    words = [
                        VOCAB[i] for i in rng.integers(0, len(VOCAB), n_words)
                    ]
                    n_rare = len(words) * 3 // 10
                    pos = rng.choice(len(words), size=n_rare, replace=False)
                    rare = rng.integers(0, 200_000, n_rare)
                    for p, r in zip(pos, rare):
                        words[p] = f"tok{r:05d}"
                text = " ".join(words)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "text": text,
                        "lang": LANGS[int(rng.integers(0, len(LANGS)))],
                        "source": f"src{int(rng.integers(0, 20))}",
                        "n_chars": len(text),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
            )

    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    (
        spark.range(n_docs, numPartitions=32)
        .mapInPandas(build, schema)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )


def boilerplate_leg(spark, ui_port: int) -> dict:
    """The hot-bucket guard's proof: candidate volume of the MinHash
    band join, guard on vs off, as boilerplate clusters grow 10× (50 →
    500 members per page; the 500-member bucket is above
    HOT_BUCKET_CAP=256 but below the shingle DF cap=1000, i.e. the
    window only the bucket guard covers).  Expected shape: unguarded
    candidates grow ~100× (per-bucket quadratic), guarded candidates
    stay ~flat (star pairs: k-1 per bucket) — and the guarded
    end-to-end dedup_minhash wall grows ~linearly."""
    from pyspark.sql import functions as F  # noqa: F401 (parity w/ legs)

    from reindexer_spark import get_query
    from reindexer_spark.operators.banding import banded_pairs
    from reindexer_spark.operators.dedup import minhash_bands, shingle_table

    corpora = []
    for label, n in (("boiler-5k", N_DOCS // 10), ("boiler-50k", N_DOCS)):
        out_dir = os.path.join(REPO, "scaledata", label)
        if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
            print(f"generating {n} docs at {out_dir}", file=sys.stderr)
            generate_boiler_corpus(spark, out_dir, n)
        corpora.append((label, out_dir))

    out: dict = {
        "note": (
            "5 boilerplate 'pages', each re-crawled with a rotating "
            "timestamp token; cluster size grows with the corpus "
            "(50 -> 500 members), sitting above HOT_BUCKET_CAP (256) "
            "and below the shingle DF cap (1000) at 50k. candidates = "
            "banded_pairs output count over the same minhash_bands "
            "relation, guard on (cap 256) vs off (cap inf). "
            "dedup_minhash rows are the guarded end-to-end query."
        )
    }
    q = get_query("dedup_minhash")
    q.fn(spark, corpora[0][1]).write.format("noop").mode("overwrite").save()
    for label, sf_dir in corpora:
        bands = minhash_bands(shingle_table(spark, sf_dir))
        entry = {}
        for mode, cap in (("guarded", None), ("unguarded", 1 << 62)):
            b0, r0 = _shuffle_totals(ui_port)
            t0 = time.perf_counter()
            n_cand = banded_pairs(
                bands, ("band_id", "band_hash"), "doc_id", cap=cap
            ).count()
            wall = round(time.perf_counter() - t0, 3)
            b1, r1 = _shuffle_totals(ui_port)
            entry[mode] = {
                "candidates": n_cand,
                "wall_sec": wall,
                "shuffle_write_mrec": round((r1 - r0) / 1e6, 3),
            }
        b0, r0 = _shuffle_totals(ui_port)
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        b1, r1 = _shuffle_totals(ui_port)
        entry["dedup_minhash"] = {
            "wall_sec": wall,
            "shuffle_write_mrec": round((r1 - r0) / 1e6, 3),
        }
        out[label] = entry
        print(f"boilerplate {label}: {json.dumps(entry)}", file=sys.stderr)
    small, big = out["boiler-5k"], out["boiler-50k"]
    out["growth_at_10x"] = {
        "candidates_guarded": round(
            big["guarded"]["candidates"]
            / max(small["guarded"]["candidates"], 1),
            2,
        ),
        "candidates_unguarded": round(
            big["unguarded"]["candidates"]
            / max(small["unguarded"]["candidates"], 1),
            2,
        ),
        "dedup_minhash_wall": round(
            big["dedup_minhash"]["wall_sec"]
            / max(small["dedup_minhash"]["wall_sec"], 1e-9),
            2,
        ),
    }
    return out


def minhash_decade_leg(spark, ui_port: int) -> dict:
    """One more decade for the HEADLINE near-dup lane (round-13
    VERDICT next #4): dense-500k / zipf-500k documents for
    ``dedup_minhash``, mirroring the round-13 emb-200k extension.
    The hot-bucket cap's dense-regime claim was proven at one decade
    (5k→50k, wall ×2.48); the saturated-shingle boilerplate regime is
    exactly where the next decade could bend, so this leg measures
    50k→500k of BOTH distributions in one session (same-session
    ratios — cross-session walls on this VM are ±2× noise; shuffle
    records are the trustworthy signal)."""
    from reindexer_spark import get_query
    from reindexer_spark.catalog import load_table

    q = get_query("dedup_minhash")
    leg: dict = {}
    for shape, zipf in (("dense", False), ("zipf", True)):
        for size, n in (("50k", N_DOCS), ("500k", N_DOCS * 10)):
            label = f"{shape}-{size}"
            out_dir = os.path.join(REPO, "scaledata", label)
            if not os.path.exists(
                os.path.join(out_dir, "documents.parquet")
            ):
                print(f"generating {n} docs at {out_dir}", file=sys.stderr)
                generate_corpus(spark, out_dir, zipf_tail=zipf, n_docs=n)
            load_table(spark, out_dir, "documents").limit(1).count()
            if not leg:
                # untimed warmup before the first timed leg (Python
                # worker spin-up / codegen — the run_proof convention)
                q.fn(spark, out_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            b0, r0 = _shuffle_totals(ui_port)
            t0 = time.perf_counter()
            q.fn(spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.perf_counter() - t0, 3)
            b1, r1 = _shuffle_totals(ui_port)
            leg[label] = {
                "wall_sec": wall,
                "shuffle_write_mb": round((b1 - b0) / 1e6, 2),
                "shuffle_write_mrec": round((r1 - r0) / 1e6, 3),
            }
            print(f"dedup_minhash {label}: {json.dumps(leg[label])}",
                  file=sys.stderr)
    for shape in ("dense", "zipf"):
        a, b = leg[f"{shape}-50k"], leg[f"{shape}-500k"]
        leg[f"growth_at_2nd_10x_{shape}"] = {
            "wall": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
            "shuffle_records": round(
                b["shuffle_write_mrec"]
                / max(a["shuffle_write_mrec"], 1e-9),
                2,
            ),
        }
    return leg


def cdc_decade_leg(spark, ui_port: int) -> dict:
    """Scale legs for ``dedup_cdc_chunks`` (round 14): the chunker is
    one JVM pass and the dedup is two hash shuffles of 16-byte chunk
    hashes, so BOTH distributions should grow linearly in rows — the
    dense (boilerplate-heavy) corpus maximizes chunk sharing, the
    canonical worst case for pair-based lanes, and must NOT bend here
    because chunk-hash joins fan out 1:1 per instance.  Measures
    5k -> 50k on both shapes and a 2nd decade (50k -> 500k) on BOTH
    (the dense 2nd decade is round-15 VERDICT ask #7: dense is where
    shared-chunk fan-in concentrates, so the 1:1-join claim must be
    proven a decade up there too)."""
    from reindexer_spark import get_query
    from reindexer_spark.catalog import load_table

    q = get_query("dedup_cdc_chunks")
    legs = [
        ("dense-5k", False, N_DOCS // 10),
        ("dense-50k", False, N_DOCS),
        ("dense-500k", False, N_DOCS * 10),
        ("zipf-5k", True, N_DOCS // 10),
        ("zipf-50k", True, N_DOCS),
        ("zipf-500k", True, N_DOCS * 10),
    ]
    leg: dict = {}
    for label, zipf, n in legs:
        out_dir = os.path.join(REPO, "scaledata", label)
        if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
            print(f"generating {n} docs at {out_dir}", file=sys.stderr)
            generate_corpus(spark, out_dir, zipf_tail=zipf, n_docs=n)
        load_table(spark, out_dir, "documents").limit(1).count()
        if not leg:
            q.fn(spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # untimed warmup (worker spin-up convention)
        b0, r0 = _shuffle_totals(ui_port)
        t0 = time.perf_counter()
        q.fn(spark, out_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        b1, r1 = _shuffle_totals(ui_port)
        leg[label] = {
            "wall_sec": wall,
            "shuffle_write_mb": round((b1 - b0) / 1e6, 2),
            "shuffle_write_mrec": round((r1 - r0) / 1e6, 3),
        }
        print(f"dedup_cdc_chunks {label}: {json.dumps(leg[label])}",
              file=sys.stderr)
    for a_l, b_l, name in (
        ("dense-5k", "dense-50k", "growth_at_10x_dense"),
        ("dense-50k", "dense-500k", "growth_at_2nd_10x_dense"),
        ("zipf-5k", "zipf-50k", "growth_at_10x_zipf"),
        ("zipf-50k", "zipf-500k", "growth_at_2nd_10x_zipf"),
    ):
        a, b = leg[a_l], leg[b_l]
        leg[name] = {
            "wall": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
            "shuffle_records": round(
                b["shuffle_write_mrec"]
                / max(a["shuffle_write_mrec"], 1e-9),
                2,
            ),
        }
    return leg


def gear_cdc_leg(spark, ui_port: int) -> dict:
    """Scale + speed legs for ``dedup_cdc_gear`` (round 15): the gear
    rolling fold replaces the md5 twin's per-position digests, so its
    wall should sit well UNDER the md5 lane's on the same corpora
    while the shuffle profile stays identical in shape (only chunk
    hashes shuffle, 1:1 fan-out).  Records both decades on both
    distributions plus the md5/gear wall ratio where the md5 legs
    exist in SCALE_PROOF.json."""
    from reindexer_spark import get_query
    from reindexer_spark.catalog import load_table

    q = get_query("dedup_cdc_gear")
    legs = [
        ("dense-50k", False, N_DOCS),
        ("dense-500k", False, N_DOCS * 10),
        ("zipf-50k", True, N_DOCS),
        ("zipf-500k", True, N_DOCS * 10),
    ]
    leg: dict = {}
    for label, zipf, n in legs:
        out_dir = os.path.join(REPO, "scaledata", label)
        if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
            print(f"generating {n} docs at {out_dir}", file=sys.stderr)
            generate_corpus(spark, out_dir, zipf_tail=zipf, n_docs=n)
        load_table(spark, out_dir, "documents").limit(1).count()
        if not leg:
            q.fn(spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # untimed warmup (worker spin-up convention)
        b0, r0 = _shuffle_totals(ui_port)
        t0 = time.perf_counter()
        q.fn(spark, out_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        b1, r1 = _shuffle_totals(ui_port)
        leg[label] = {
            "wall_sec": wall,
            "shuffle_write_mb": round((b1 - b0) / 1e6, 2),
            "shuffle_write_mrec": round((r1 - r0) / 1e6, 3),
        }
        print(f"dedup_cdc_gear {label}: {json.dumps(leg[label])}",
              file=sys.stderr)
    for a_l, b_l, name in (
        ("dense-50k", "dense-500k", "growth_at_2nd_10x_dense"),
        ("zipf-50k", "zipf-500k", "growth_at_2nd_10x_zipf"),
    ):
        a, b = leg[a_l], leg[b_l]
        leg[name] = {
            "wall": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
            "shuffle_records": round(
                b["shuffle_write_mrec"]
                / max(a["shuffle_write_mrec"], 1e-9),
                2,
            ),
        }
    return leg


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "cdc":
        # merge-only mode: the dedup_cdc_chunks scale legs alone
        from reindexer_spark import get_spark

        spark = get_spark(
            "reindexer-scale-proof",
            extra_conf={
                "spark.ui.enabled": "true",
                "spark.ui.retainedStages": "100000",
                "spark.ui.retainedJobs": "50000",
            },
        )
        ui_port = int(spark.conf.get("spark.ui.port", "4040"))
        out = os.path.join(REPO, "SCALE_PROOF.json")
        try:
            with open(out) as fh:
                result = json.load(fh)
        except (OSError, json.JSONDecodeError):
            result = {}
        leg = cdc_decade_leg(spark, ui_port)
        result.setdefault("queries", {}).setdefault(
            "dedup_cdc_chunks", {}
        ).update(leg)
        gleg = gear_cdc_leg(spark, ui_port)
        # headline-vs-twin speed: gear's whole-lane wall vs md5's on
        # the same corpora (chunking is the only difference)
        for lbl in ("dense-500k", "zipf-500k"):
            if lbl in leg and lbl in gleg:
                gleg[f"md5_wall_over_gear_{lbl}"] = round(
                    leg[lbl]["wall_sec"]
                    / max(gleg[lbl]["wall_sec"], 1e-9),
                    2,
                )
        result["queries"].setdefault("dedup_cdc_gear", {}).update(gleg)
        with open(out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(json.dumps(leg))
        print(json.dumps(gleg))
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "minhash":
        # merge-only mode: the 2nd-decade dedup_minhash leg alone
        from reindexer_spark import get_spark

        spark = get_spark(
            "reindexer-scale-proof",
            extra_conf={
                "spark.ui.enabled": "true",
                "spark.ui.retainedStages": "100000",
                "spark.ui.retainedJobs": "50000",
            },
        )
        ui_port = int(spark.conf.get("spark.ui.port", "4040"))
        out = os.path.join(REPO, "SCALE_PROOF.json")
        try:
            with open(out) as fh:
                result = json.load(fh)
        except (OSError, json.JSONDecodeError):
            result = {}
        leg = minhash_decade_leg(spark, ui_port)
        result.setdefault("queries", {}).setdefault(
            "dedup_minhash", {}
        ).update(leg)
        with open(out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(json.dumps(leg))
        return 0
    if len(sys.argv) > 1 and sys.argv[1] in ("boiler", "ann"):
        # merge-only modes: refresh JUST the named leg
        from reindexer_spark import get_spark

        spark = get_spark(
            "reindexer-scale-proof",
            extra_conf={
                "spark.ui.enabled": "true",
                "spark.ui.retainedStages": "100000",
                "spark.ui.retainedJobs": "50000",
            },
        )
        ui_port = int(spark.conf.get("spark.ui.port", "4040"))
        out = os.path.join(REPO, "SCALE_PROOF.json")
        try:
            with open(out) as fh:
                result = json.load(fh)
        except (OSError, json.JSONDecodeError):
            result = {}
        if sys.argv[1] == "boiler":
            result["boilerplate"] = boilerplate_leg(spark, ui_port)
            fresh = result["boilerplate"]
        else:
            ann_q, ann_n = ann_leg(spark, ui_port)
            result.setdefault("queries", {}).update(ann_q)
            result["n_vecs"] = ann_n
            fresh = ann_q
        with open(out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(json.dumps(fresh))
        return 0
    result = run_proof()
    out = os.path.join(REPO, "SCALE_PROOF.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
