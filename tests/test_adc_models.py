"""Driver-held-model helpers for the ADC lanes (optimization r17).

The knn_ivf_adc / knn_ivfadc_residual rewrites replace crossJoin +
row_number windows with numpy argmax/argsort over collected models.
The oracle gates value-equality end-to-end; these tests pin the TIE
RULES in isolation on constructed ties, where a wrong kind= or a
pairwise-summed dot would silently pick a different (still plausible)
winner.
"""

from __future__ import annotations

import numpy as np

from reindexer_spark.operators.similarity import (
    _probe_lists,
    _seq_dots_floored,
)


def test_seq_dots_floored_matches_sequential_fold():
    rng = np.random.RandomState(20260818)
    em = rng.uniform(-1, 1, size=(50, 64))
    cm = rng.uniform(-1, 1, size=(8, 64))
    q = _seq_dots_floored(em, cm)
    # reference: explicit scalar left-fold per pair (the _dot contract)
    for i in range(5):
        for j in range(cm.shape[0]):
            acc = em[i, 0] * cm[j, 0]
            for d in range(1, 64):
                acc = acc + em[i, d] * cm[j, d]
            assert q[i, j] == np.floor(acc * 1e6)


def test_probe_lists_breaks_ties_on_lower_cluster_id():
    # centroids 3 and 7 are IDENTICAL → every query dots them equally;
    # the probe order must put the LOWER cluster_id first (the window
    # form's ORDER BY floor(dot*1e6) DESC, cluster_id ASC)
    base = [0.25] * 64
    cents = [(cid, list(base)) for cid in (3, 7)]
    cents += [(9, [-1.0] * 64)]
    queries = [(0, [1.0] * 64)]
    out = _probe_lists(queries, sorted(cents), nprobe=3)
    assert out == [(0, 3), (0, 7), (0, 9)]


def test_probe_lists_orders_by_floored_dot_desc():
    cents = sorted(
        [
            (1, [0.5] + [0.0] * 63),
            (2, [0.9] + [0.0] * 63),
            (5, [0.1] + [0.0] * 63),
        ]
    )
    queries = [(0, [2.0] + [0.0] * 63)]
    assert _probe_lists(queries, cents, nprobe=2) == [(0, 2), (0, 1)]
