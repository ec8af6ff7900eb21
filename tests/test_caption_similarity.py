"""caption_similarity — integer cosine-threshold predicate."""

from __future__ import annotations

import numpy as np


def _keep_int(iv: np.ndarray, tv: np.ndarray) -> bool:
    dot = int(np.dot(iv, tv))
    na2 = int(np.dot(iv, iv))
    nb2 = int(np.dot(tv, tv))
    return dot > 0 and dot * dot * 10000 >= 784 * na2 * nb2


def test_integer_predicate_equals_float_cosine_threshold():
    # dot>0 and dot^2*10000 >= 784*|a|^2*|b|^2  <=>  cos >= 0.28
    # on the quantized vectors; check against float cosine away from
    # the exact boundary.
    rng = np.random.RandomState(7)
    for _ in range(500):
        a = np.round(rng.uniform(-0.6, 0.6, 64) * 1000).astype(np.int64)
        b = np.round(rng.uniform(-0.6, 0.6, 64) * 1000).astype(np.int64)
        cos = float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        )
        if abs(cos - 0.28) < 1e-6:
            continue
        assert _keep_int(a, b) == (cos >= 0.28), cos


def test_boundary_exact_equality_kept():
    # engineered pair with cos exactly 0.28: a=(25,0), b=(7,24) ->
    # dot=175, |a|=25, |b|=25, cos=0.28 -> kept (>=).
    a = np.zeros(64, dtype=np.int64)
    b = np.zeros(64, dtype=np.int64)
    a[0] = 25
    b[0], b[1] = 7, 24
    assert _keep_int(a, b)


def test_negative_dot_never_kept():
    a = np.full(64, 10, dtype=np.int64)
    assert not _keep_int(a, -a)
