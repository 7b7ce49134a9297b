"""Clustering / segmentation / samplify / neighbor scoring."""
import numpy as np

import mimikit_tpu as mmk


def test_clusterings_produce_labels():
    X = np.random.RandomState(0).rand(80, 6)
    assert len(mmk.ArgMax()(X)) == 80
    assert len(np.unique(mmk.KMeans(n_clusters=5)(X))) == 5
    labels = mmk.GCluster(n_means=4, n_iter=8)(X)
    assert labels.shape == (80,)
    h = mmk.HCluster(max_iter=6)(X)
    assert h.shape[0] == 80 and h.ndim == 2
    q = mmk.QCluster(n_neighbors=6, core_neighborhood_size=4)(X)
    assert q.shape == (80,)


def test_segmentation_finds_structural_cuts():
    # two clearly different regimes -> the novelty score must peak near the
    # boundary
    rng = np.random.RandomState(0)
    a = rng.rand(60, 8) * 0.1
    b = rng.rand(60, 8) * 0.1 + 1.0
    X = np.concatenate([a, b])
    cuts, _, diag = mmk.from_recurrence_matrix(X, kernel_sizes=[6], min_dur=4)
    assert any(abs(int(c) - 60) <= 6 for c in cuts), cuts


def test_samplify_finds_periodic_attacks():
    sig = np.concatenate(
        [
            np.exp(-np.linspace(0, 8, 4000)) * np.sin(np.linspace(0, 600, 4000))
            for _ in range(4)
        ]
    ).astype(np.float32)
    s = mmk.Samplifyer(filter_level=4, sensitivity=0.05)
    labels = s(sig)
    assert labels.max() >= 2  # several segments found
    # cuts land close to the 4000-sample attack grid
    assert all(min(abs(c - k * 4000) for k in range(5)) < 400 for c in s.cuts)


def test_cum_entropy_and_nearest_neighbor():
    X = np.random.rand(12, 4)
    d, nn = mmk.nearest_neighbor(X, X)
    assert np.all(nn == np.arange(12))  # self is the nearest neighbor
    e = mmk.cum_entropy(np.array([0, 1, 2, 3, 4]), neg_diff=False)
    e2 = mmk.cum_entropy(np.array([0, 0, 0, 0, 0]), neg_diff=False)
    assert e > e2  # diverse sequences score higher


def test_repeat_rate():
    x = np.array([1, 1, 1, 1, 2, 3, 4, 5])
    rr = mmk.repeat_rate(x, 4, 4)
    assert rr[0] == 1.0  # all same
    assert rr[1] == 0.0  # all distinct


def test_dtw_subsequence():
    from mimikit_tpu.extract.segment import dtw

    C = np.ones((4, 10))
    C[:, 3:7] = 0.0  # cheap diagonal inside
    D, path = dtw(C, subseq=True)
    assert path[-1][0] == 3  # full query consumed
    assert 2 <= path[-1][1] <= 7  # ends inside the cheap band


def test_discontinuity_scores_jax_matches_host():
    from mimikit_tpu.extract.segment import (
        discontinuity_scores,
        discontinuity_scores_jax,
    )

    X = np.abs(np.random.RandomState(0).randn(200, 32)) + 0.1
    host = discontinuity_scores(X, [4, 6])
    dev = np.asarray(discontinuity_scores_jax(X, [4, 6]))
    assert host.shape == dev.shape
    assert np.abs(host - dev).max() < 1e-4
