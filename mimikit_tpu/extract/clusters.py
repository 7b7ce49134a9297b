"""Clustering functionals for the clusterizer app.

Rebuild of ``/root/reference/mimikit/extract/clusters.py``: QCluster (kNN
in-degree cores + connected components), GCluster (optimized "grid of
means" — optax Adam on device instead of torch), HCluster (iterative
nearest-merge hierarchy), ArgMax, and sklearn wrappers.
"""
from __future__ import annotations

import dataclasses as dtc
from functools import partial
from typing import Tuple

import numpy as np

from ..features.functionals import Functional, Identity

__all__ = [
    "QCluster",
    "GCluster",
    "HCluster",
    "ArgMax",
    "KMeans",
    "SpectralClustering",
    "distance_matrices",
    "cluster",
]


class _LabelingMixin:
    """Shared surface of every clustering functional: ``fit`` stores
    ``labels_``/``K_``; calling it runs fit and returns the labels."""

    def np_func(self, inputs):
        self.fit(np.asarray(inputs))
        return self.labels_

    @property
    def inv(self) -> "Functional":
        return Identity()


@dtc.dataclass
class QCluster(_LabelingMixin, Functional):
    """Core detection by kNN in-degree quantile, then core-graph connected
    components; non-core points attach to their nearest core."""

    cores_prop: float = 0.5
    n_neighbors: int = 8
    core_neighborhood_size: int = 8
    metric: str = "euclidean"

    def __post_init__(self):
        self.qe = 1 - self.cores_prop
        self.is_core_ = None
        self.labels_ = None
        self.K_ = None

    def fit(self, x):
        from scipy.sparse import csc_matrix
        from scipy.sparse.csgraph import connected_components
        from sklearn.neighbors import KNeighborsTransformer

        self.__post_init__()
        N = x.shape[0]
        n_neighbs = self.n_neighbors or int(np.sqrt(N))
        k = self.core_neighborhood_size or int(self.qe * n_neighbs)

        kn = KNeighborsTransformer(
            mode="distance", n_neighbors=n_neighbs, metric=self.metric
        )
        adj = kn.fit_transform(x).tolil()
        rg = np.arange(adj.shape[0])
        adj[rg, rg] = 0.0
        in_degree = (adj.tocsc() > 0).sum(axis=0).A.reshape(-1)
        is_core = in_degree >= np.quantile(in_degree, self.qe)
        cores_idx = is_core.nonzero()[0]

        asub = kn.kneighbors_graph(
            x[is_core], n_neighbors=min(k + 1, len(cores_idx)), mode="distance"
        ).tocoo()
        core_set = set(cores_idx.tolist())
        adj_c = csc_matrix(
            (
                np.asarray([c in core_set for c in asub.col], dtype=float),
                (cores_idx[asub.row], asub.col),
            ),
            shape=adj.shape,
        )
        adj_c = (adj_c > 0).tolil()

        disconnected = (
            adj_c.tocsc()[:, cores_idx].tocsr().sum(axis=1).A.reshape(-1) == 0
        )
        cores_est = KNeighborsTransformer(
            mode="distance", n_neighbors=min(2, len(cores_idx)), metric=self.metric
        ).fit(x[is_core])
        nearest = cores_est.kneighbors(x[disconnected], return_distance=False)
        nearest = cores_idx[nearest]
        for i, cores in zip(rg[disconnected], nearest):
            nearest_core = next((n for n in cores if n != i), cores[0])
            adj_c[i, nearest_core] = True

        K, labels = connected_components(adj_c)
        self.K_, self.labels_, self.is_core_ = K, labels, is_core
        return self


@dtc.dataclass
class GCluster(_LabelingMixin, Functional):
    """'Grid of means': Adam-optimized means minimizing mean distance to the
    data minus half their spread, then greedy best-match label assignment.
    The optimization loop runs jitted on device (optax Adam)."""

    n_means: int = 16
    n_iter: int = 128
    lr: float = 0.025
    betas: Tuple[float, float] = (0.05, 0.05)
    metric: str = "cosine"
    eps: float = 1e-6

    def __post_init__(self):
        self.K_ = None
        self.labels_ = None
        self.losses_ = None

    def _dist(self, H, X):
        import jax.numpy as jnp

        if self.metric == "euclidean":
            return jnp.sqrt(
                jnp.maximum(
                    ((H[:, None, :] - X[None, :, :]) ** 2).sum(-1), 1e-12
                )
            )
        from ..modules.loss_functions import AngularDistance

        return AngularDistance(eps=self.eps, reduction="none")(H, X)

    def fit(self, x):
        import jax
        import jax.numpy as jnp
        import optax
        from sklearn.metrics import pairwise_distances as pwd

        self.__post_init__()
        X = jnp.asarray(x, jnp.float32)
        rng = np.random.RandomState(0)
        H0 = X[jnp.asarray(rng.randint(0, x.shape[0], self.n_means))]
        tx = optax.adam(self.lr, b1=self.betas[0], b2=self.betas[1])

        def loss_fn(H):
            return self._dist(H, X).mean() - 0.5 * self._dist(H, H).mean()

        @jax.jit
        def step(H, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(H)
            updates, opt_state = tx.update(grads, opt_state, H)
            return optax.apply_updates(H, updates), opt_state, loss

        H, opt_state = H0, tx.init(H0)
        losses = []
        for _ in range(self.n_iter):
            H, opt_state, loss = step(H, opt_state)
            losses.append(float(loss))
        h = np.asarray(H)
        DXH = pwd(h, np.asarray(x), self.metric)
        hi, xi = np.unravel_index(DXH.argsort(None), DXH.shape)
        labels = np.zeros(x.shape[0], dtype=int)
        got = set()
        for label, i in zip(hi.flat, xi.flat):
            if i not in got:
                labels[i] = label
                got.add(i)
        self.losses_ = losses
        self.K_ = self.n_means
        self.labels_ = labels
        return self


@dtc.dataclass
class HCluster(_LabelingMixin, Functional):
    """Iterative nearest-merge hierarchy; labels matrix over levels."""

    max_iter: int = 32
    metric: str = "cosine"

    def __post_init__(self):
        self.K_ = None
        self.labels_ = None

    def fit(self, x):
        from scipy.sparse.csgraph import connected_components
        from sklearn.metrics import pairwise_distances as pwd

        Da = pwd(x, x, self.metric)
        xa = x.copy()
        Da[Da == 0] = np.inf
        LBS = np.zeros((x.shape[0], self.max_iter), dtype=int)
        for i in range(self.max_iter):
            adj = np.zeros_like(Da, dtype=bool)
            nearest = Da.argmin(axis=1)
            adj[np.arange(Da.shape[0]), nearest] = True
            K, labels = connected_components(adj)
            if i == 0:
                LBS[:, 0] = labels
            else:
                LBS[:, i] = labels[LBS[:, i - 1]]
            xa = np.stack([xa[labels == c].mean(axis=0) for c in range(K)])
            Da = pwd(xa, xa, metric=self.metric)
            Da[Da == 0] = np.inf
            if K == 1:
                LBS = LBS[:, : i + 1]
                self.K_ = i + 1
                break
        self.labels_ = LBS
        return self


@dtc.dataclass
class ArgMax(_LabelingMixin, Functional):
    def __post_init__(self):
        self.labels_ = None
        self.K_ = None

    def fit(self, X):
        uniques, self.labels_ = np.unique(
            np.argmax(X, axis=1), return_inverse=True
        )
        self.K_ = len(uniques)
        return self


@dtc.dataclass
class KMeans(_LabelingMixin, Functional):
    n_clusters: int = 16
    n_init: int = 2
    max_iter: int = 100
    random_seed: int = 42

    def fit(self, X):
        import sklearn.cluster as C

        est = C.KMeans(
            n_clusters=self.n_clusters,
            n_init=self.n_init,
            max_iter=self.max_iter,
            random_state=self.random_seed,
        ).fit(np.ascontiguousarray(X))
        self._est = est
        self.labels_ = est.labels_
        self.K_ = self.n_clusters
        return self


@dtc.dataclass
class SpectralClustering(_LabelingMixin, Functional):
    n_clusters: int = 8
    n_init: int = 10
    n_neighbors: int = 10
    random_seed: int = 42

    def fit(self, X):
        import sklearn.cluster as C

        est = C.SpectralClustering(
            n_clusters=self.n_clusters,
            n_init=self.n_init,
            n_neighbors=self.n_neighbors,
            random_state=self.random_seed,
            affinity="nearest_neighbors",
            assign_labels="discretize",
        ).fit(X)
        self._est = est
        self.labels_ = est.labels_
        self.K_ = self.n_clusters
        return self


def distance_matrices(X, metric="euclidean", n_neighbors=1, radius=1e-3):
    from sklearn.metrics import pairwise_distances as pwd
    from sklearn.neighbors import NearestNeighbors

    Dx = pwd(X, X, metric=metric)
    NN = NearestNeighbors(
        n_neighbors=n_neighbors, radius=radius, metric="precomputed"
    )
    NN.fit(Dx)
    Kx = NN.kneighbors_graph(n_neighbors=n_neighbors, mode="connectivity")
    Rx = NN.radius_neighbors_graph(radius=radius, mode="connectivity")
    return Dx, Kx, Rx


def cluster(X, estimator="argmax", **parameters):
    import sklearn.cluster as C

    estimators = {
        "argmax": partial(ArgMax),
        "kmeans": partial(C.KMeans),
        "qcores": partial(QCluster),
        "spectral": partial(
            C.SpectralClustering,
            affinity="nearest_neighbors",
            assign_labels="discretize",
        ),
        "agglo_ward": partial(
            C.AgglomerativeClustering, linkage="ward", distance_threshold=None
        ),
        "agglo_single": partial(
            C.AgglomerativeClustering,
            metric="precomputed",
            linkage="single",
            distance_threshold=None,
        ),
        "agglo_complete": partial(
            C.AgglomerativeClustering,
            metric="precomputed",
            linkage="complete",
            distance_threshold=None,
        ),
    }
    if estimator in {"agglo_single", "agglo_complete"}:
        X_, _, _ = distance_matrices(X, metric=parameters.pop("metric", "euclidean"))
    else:
        X_ = X
    cls = estimators[estimator](**parameters)
    cls.fit(X_)
    return cls
