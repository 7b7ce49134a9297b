"""Clustering config views (reference ``views/clusters.py``)."""
from __future__ import annotations

from .factory import auto_config_view

__all__ = [
    "qcluster_view",
    "gcluster_view",
    "hcluster_view",
    "kmeans_view",
    "spectral_clustering_view",
    "argmax_view",
]


def qcluster_view(cfg):
    return auto_config_view(
        cfg, title="QCluster",
        fields=("cores_prop", "n_neighbors", "core_neighborhood_size", "metric"),
    )


def gcluster_view(cfg):
    return auto_config_view(
        cfg, title="GCluster",
        fields=("n_means", "n_iter", "lr", "metric"),
    )


def hcluster_view(cfg):
    return auto_config_view(cfg, title="HCluster", fields=("max_iter", "metric"))


def kmeans_view(cfg):
    return auto_config_view(
        cfg, title="KMeans", fields=("n_clusters", "n_init", "max_iter")
    )


def spectral_clustering_view(cfg):
    return auto_config_view(
        cfg, title="SpectralClustering",
        fields=("n_clusters", "n_init", "n_neighbors"),
    )


def argmax_view(cfg):
    return auto_config_view(cfg, title="ArgMax", fields=())
