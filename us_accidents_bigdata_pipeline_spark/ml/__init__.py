from . import features, kmeans, knn, metrics, rf

__all__ = ["features", "kmeans", "knn", "metrics", "rf"]
