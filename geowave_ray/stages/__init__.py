from . import encode, imaging, join, knn  # noqa: F401
