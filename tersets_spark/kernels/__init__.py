"""Numpy-vectorized compression kernels (the engine's method catalog).

Each module implements one reference method family; dispatch lives in
:mod:`tersets_spark.kernels.registry`.
"""

from .registry import compress, decompress  # noqa: F401
