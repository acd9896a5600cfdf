"""tersets_spark — a PySpark-native time-series rollup / downsample /
retention engine with TerseTS's compression catalog as vectorized
numpy/Arrow kernels.

Public single-series API mirrors the reference's four entry points
(/root/reference/src/tersets.zig:118-791): ``compress``, ``decompress``,
``extract``, ``rebuild``. The Spark-level API lives in
:mod:`tersets_spark.operators` and :mod:`tersets_spark.sources`.
"""

from .methods import Method, Config  # noqa: F401
from .kernels.registry import compress, decompress  # noqa: F401
from .kernels.extract import extract, rebuild  # noqa: F401

__version__ = "0.1.0"
