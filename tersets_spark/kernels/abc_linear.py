"""ABC linear approximation (method 9) — optimal L∞ PLA per segment
(Dalai & Leonardi 2006).

Reference semantics:
/root/reference/src/lossy_compression/functional_approximation/abc_linear_approximation.zig:55-
— per greedy segment, the optimal minimax line found by the A,B,C point
search on the convex hull.

The engine's Slide kernel already computes exactly this object — the
Chebyshev-optimal line per longest-feasible segment via hull edges
(segmentation.cheb_fit); ABC registers the same greedy-optimal
segmentation under its own method code and triple payload. (The
reference's Slide differs from ABC only in its *online* filtering
construction; both yield L∞-optimal lines per segment, which is the
semantic contract the engine guarantees.)
"""

from __future__ import annotations

from ..methods import Method
from .registry import register
from .swing_slide import compress_slide, decompress_triples

register(Method.ABCLinearApproximation, compress_slide, decompress_triples)
