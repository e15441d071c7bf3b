"""Pallas TPU kernels for the bandwidth-bound paths.

Kernels live here with XLA fallbacks; each one must justify itself with a
benchmark vs the XLA-only path (SURVEY.md section 7 step 6).
"""

from .upsample_argmax import upsample_argmax

__all__ = ["upsample_argmax"]
