"""Pallas TPU kernels for hot ops (with jnp fallbacks off-TPU)."""
from . import hamming_kernel

__all__ = ["hamming_kernel"]
