"""Image-processing ops: pyramid, FAST/Shi-Tomasi detection, ORB
description, Hamming matching, interpolation — the batched TPU
replacements for libfast/OpenCV/DBoW3-adjacent kernels (SURVEY.md
stage 3+)."""
from . import interp, pyramid, fast, orb, hamming, align, warp, sparse_align

__all__ = [
    "interp",
    "pyramid",
    "fast",
    "orb",
    "hamming",
    "align",
    "warp",
    "sparse_align",
]
