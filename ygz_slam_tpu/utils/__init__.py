"""Utilities: synthetic photometric scenes, dataset IO, evaluation."""
from . import synthetic

__all__ = ["synthetic"]
