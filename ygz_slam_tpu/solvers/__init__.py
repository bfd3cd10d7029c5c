"""Nonlinear solvers: GN/LM engine, robust costs, bundle adjustment.
Replaces the reference's NLLSSolver/RobustCost (SVO/vikit) and the
Ceres/g2o BA backends (SURVEY.md stage 2)."""
from . import robust, nlls, ba, initializer
from .nlls import gauss_newton, levenberg_marquardt
from .initializer import initialize_two_view, ransac_hf
from .ba import (
    Observations,
    pose_only_ba,
    point_only_ba,
    optimize_current,
    local_ba,
    two_view_ba,
)

__all__ = [
    "robust",
    "nlls",
    "ba",
    "gauss_newton",
    "levenberg_marquardt",
    "Observations",
    "pose_only_ba",
    "point_only_ba",
    "optimize_current",
    "local_ba",
    "two_view_ba",
]
