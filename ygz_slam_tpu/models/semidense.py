"""Semi-dense direct tracking (SEMI_DENSE_DIRECT VO / SEMI_DENSE map).

The reference's legacy System facade declares SEMI_DENSE_DIRECT
("semi-dense method, like LSD", include/ygz/system.h:29) and a
SEMI_DENSE map type (system.h:35) but implements neither.  This module
provides both, TPU-native:

- keyframes carry a fixed-capacity set of high-gradient pixels
  (LSD-style pixel selection: Sobel magnitude + per-grid-cell argmax,
  reusing the FAST detector's grid machinery) with per-pixel Bayesian
  inverse-depth seeds (the SVO depth filter, map/depth_filter.py);
- per-frame pose tracking runs the SAME sparse-direct whole-frame
  alignment kernel over [keyframe features + gradient pixels], i.e.
  the point set is denser but the compute path is unchanged (one
  Pallas-windowed GN per pyramid level);
- converged seeds form the semi-dense map: per-keyframe (pixel,
  depth) tables that back-project to a world point cloud.

Everything is fixed shape: M gradient pixels per keyframe, masked.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..ops import fast as fast_mod
from ..map import depth_filter as dfilt


def select_gradient_pixels(
    img: jnp.ndarray,
    cell: int = 8,
    budget: int = 512,
    min_grad: float = 8.0,
    margin: int = 8,
):
    """LSD-style high-gradient pixel selection: Sobel magnitude,
    one best pixel per grid cell, top-`budget` overall.

    Returns (px [M, 2] float32, valid [M] bool)."""
    gx = (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1)) * 0.5
    gy = (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0)) * 0.5
    mag = jnp.sqrt(gx * gx + gy * gy)
    H, W = img.shape
    yy, xx = jnp.mgrid[0:H, 0:W]
    interior = (
        (xx >= margin) & (xx < W - margin)
        & (yy >= margin) & (yy < H - margin)
    )
    mag = jnp.where(interior, mag, 0.0)
    c = fast_mod.grid_select(mag, mag > min_grad, cell, budget)
    return c.xy, c.mask


class SemiDensePoints(NamedTuple):
    """Gradient-pixel set of one keyframe with depth seeds."""

    px: jnp.ndarray          # [M, 2] pixels in the keyframe
    seeds: dfilt.Seeds       # Bayesian inverse-depth seeds over px
    kf_slot: jnp.ndarray     # scalar int32

    @staticmethod
    def init(img, kf_slot: int, depth_mean: float, depth_min: float,
             cell: int = 8, budget: int = 512, min_grad: float = 8.0):
        px, valid = select_gradient_pixels(
            img, cell=cell, budget=budget, min_grad=min_grad
        )
        seeds = dfilt.Seeds.init(
            px, valid, depth_mean=depth_mean, depth_min=depth_min
        )
        return SemiDensePoints(
            px=px, seeds=seeds, kf_slot=jnp.asarray(kf_slot, jnp.int32)
        )

    def usable(self, max_rel_sigma: float = 0.25) -> jnp.ndarray:
        """Seeds certain enough to contribute to direct alignment:
        relative inverse-depth std below `max_rel_sigma`."""
        s = self.seeds
        rel = jnp.sqrt(s.sigma2) / jnp.maximum(jnp.abs(s.mu), 1e-6)
        return s.valid & (rel < max_rel_sigma)

    def depths(self) -> jnp.ndarray:
        return self.seeds.depth()


def update(sd: SemiDensePoints, kf_img, cur_img, cam,
           T_cur_kf: SE3) -> SemiDensePoints:
    """Refine the gradient-pixel seeds against an ordinary frame
    (DepthFilter::UpdateSeeds over the semi-dense set)."""
    seeds = dfilt.update_seeds_from_frame(
        sd.seeds, kf_img, cur_img, cam, T_cur_kf
    )
    return sd._replace(seeds=seeds)


def alignment_point_set(
    sd: SemiDensePoints,
    feat_px,        # [F, 2] keyframe feature pixels
    feat_depth,     # [F]
    feat_valid,     # [F]
):
    """Union point set for semi-dense whole-frame alignment: the
    keyframe's landmark-linked features (accurate depths) plus its
    usable gradient pixels (seed depths).  Returns (px [F+M, 2],
    depth [F+M], mask [F+M])."""
    px = jnp.concatenate([feat_px, sd.px])
    depth = jnp.concatenate([feat_depth, sd.depths()])
    mask = jnp.concatenate(
        [feat_valid & (feat_depth > 0), sd.usable()]
    )
    return px, depth, mask


def export_points(sd: SemiDensePoints, T_kf_cw: SE3, cam,
                  conv_ratio: float = 100.0):
    """Converged seeds -> world points (the SEMI_DENSE map content).

    Returns (points [M, 3] world, valid [M])."""
    conv = sd.seeds.converged(ratio=conv_ratio) & sd.seeds.valid
    pts = cam.pixel_to_world(sd.px, T_kf_cw, depth=sd.depths())
    return pts, conv
