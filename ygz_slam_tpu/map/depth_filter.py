"""Batched Bayesian depth filter (SVO-style seeds).

TPU-native replacement for the reference's legacy DepthFilter + Seed
(include/ygz/optimizer.h:84-200; src/optimizer.cpp:439-755): each
keyframe feature without depth carries a Seed modeling inverse depth
as a Gaussian(mu, sigma2) mixed with a uniform outlier component via a
Beta(a, b) inlier ratio; every ordinary frame updates all seeds.

The reference planned (and never wired) a dedicated thread
(UpdateSeedsLoop stub, optimizer.cpp:542-545).  Here the whole seed
table updates in one jitted pass per frame:
  1. epipolar search for each seed in the new frame (align1d along the
     epipolar line, replacing FindEpipolarMatchDirect + ZMSSD's
     hand-SSE patch scorer, utils.h:269-465),
  2. triangulated depth observation + tau uncertainty (ComputeTau,
     optimizer.cpp:724-740),
  3. the Vogiatzis Gaussian-Beta posterior update (UpdateSeed,
     optimizer.cpp:690-722).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..geometry.triangulation import depth_from_triangulation
from ..ops.align import align1d
from ..ops.interp import sample_patches, in_bounds


class Seeds(NamedTuple):
    """Per-feature inverse-depth seeds (fixed capacity, masked)."""

    px: jnp.ndarray        # [N, 2] pixel in the owning keyframe
    a: jnp.ndarray         # [N] Beta inlier count
    b: jnp.ndarray         # [N] Beta outlier count
    mu: jnp.ndarray        # [N] inverse-depth mean
    z_range: jnp.ndarray   # [N] scene inverse-depth range
    sigma2: jnp.ndarray    # [N] inverse-depth variance
    valid: jnp.ndarray     # [N]

    @staticmethod
    def init(px, valid, depth_mean: float, depth_min: float):
        """Seed::Seed (optimizer.h:93-104): mu = 1/depth_mean,
        z_range = 1/depth_min, sigma2 = (z_range/6)^2."""
        n = px.shape[0]
        mu = jnp.full(n, 1.0 / depth_mean, jnp.float32)
        z_range = jnp.full(n, 1.0 / depth_min, jnp.float32)
        return Seeds(
            px=px,
            a=jnp.full(n, 10.0, jnp.float32),
            b=jnp.full(n, 10.0, jnp.float32),
            mu=mu,
            z_range=z_range,
            sigma2=(z_range / 6.0) ** 2,
            valid=valid,
        )

    def depth(self) -> jnp.ndarray:
        return 1.0 / jnp.maximum(self.mu, 1e-6)

    def converged(self, ratio: float = 200.0) -> jnp.ndarray:
        """Seed accepted when sigma < z_range / ratio
        (UpdateSeeds' convergence test, optimizer.cpp:664-680)."""
        return self.valid & (jnp.sqrt(self.sigma2) < self.z_range / ratio)


def compute_tau(
    T_ref_cur: SE3, f: jnp.ndarray, z: jnp.ndarray, px_error_angle
) -> jnp.ndarray:
    """Depth uncertainty from one-pixel disparity (ComputeTau,
    optimizer.cpp:724-740), batched over seeds."""
    t = T_ref_cur.t
    a = f * z[:, None] - t[None, :]
    t_norm = jnp.linalg.norm(t)
    a_norm = jnp.linalg.norm(a, axis=-1)
    alpha = jnp.arccos(jnp.clip(jnp.sum(f * t[None, :], axis=-1) / jnp.maximum(t_norm, 1e-9), -1, 1))
    beta = jnp.arccos(jnp.clip(-jnp.sum(a * t[None, :], axis=-1) / jnp.maximum(t_norm * a_norm, 1e-9), -1, 1))
    beta_plus = beta + px_error_angle
    gamma = jnp.pi - alpha - beta_plus
    z_plus = t_norm * jnp.sin(beta_plus) / jnp.maximum(jnp.sin(gamma), 1e-6)
    return jnp.abs(z_plus - z)


def update_seed(
    seeds: Seeds, x: jnp.ndarray, tau2: jnp.ndarray, obs_ok: jnp.ndarray
) -> Seeds:
    """Vogiatzis Gaussian-Beta update for all seeds at once
    (UpdateSeed, optimizer.cpp:690-722); x is the observed inverse
    depth, tau2 its variance, obs_ok which seeds got an observation."""
    norm_scale = jnp.sqrt(seeds.sigma2 + tau2)
    s2 = 1.0 / (1.0 / jnp.maximum(seeds.sigma2, 1e-12) + 1.0 / jnp.maximum(tau2, 1e-12))
    m = s2 * (seeds.mu / jnp.maximum(seeds.sigma2, 1e-12) + x / jnp.maximum(tau2, 1e-12))
    # Gaussian pdf of x under N(mu, norm_scale^2).
    inv_ns = 1.0 / jnp.maximum(norm_scale, 1e-9)
    C1 = (
        seeds.a / (seeds.a + seeds.b)
        * inv_ns / jnp.sqrt(2 * jnp.pi)
        * jnp.exp(-0.5 * ((x - seeds.mu) * inv_ns) ** 2)
    )
    C2 = seeds.b / (seeds.a + seeds.b) / jnp.maximum(seeds.z_range, 1e-9)
    norm = jnp.maximum(C1 + C2, 1e-12)
    C1, C2 = C1 / norm, C2 / norm
    f_ = C1 * (seeds.a + 1.0) / (seeds.a + seeds.b + 1.0) + C2 * seeds.a / (
        seeds.a + seeds.b + 1.0
    )
    e = C1 * (seeds.a + 1.0) * (seeds.a + 2.0) / (
        (seeds.a + seeds.b + 1.0) * (seeds.a + seeds.b + 2.0)
    ) + C2 * seeds.a * (seeds.a + 1.0) / (
        (seeds.a + seeds.b + 1.0) * (seeds.a + seeds.b + 2.0)
    )
    mu_new = C1 * m + C2 * seeds.mu
    sigma2_new = C1 * (s2 + m * m) + C2 * (seeds.sigma2 + seeds.mu ** 2) - mu_new ** 2
    a_new = (e - f_) / jnp.maximum(f_ - e / jnp.maximum(f_, 1e-12), 1e-12)
    b_new = a_new * (1.0 - f_) / jnp.maximum(f_, 1e-12)
    upd = obs_ok & seeds.valid
    return seeds._replace(
        mu=jnp.where(upd, mu_new, seeds.mu),
        sigma2=jnp.where(upd, jnp.maximum(sigma2_new, 1e-12), seeds.sigma2),
        a=jnp.where(upd, jnp.clip(a_new, 1e-3, 1e4), seeds.a),
        b=jnp.where(upd, jnp.clip(b_new, 1e-3, 1e4), seeds.b),
    )


def update_seeds_from_frame(
    seeds: Seeds,
    ref_img: jnp.ndarray,
    cur_img: jnp.ndarray,
    cam,
    T_cur_ref: SE3,
    px_noise: float = 1.0,
) -> Seeds:
    """One frame's worth of seed updates (DepthFilter::UpdateSeeds,
    optimizer.cpp:547-688), fully batched:
    epipolar-constrained alignment around the projected mean depth,
    triangulation, tau, Bayes update.
    """
    H, W = cur_img.shape
    z = seeds.depth()
    # Raw detection -> undistorted bearing (identity when the
    # camera has no distortion; solver-boundary convention).
    f_ref = cam.pixel_to_bearing(seeds.px, distorted=True)
    p_ref = f_ref * (z / jnp.maximum(f_ref[:, 2], 1e-6))[:, None]
    p_cur = T_cur_ref.apply(p_ref)
    # Sampling positions on the RAW image: project WITH distortion.
    px_mean = cam.camera_to_pixel(p_cur, distorted=True)
    # Epipolar direction in the current image around the mean depth:
    # project at mu +- sigma and take the chord direction.
    z_minus = 1.0 / jnp.maximum(seeds.mu + jnp.sqrt(seeds.sigma2), 1e-6)
    p_minus = T_cur_ref.apply(f_ref * (z_minus / jnp.maximum(f_ref[:, 2], 1e-6))[:, None])
    px_minus = cam.camera_to_pixel(p_minus, distorted=True)
    direction = px_minus - px_mean
    dn = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    direction = jnp.where(dn > 1e-6, direction / jnp.maximum(dn, 1e-6),
                          jnp.asarray([1.0, 0.0]))
    visible = (
        seeds.valid
        & (p_cur[:, 2] > 0.05)
        & in_bounds(px_mean, H, W, margin=8.0)
    )
    patches = sample_patches(ref_img, seeds.px, 10)
    res = align1d(cur_img, patches, px_mean, direction, max_error=25.0)
    matched = visible & res.converged
    # Triangulate the matched position.  depth_from_triangulation
    # returns RANGE along the unit bearing; seeds store inverse
    # Z-depth, so convert via the bearing's z component (confusing the
    # two leaves a cos(theta) bias of several percent at the image
    # periphery).
    f_cur = cam.pixel_to_bearing(res.xy, distorted=True)
    range_new, tri_ok = depth_from_triangulation(T_cur_ref, f_ref, f_cur)
    depth_new = range_new * f_ref[:, 2]
    ok = matched & tri_ok & (depth_new > 0.05)
    # Observation in inverse depth with tau.
    focal = cam.fx
    px_error_angle = jnp.arctan(px_noise / (2.0 * focal)) * 2.0
    tau = compute_tau(T_cur_ref.inverse(), f_ref, depth_new, px_error_angle)
    x = 1.0 / jnp.maximum(depth_new, 1e-6)
    tau_inv = 0.5 * (
        1.0 / jnp.maximum(depth_new - tau, 1e-6)
        - 1.0 / jnp.maximum(depth_new + tau, 1e-6)
    )
    seeds = update_seed(seeds, x, tau_inv ** 2, ok)
    # Failed epipolar matches count against the Beta inlier ratio
    # (UpdateSeeds increments b on failure, optimizer.cpp:627-633).
    fail = visible & (~ok)
    return seeds._replace(b=jnp.where(fail, seeds.b + 1.0, seeds.b))
