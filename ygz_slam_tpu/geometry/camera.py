"""Pinhole camera model with radial-tangential distortion.

TPU-native replacement for the reference's `PinholeCamera`
(include/ygz/Basic/Camera.h:10-112): intrinsics (fx, fy, cx, cy) +
distortion (k1, k2, p1, p2) and all world <-> camera <-> pixel
transforms, as pure batched functions over point arrays.

Unlike the reference (one C++ object, per-point scalar methods), the
camera is a small pytree and every transform broadcasts over [..., 3]
or [..., 2] point tensors so a whole feature set is converted in one
VPU pass.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .se3 import SE3


class PinholeCamera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0) -> "PinholeCamera":
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return PinholeCamera(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2))

    @property
    def K(self) -> jnp.ndarray:
        """3x3 intrinsic matrix."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], axis=-1),
                jnp.stack([z, self.fy, self.cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )

    # -- normalized-plane distortion -------------------------------------
    def distort(self, xn: jnp.ndarray) -> jnp.ndarray:
        """Apply radial-tangential distortion on the normalized plane.

        xn: [..., 2] undistorted normalized coordinates -> distorted [..., 2].
        Mirrors Camera.h's Camera2Pixel distortion composition.
        """
        if not self.has_distortion:   # identity, free at trace time
            return xn
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
        xd = x * radial + 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        yd = y * radial + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return jnp.stack([xd, yd], axis=-1)

    def undistort(self, xd: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
        """Invert distortion by fixed-point iteration (fixed trip count so
        it stays jittable; 5 iterations matches OpenCV's undistortPoints
        accuracy regime used by the reference's UndistortPoint,
        Camera.h:97-103)."""
        if not self.has_distortion:   # identity, free at trace time
            return xd
        xn = xd
        for _ in range(iters):
            x, y = xn[..., 0], xn[..., 1]
            r2 = x * x + y * y
            radial = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
            dx = 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
            dy = self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
            xn = jnp.stack(
                [(xd[..., 0] - dx) / radial, (xd[..., 1] - dy) / radial], axis=-1
            )
        return xn

    @property
    def has_distortion(self) -> bool:
        """Host-side check (camera parameters are closure constants in
        every jit here): True if any distortion coefficient is nonzero.
        Lets zero-distortion cameras skip the undistort math entirely."""
        try:
            return bool(
                abs(float(self.k1)) + abs(float(self.k2))
                + abs(float(self.p1)) + abs(float(self.p2)) > 0.0
            )
        except Exception:  # traced (cam passed as a jit argument)
            return True

    def undistort_px(self, px: jnp.ndarray) -> jnp.ndarray:
        """RAW (distorted-image) pixel -> ideal-pinhole pixel.

        The solver-boundary conversion: every BA/triangulation/epipolar
        residual in this framework is formed in ideal-pinhole pixels,
        converted ONCE from raw detections — the reference equivalently
        undistorts every BA observation via Pixel2Camera2D
        (src/Algorithm/BA.cpp:33,47,106,204,276; Camera.h:97-103).
        Image-sampling coordinates (patch alignment, descriptors) stay
        raw.  Identity for zero-distortion cameras.
        """
        if not self.has_distortion:
            return px
        xn = jnp.stack(
            [(px[..., 0] - self.cx) / self.fx,
             (px[..., 1] - self.cy) / self.fy], axis=-1,
        )
        xn = self.undistort(xn)
        return jnp.stack(
            [self.fx * xn[..., 0] + self.cx,
             self.fy * xn[..., 1] + self.cy], axis=-1,
        )

    def distort_px(self, px: jnp.ndarray) -> jnp.ndarray:
        """Ideal-pinhole pixel -> RAW (distorted-image) pixel: where an
        ideal projection actually lands on the sensor — the conversion
        for sampling the image at a predicted landmark position."""
        if not self.has_distortion:
            return px
        xn = jnp.stack(
            [(px[..., 0] - self.cx) / self.fx,
             (px[..., 1] - self.cy) / self.fy], axis=-1,
        )
        xd = self.distort(xn)
        return jnp.stack(
            [self.fx * xd[..., 0] + self.cx,
             self.fy * xd[..., 1] + self.cy], axis=-1,
        )

    # -- camera <-> pixel ------------------------------------------------
    def camera_to_pixel(self, pc: jnp.ndarray, distorted: bool = True) -> jnp.ndarray:
        """3D camera-frame points [..., 3] -> pixel [..., 2]."""
        z = pc[..., 2:3]
        xn = pc[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        if distorted:
            xn = self.distort(xn)
        u = self.fx * xn[..., 0] + self.cx
        v = self.fy * xn[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1)

    def pixel_to_camera(self, px: jnp.ndarray, depth=1.0, distorted: bool = True) -> jnp.ndarray:
        """Pixel [..., 2] (+ depth [...] or scalar) -> camera-frame [..., 3]."""
        xn = jnp.stack(
            [(px[..., 0] - self.cx) / self.fx, (px[..., 1] - self.cy) / self.fy],
            axis=-1,
        )
        if distorted:
            xn = self.undistort(xn)
        depth = jnp.asarray(depth, dtype=xn.dtype)
        return jnp.concatenate(
            [xn * depth[..., None], jnp.broadcast_to(depth[..., None], xn[..., :1].shape)],
            axis=-1,
        )

    def pixel_to_bearing(self, px: jnp.ndarray, distorted: bool = True) -> jnp.ndarray:
        """Pixel [..., 2] -> unit bearing vector [..., 3]."""
        pc = self.pixel_to_camera(px, 1.0, distorted)
        return pc / jnp.linalg.norm(pc, axis=-1, keepdims=True)

    # -- world <-> camera/pixel -----------------------------------------
    def world_to_camera(self, pw: jnp.ndarray, T_cw: SE3) -> jnp.ndarray:
        return T_cw.apply(pw)

    def camera_to_world(self, pc: jnp.ndarray, T_cw: SE3) -> jnp.ndarray:
        return T_cw.inverse().apply(pc)

    def world_to_pixel(self, pw: jnp.ndarray, T_cw: SE3, distorted: bool = True) -> jnp.ndarray:
        return self.camera_to_pixel(T_cw.apply(pw), distorted)

    def pixel_to_world(self, px: jnp.ndarray, T_cw: SE3, depth=1.0, distorted: bool = True) -> jnp.ndarray:
        return T_cw.inverse().apply(self.pixel_to_camera(px, depth, distorted))

    def in_frame(self, px: jnp.ndarray, width, height, boundary: int = 0) -> jnp.ndarray:
        """Boolean mask [...]: pixel inside the image with a safety boundary
        (reference Frame::InFrame, Basic/Frame.h:54-71)."""
        u, v = px[..., 0], px[..., 1]
        return (
            (u >= boundary)
            & (v >= boundary)
            & (u < width - boundary)
            & (v < height - boundary)
        )

    def scaled(self, factor: float) -> "PinholeCamera":
        """Camera for a pyramid level scaled by `factor` (e.g. 0.5 per level)."""
        return self._replace(
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=self.cx * factor,
            cy=self.cy * factor,
        )
