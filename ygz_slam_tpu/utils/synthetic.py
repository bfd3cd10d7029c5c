"""Synthetic photometric scenes with exact ground truth.

The reference's simulation fixtures only project points + add noise
(test/test_initializer.cpp, test/test_local_ba.cpp).  Direct-method
kernels additionally need *images* that are photometrically consistent
across views; this module renders a textured fronto-world plane from
arbitrary camera poses, giving exact ground truth for pose, depth and
pixel correspondences — the oracle for KLT / patch-alignment /
sparse-direct tests and benchmarks.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..geometry.se3 import SE3
from ..ops.interp import bilinear


def make_texture(size: int = 1024, seed: int = 0, octaves: int = 4,
                 decay: float = 0.5) -> jnp.ndarray:
    """Smooth multi-octave random texture [size, size] float32 in
    [0, 255].  `decay` sets the per-octave amplitude falloff from fine
    to coarse: 0.5 is fine-detail-dominant; larger values keep more
    COARSE contrast, which is what survives when a surface is viewed
    from far away (texels per pixel > 1 and bilinear sampling washes
    out the fine octaves)."""
    rng = np.random.default_rng(seed)
    tex = np.zeros((size, size), np.float32)
    for o in range(octaves):
        s = size >> (octaves - 1 - o)
        layer = rng.uniform(-1, 1, size=(s, s)).astype(np.float32)
        # Upsample by repetition then box blur for smoothness.
        rep = size // s
        layer = np.kron(layer, np.ones((rep, rep), np.float32))
        k = max(rep // 2, 1)
        if k > 1:
            c = np.cumsum(np.pad(layer, ((1, 0), (0, 0))), axis=0)
            layer = (c[k:] - c[:-k]) / k
            layer = np.pad(layer, ((0, size - layer.shape[0]), (0, 0)), mode="edge")
            c = np.cumsum(np.pad(layer, ((0, 0), (1, 0))), axis=1)
            layer = (c[:, k:] - c[:, :-k]) / k
            layer = np.pad(layer, ((0, 0), (0, size - layer.shape[1])), mode="edge")
        tex += layer * (decay ** (octaves - 1 - o))
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    return jnp.asarray(40.0 + 175.0 * tex)


class PlaneScene:
    """World: textured plane z = plane_z; cameras look roughly at +z.

    Texture coordinates: world (x, y) * tex_per_meter + tex_size/2.
    """

    def __init__(self, cam, plane_z: float = 3.0, tex_size: int = 1024,
                 tex_per_meter: float = 120.0, seed: int = 0):
        self.cam = cam
        self.plane_z = plane_z
        self.tex = make_texture(tex_size, seed)
        self.tex_per_meter = tex_per_meter
        self.tex_size = tex_size

    def world_from_pixel(self, px: jnp.ndarray, T_cw: SE3) -> jnp.ndarray:
        """Intersect pixel rays with the plane -> world points [..., 3]."""
        T_wc = T_cw.inverse()
        # distorted=True: a RAW pixel looks along its undistorted ray,
        # so scenes rendered with a distorted camera model are
        # physically correct distorted images (identity for
        # zero-distortion cameras — the has_distortion short-circuit).
        bearing_c = self.cam.pixel_to_camera(px, 1.0, distorted=True)
        d_w = jnp.einsum("ij,...j->...i", T_wc.R, bearing_c)
        o_w = T_wc.t
        t = (self.plane_z - o_w[2]) / jnp.where(
            jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2]
        )
        return o_w + t[..., None] * d_w

    def render(self, T_cw: SE3, shape: tuple[int, int]) -> jnp.ndarray:
        """Render an [H, W] image from camera pose T_cw."""
        H, W = shape
        u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                            jnp.arange(H, dtype=jnp.float32))
        px = jnp.stack([u, v], axis=-1)
        w_pts = self.world_from_pixel(px, T_cw)
        tx = w_pts[..., 0] * self.tex_per_meter + self.tex_size / 2
        ty = w_pts[..., 1] * self.tex_per_meter + self.tex_size / 2
        return bilinear(self.tex, jnp.stack([tx, ty], axis=-1))

    def depth(self, px: jnp.ndarray, T_cw: SE3) -> jnp.ndarray:
        """Ground-truth z-depth of the plane at pixels [..., 2]."""
        w = self.world_from_pixel(px, T_cw)
        return T_cw.apply(w)[..., 2]

    def project_to(self, px_a: jnp.ndarray, T_a: SE3, T_b: SE3) -> jnp.ndarray:
        """Ground-truth correspondence: pixels in view a -> pixels in b."""
        w = self.world_from_pixel(px_a, T_a)
        return self.cam.world_to_pixel(w, T_b, distorted=True)


class BoxScene:
    """Non-planar world at benchmark scale: the INSIDE of a textured
    axis-aligned box room.  Each of the six faces carries its own
    multi-octave texture; rays take the nearest positive face hit, so
    corners are genuine occlusion/depth-discontinuity boundaries that
    move with the camera.

    Purpose: the long-trajectory accuracy benchmark (≥1000 frames with
    a true loop) the short planar fixtures cannot provide — multi-
    textured, non-planar, with optional photometric perturbation
    (per-frame exposure gain/bias + lens vignetting) to exercise the
    direct tracker off the photometric-constancy ideal.  The
    reference's integration tests used real TUM sequences for this
    role (test/test_vo_init.cpp:26-39); no real data ships in this
    environment, so this is the controlled-ground-truth stand-in.
    """

    # Face definitions: (axis, sign) — plane axis=coord, normal inward.
    _FACES = [(0, -1.0), (0, 1.0), (1, -1.0), (1, 1.0), (2, -1.0), (2, 1.0)]

    # Mip levels: level k is the base texture low-passed with a
    # (2^k)-texel box, so a pixel whose ground footprint spans ~2^k
    # texels samples an area average like a real sensor does.
    N_MIPS = 5

    def __init__(self, cam, half=(4.0, 2.0, 4.0), tex_size: int = 2048,
                 tex_per_meter: float = 220.0, seed: int = 0,
                 vignette: float = 0.0, tex_decay: float = 0.7,
                 textures: list | None = None):
        self.cam = cam
        self.half = np.asarray(half, np.float32)   # box is [-half, half]
        if textures is not None:
            # REAL-pixel walls: 6 caller-supplied square grayscale
            # images (e.g. photo_textures() over the reference tree's
            # DBoW3 demo photographs) replace the procedural multi-
            # octave textures — putting real texture statistics
            # through the full pipeline (the role the reference's TUM
            # integration fixtures play, test/test_vo_init.cpp:26-39).
            assert len(textures) == 6
            tex_size = int(np.asarray(textures[0]).shape[0])
        self.tex_size = tex_size
        self.tex_per_meter = tex_per_meter
        self.vignette = float(vignette)
        # Texture statistics tuned for the 1-7.5 m viewing-range of
        # the room (measured worst-view image gradient across the
        # benchmark loop): flatter octave decay keeps COARSE contrast
        # alive in far-wall views (decay 0.5 dropped gradient 23 -> 8
        # there, starving the direct tracker), while 2048 texels at
        # 220/m keep FINE contrast alive in near-wall views (1024@110
        # bottomed out at 6.5 near walls; 2048@220/0.7 -> min 11.2,
        # median 20 — roughly uniform).
        if textures is not None:
            base = [jnp.asarray(np.asarray(t, np.float32))
                    for t in textures]
        else:
            base = [
                make_texture(tex_size, seed + 101 * f, decay=tex_decay)
                for f in range(6)
            ]
        # Mip pyramid per face (same resolution, increasingly low-
        # passed): POINT-sampled bilinear at >1 texel/pixel footprints
        # aliases — measured on the oblique benchmark views: same-
        # physical-point ORB distance jumped to a median of 56 (past
        # the 50 match gate) and FAST repeatability halved, killing
        # triangulation in corner-facing sections.  Real sensors
        # area-integrate; trilinear mip sampling is the standard
        # antialiasing answer.
        self.texs = jnp.stack([
            jnp.stack(self._mip_stack(t)) for t in base
        ])  # [6, N_MIPS, S, S]

    def _mip_stack(self, tex: jnp.ndarray) -> list:
        out = [tex]
        t = np.asarray(tex)
        size = t.shape[0]
        for k in range(1, self.N_MIPS):
            w = 1 << k
            c = np.cumsum(np.pad(t, ((1, 0), (0, 0))), axis=0,
                          dtype=np.float64)
            b = (c[w:] - c[:-w]) / w
            b = np.pad(b, ((w // 2, size - b.shape[0] - w // 2), (0, 0)),
                       mode="edge")
            c = np.cumsum(np.pad(b, ((0, 0), (1, 0))), axis=1,
                          dtype=np.float64)
            b = (c[:, w:] - c[:, :-w]) / w
            b = np.pad(b, ((0, 0), (w // 2, size - b.shape[1] - w // 2)),
                       mode="edge")
            out.append(jnp.asarray(b.astype(np.float32)))
        return out

    def _hits(self, px: jnp.ndarray, T_cw: SE3):
        """Nearest positive face hit for each pixel ray.

        Returns (points [..., 3] world, face [..., ] int32, t [...])."""
        T_wc = T_cw.inverse()
        bearing_c = self.cam.pixel_to_camera(px, 1.0, distorted=True)
        d_w = jnp.einsum("ij,...j->...i", T_wc.R, bearing_c)
        o_w = T_wc.t
        big = jnp.asarray(1e9, px.dtype)
        t_best = jnp.full(px.shape[:-1], big)
        f_best = jnp.zeros(px.shape[:-1], jnp.int32)
        for f, (ax, sign) in enumerate(self._FACES):
            coord = sign * self.half[ax]
            d_ax = d_w[..., ax]
            d_safe = jnp.where(jnp.abs(d_ax) < 1e-9, 1e-9, d_ax)
            t = (coord - o_w[ax]) / d_safe
            hit = o_w + t[..., None] * d_w
            # Inside the other two extents (with a hair of slack so
            # corner rays always land on exactly one face).
            oth = [a for a in range(3) if a != ax]
            inside = (
                (jnp.abs(hit[..., oth[0]]) <= self.half[oth[0]] + 1e-4)
                & (jnp.abs(hit[..., oth[1]]) <= self.half[oth[1]] + 1e-4)
            )
            ok = (t > 1e-4) & inside & (t < t_best)
            t_best = jnp.where(ok, t, t_best)
            f_best = jnp.where(ok, f, f_best)
        pts = o_w + t_best[..., None] * d_w
        return pts, f_best, t_best

    def world_from_pixel(self, px: jnp.ndarray, T_cw: SE3) -> jnp.ndarray:
        pts, _, _ = self._hits(px, T_cw)
        return pts

    def _shade(self, pts: jnp.ndarray, face: jnp.ndarray,
               footprint: jnp.ndarray | None = None) -> jnp.ndarray:
        """Sample each face's texture at the hit point's two in-plane
        world coordinates — trilinearly across the mip stack when a
        per-pixel texel `footprint` is given (area-integrating like a
        real sensor; see __init__)."""
        if footprint is None:
            lvl = jnp.zeros(pts.shape[:-1], pts.dtype)
        else:
            lvl = jnp.clip(
                jnp.log2(jnp.maximum(footprint, 1.0)),
                0.0, float(self.N_MIPS - 1) - 1e-4,
            )
        l0 = lvl.astype(jnp.int32)
        frac = lvl - l0.astype(lvl.dtype)
        out = jnp.zeros(pts.shape[:-1], pts.dtype)
        for f, (ax, sign) in enumerate(self._FACES):
            oth = [a for a in range(3) if a != ax]
            tx = pts[..., oth[0]] * self.tex_per_meter + self.tex_size / 2
            ty = pts[..., oth[1]] * self.tex_per_meter + self.tex_size / 2
            uv = jnp.stack([tx, ty], axis=-1)
            mips = jnp.stack([
                bilinear(self.texs[f, l], uv) for l in range(self.N_MIPS)
            ])                                   # [M, ...]
            v0 = jnp.take_along_axis(mips, l0[None], axis=0)[0]
            v1 = jnp.take_along_axis(
                mips, jnp.minimum(l0 + 1, self.N_MIPS - 1)[None], axis=0
            )[0]
            val = v0 * (1.0 - frac) + v1 * frac
            out = jnp.where(face == f, val, out)
        return out

    def _footprint(self, px: jnp.ndarray, T_cw: SE3, face, t_best):
        """Texels spanned by one pixel at each hit: distance *
        tex_per_meter / fx, divided by the wall-incidence cosine
        (clamped — grazing rays would otherwise blur unboundedly)."""
        T_wc = T_cw.inverse()
        bearing_c = self.cam.pixel_to_camera(px, 1.0, distorted=True)
        d_w = jnp.einsum("ij,...j->...i", T_wc.R, bearing_c)
        d_norm = jnp.linalg.norm(d_w, axis=-1)
        dist = t_best * d_norm
        ax = jnp.asarray([f[0] for f in self._FACES], jnp.int32)[face]
        d_ax = jnp.take_along_axis(
            jnp.moveaxis(d_w, -1, 0), ax[None], axis=0
        )[0]
        cos_inc = jnp.clip(jnp.abs(d_ax) / jnp.maximum(d_norm, 1e-9),
                           0.25, 1.0)
        fx = self.cam.fx
        return dist * self.tex_per_meter / fx / cos_inc

    def render(self, T_cw: SE3, shape: tuple[int, int],
               gain: float = 1.0, bias: float = 0.0) -> jnp.ndarray:
        """Render with optional photometric perturbation: pixel value
        v' = clip(V(px) * (gain * v + bias)) with radial vignetting
        V = 1 - vignette * (r / r_max)^2."""
        H, W = shape
        u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                            jnp.arange(H, dtype=jnp.float32))
        px = jnp.stack([u, v], axis=-1)
        pts, face, t_best = self._hits(px, T_cw)
        fp = self._footprint(px, T_cw, face, t_best)
        img = self._shade(pts, face, fp)
        img = gain * img + bias
        if self.vignette > 0.0:
            cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
            r2 = ((u - cx) ** 2 + (v - cy) ** 2) / (cx * cx + cy * cy)
            img = img * (1.0 - self.vignette * r2)
        return jnp.clip(img, 0.0, 255.0)

    def depth(self, px: jnp.ndarray, T_cw: SE3) -> jnp.ndarray:
        w = self.world_from_pixel(px, T_cw)
        return T_cw.apply(w)[..., 2]

    def project_to(self, px_a: jnp.ndarray, T_a: SE3, T_b: SE3) -> jnp.ndarray:
        w = self.world_from_pixel(px_a, T_a)
        return self.cam.world_to_pixel(w, T_b, distorted=True)


DBOW3_IMAGE_DIR = "/root/reference/thirdparty/DBoW3/utils/images"


def photo_textures(paths: list | None = None,
                   tex_size: int = 1024) -> list:
    """Six square wall textures built from REAL photographs by
    mirror-tiling (seamless repeats) — default source: the reference
    tree's four DBoW3 demo photos (thirdparty/DBoW3/utils/images/
    image0-3.png, 640x480 grayscale), cycled across the six faces.
    Returns a list of [tex_size, tex_size] float32 arrays in [0, 255].
    """
    import os

    if paths is None:
        paths = [os.path.join(DBOW3_IMAGE_DIR, f"image{i}.png")
                 for i in range(4)]
    from PIL import Image

    def tile(path):
        im = np.asarray(
            Image.open(path).convert("L"), np.float32
        )
        # Mirror-tile to at least tex_size in both dims: [A B~ A ...]
        # where B~ is the flipped copy — continuous at every seam.
        def mirror_to(a, n, axis):
            flip = np.flip(a, axis=axis)
            reps = []
            while sum(r.shape[axis] for r in reps) < n:
                reps.append(a if len(reps) % 2 == 0 else flip)
            return np.concatenate(reps, axis=axis)

        t = mirror_to(im, tex_size, 0)
        t = mirror_to(t, tex_size, 1)
        return t[:tex_size, :tex_size]

    tiles = [tile(p) for p in paths]
    return [tiles[f % len(tiles)] for f in range(6)]


def loop_trajectory(n_frames: int, radius: float = 2.2,
                    laps: float = 1.08, bob: float = 0.08,
                    seed: int = 0, face: str = "tangent"):
    """Camera loop inside a BoxScene: a circle in the x-z plane, with
    small smooth y-bob and attitude perturbations.  `laps` > 1
    revisits the start — the loop-closure event.  Returns a list of
    T_cw (world -> camera).

    `face` picks the viewing direction: "tangent" looks along the
    direction of travel (corridor-style views — the sharpest direct-
    tracking stress: wall incidence gets as shallow as asin(radius /
    half), and those grazing sections are where round-3's benchmark
    lost track); "out" looks radially outward (head-on wall views,
    translation parallel to the image plane — the wide-baseline,
    texture-rich regime loop-closure benchmarks need, and the view a
    revisit reproduces exactly)."""
    poses = []
    rng = np.random.default_rng(seed)
    ph = rng.uniform(0, 2 * np.pi, 3)
    for k in range(n_frames):
        a = 2 * np.pi * laps * k / n_frames
        # Camera center on the circle; forward (camera +z) along the
        # tangent or radially out; camera y down-ish (world -y up
        # convention-free).
        c = np.asarray([radius * np.sin(a),
                        bob * np.sin(3 * a + ph[0]),
                        -radius * np.cos(a)], np.float32)
        if face == "out":
            # Forward angle (from +x toward +z) is pi/2 - yaw and the
            # outward radial is at a - pi/2, so yaw = pi - a locks the
            # view to the outward radial for the whole lap.  (The
            # legacy yaw = a actually sweeps the view through inward/
            # tangent/outward TWICE per lap — measured; corridor views
            # 4x per lap were the round-3 loss sections.)
            yaw = np.pi - a + 0.12 * np.sin(2 * a + ph[1])
        else:
            yaw = a + 0.12 * np.sin(2 * a + ph[1])
        pitch = 0.05 * np.sin(2.4 * a + ph[2])
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        # R_wc: camera axes in world coords (z forward = tangent).
        Rz = np.asarray([sy * cp, -sp, cy * cp], np.float32)   # forward
        Rx = np.asarray([cy, 0.0, -sy], np.float32)            # right
        Ry = np.cross(Rz, Rx)
        R_wc = np.stack([Rx, Ry, Rz], axis=1)
        R_cw = R_wc.T
        t_cw = -R_cw @ c
        poses.append(SE3(jnp.asarray(R_cw), jnp.asarray(t_cw)))
    return poses


class TwoPlaneScene:
    """Non-planar world: a NEAR plane (z = z_near, world x < x_split)
    occluding a FAR plane (z = z_far, everywhere) — a depth
    discontinuity whose occlusion boundary moves with the camera.

    Purpose: the planar PlaneScene makes in-pipeline initialization
    always take the homography path; this scene exercises the F/E
    model selection (rh <= 0.4), parallax across a depth step, and
    tracking through occlusion — matching the reference's planar vs
    non-planar simulation fixtures (test/test_initializer.cpp:9-80).
    """

    def __init__(self, cam, z_near: float = 2.0, z_far: float = 4.5,
                 x_split: float = 0.15, tex_size: int = 1024,
                 tex_per_meter: float = 110.0, seed: int = 0):
        self.cam = cam
        self.z_near = z_near
        self.z_far = z_far
        self.x_split = x_split
        self.tex = make_texture(tex_size, seed)
        # Distinct texture for the far plane (offset sampling of a
        # second noise draw) so the two surfaces are visually distinct.
        self.tex_far = make_texture(tex_size, seed + 7919)
        self.tex_per_meter = tex_per_meter
        self.tex_size = tex_size

    def _hits(self, px: jnp.ndarray, T_cw: SE3):
        T_wc = T_cw.inverse()
        bearing_c = self.cam.pixel_to_camera(px, 1.0, distorted=True)
        d_w = jnp.einsum("ij,...j->...i", T_wc.R, bearing_c)
        o_w = T_wc.t
        dz = jnp.where(jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2])
        t_near = (self.z_near - o_w[2]) / dz
        t_far = (self.z_far - o_w[2]) / dz
        h_near = o_w + t_near[..., None] * d_w
        h_far = o_w + t_far[..., None] * d_w
        near_ok = (t_near > 0) & (h_near[..., 0] < self.x_split)
        return h_near, h_far, near_ok

    def world_from_pixel(self, px: jnp.ndarray, T_cw: SE3) -> jnp.ndarray:
        h_near, h_far, near_ok = self._hits(px, T_cw)
        return jnp.where(near_ok[..., None], h_near, h_far)

    def render(self, T_cw: SE3, shape: tuple[int, int]) -> jnp.ndarray:
        H, W = shape
        u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                            jnp.arange(H, dtype=jnp.float32))
        px = jnp.stack([u, v], axis=-1)
        h_near, h_far, near_ok = self._hits(px, T_cw)

        def tex_at(tex, pts):
            tx = pts[..., 0] * self.tex_per_meter + self.tex_size / 2
            ty = pts[..., 1] * self.tex_per_meter + self.tex_size / 2
            return bilinear(tex, jnp.stack([tx, ty], axis=-1))

        return jnp.where(
            near_ok, tex_at(self.tex, h_near), tex_at(self.tex_far, h_far)
        )

    def depth(self, px: jnp.ndarray, T_cw: SE3) -> jnp.ndarray:
        w = self.world_from_pixel(px, T_cw)
        return T_cw.apply(w)[..., 2]

    def project_to(self, px_a: jnp.ndarray, T_a: SE3, T_b: SE3) -> jnp.ndarray:
        w = self.world_from_pixel(px_a, T_a)
        return self.cam.world_to_pixel(w, T_b, distorted=True)
