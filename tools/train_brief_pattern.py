"""Learn the steered-BRIEF test pattern for cross-view STABILITY.

First attempt (the ORB paper's pure variance/decorrelation greedy)
measured WORSE than the iid draw here: single-pixel tests with bit
mean near 0.5 are exactly the flip-prone ones under viewpoint warp on
these textures.  The renderer gives exact cross-view correspondences,
so the pattern can be learned against the real objective directly:

  maximize  P(bit agrees between two views of the same point)
  subject to  bit mean in [0.35, 0.65]   (discriminative)
              |corr| with kept tests < tau (complementary)

Candidates are the same Gaussian family the runtime would draw from;
selection replaces blind sampling.

Run:  python tools/train_brief_pattern.py
Writes ygz_slam_tpu/assets/brief_pattern.npy; orb picks it up at
import.  Retrain the vocabulary afterwards (tools/train_vocab.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
import numpy as np
import jax.numpy as jnp

from ygz_slam_tpu.geometry import PinholeCamera, SE3, se3
from ygz_slam_tpu.ops import fast, orb
from ygz_slam_tpu.ops.interp import extract_patches, bilinear
from ygz_slam_tpu.utils.synthetic import (
    PlaneScene, TwoPlaneScene, BoxScene, loop_trajectory)

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)
P = orb.PATCH
HP = orb.HALF_PATCH
R = orb.PATTERN_RADIUS


def oriented_patches(img, xy, angles):
    """[N, 31, 31] patches resampled in the keypoint's rotated frame
    from the pre-blurred image (the runtime descriptor's domain)."""
    blurred = orb.blur_for_descriptors(img)
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    gx, gy = jnp.meshgrid(
        jnp.arange(-HP, HP + 1, dtype=jnp.float32),
        jnp.arange(-HP, HP + 1, dtype=jnp.float32), indexing="xy")
    rx = gx[None] * ca[:, None, None] - gy[None] * sa[:, None, None]
    ry = gx[None] * sa[:, None, None] + gy[None] * ca[:, None, None]
    sx = xy[:, 0][:, None, None] + rx
    sy = xy[:, 1][:, None, None] + ry
    return bilinear(blurred, jnp.stack([sx, sy], axis=-1))


def harvest_pairs(n_target=16000, seed=0):
    """Corresponding ORIENTED patch pairs across view pairs with known
    geometry (each view computes its OWN IC angle, as at runtime)."""
    rng = np.random.default_rng(seed)
    A, B = [], []
    t0 = time.time()
    jobs = []
    for i in range(8):
        sc = PlaneScene(CAM, plane_z=3.0, seed=700 + i)
        for j in range(3):
            Ta = se3.exp(jnp.asarray(
                rng.normal(0, 0.10, 6).astype(np.float32)))
            dT = se3.exp(jnp.asarray(
                rng.normal(0, 0.035, 6).astype(np.float32)))
            jobs.append((sc, Ta, dT.compose(Ta)))
    for i in range(3):
        sc = TwoPlaneScene(CAM, seed=800 + i)
        for j in range(3):
            Ta = se3.exp(jnp.asarray(
                rng.normal(0, 0.08, 6).astype(np.float32)))
            dT = se3.exp(jnp.asarray(
                rng.normal(0, 0.03, 6).astype(np.float32)))
            jobs.append((sc, Ta, dT.compose(Ta)))
    for i in range(4):
        sc = BoxScene(CAM, seed=900 + i)
        tr = loop_trajectory(200, radius=2.9, seed=i)
        for k in range(0, 180, 20):
            jobs.append((sc, tr[k], tr[k + 12]))
    for sc, Ta, Tb in jobs:
        ia = sc.render(Ta, SHAPE)
        ib = sc.render(Tb, SHAPE)
        c = fast.detect(ia, 15.0, cell=10, max_corners=200)
        pb = np.asarray(sc.project_to(c.xy, Ta, Tb))
        inb = ((pb[:, 0] > HP + 1) & (pb[:, 0] < SHAPE[1] - HP - 2)
               & (pb[:, 1] > HP + 1) & (pb[:, 1] < SHAPE[0] - HP - 2))
        m = np.asarray(c.mask) & inb
        if m.sum() == 0:
            continue
        patches_a = extract_patches(ia, c.xy, P)
        ang_a = orb.ic_angle(patches_a)
        patches_b = extract_patches(ib, jnp.asarray(pb), P)
        ang_b = orb.ic_angle(patches_b)
        A.append(np.asarray(oriented_patches(ia, c.xy, ang_a))[m])
        B.append(np.asarray(
            oriented_patches(ib, jnp.asarray(pb), ang_b))[m])
        if sum(len(x) for x in A) >= n_target:
            break
    A = np.concatenate(A)[:n_target]
    B = np.concatenate(B)[:n_target]
    print(f"harvested {len(A)} correspondence pairs "
          f"({time.time()-t0:.0f}s)")
    return A, B


def candidate_pool(n_cand=9000, seed=5):
    rng = np.random.default_rng(seed)
    pairs = []
    while len(pairs) < n_cand:
        c = np.round(rng.normal(0.0, P / 5.0, size=(n_cand, 2, 2)))
        ok = ((c[..., 0] ** 2 + c[..., 1] ** 2) <= R * R).all(axis=1)
        ok &= ~((c[:, 0] == c[:, 1]).all(axis=1))
        pairs.extend(c[ok].astype(np.int32).tolist())
    return np.asarray(pairs[:n_cand], np.int32)


def bits_of(patches, cands):
    flat = patches.reshape(len(patches), P * P)
    ia = (cands[:, 0, 1] + HP) * P + (cands[:, 0, 0] + HP)
    ib = (cands[:, 1, 1] + HP) * P + (cands[:, 1, 0] + HP)
    return flat[:, ia] < flat[:, ib]


def main():
    A, B = harvest_pairs()
    cands = candidate_pool()
    Np = len(A)
    ba = bits_of(A, cands)                 # [Np, M]
    bb = bits_of(B, cands)
    stability = (ba == bb).mean(axis=0)    # cross-view agreement
    mean = ba.mean(axis=0)
    disc = (np.abs(mean - 0.5) <= 0.15)
    order = np.argsort(-stability)
    bc = ba.astype(np.float32) - mean[None, :]
    std = bc.std(axis=0) + 1e-9

    tau = 0.25
    while True:
        kept = []
        kept_bits = np.zeros((Np, 0), np.float32)
        for idx in order:
            if len(kept) == 256:
                break
            if not disc[idx]:
                continue
            b = bc[:, idx] / std[idx]
            if kept:
                corr = np.abs(kept_bits.T @ b) / Np
                if corr.max() >= tau:
                    continue
            kept.append(idx)
            kept_bits = np.concatenate([kept_bits, b[:, None]], axis=1)
        if len(kept) == 256:
            break
        print(f"tau={tau}: only {len(kept)} kept, relaxing")
        tau += 0.05
    kept = np.asarray(kept)
    kb_a, kb_b = ba[:, kept], bb[:, kept]
    ham = (kb_a != kb_b).sum(axis=1)
    print(f"kept 256 @ tau={tau:.2f}: "
          f"stability mean={stability[kept].mean():.3f} "
          f"(iid-draw baseline {stability.mean():.3f}); "
          f"training-pair Hamming median={np.median(ham):.0f}")
    out = cands[kept]
    path = os.path.join(os.path.dirname(__file__), "..",
                        "ygz_slam_tpu", "assets", "brief_pattern.npy")
    np.save(path, out)
    print(f"saved {path}")


if __name__ == "__main__":
    main()
