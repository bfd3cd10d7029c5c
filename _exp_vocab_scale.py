"""Experiment: BoW retrieval quality vs vocabulary size as the
keyframe archive grows (VERDICT round-2 item 6).

Protocol: M distinct "keyframe" views drawn from many rendered worlds
(planar textures + box rooms); each has a QUERY twin rendered from a
perturbed pose with photometric offset.  For archive sizes
A in {25, 50, 100, 200}, a query relocalizes correctly iff the top-1
L1-scored BoW candidate among the A archived vectors is its own twin.
Reported: recall@1 and the mean rank of the true twin, for the
512-word bootstrap vs the packaged 10^4-word asset.

Run: python _exp_vocab_scale.py   (results -> docs/vocabulary.md)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
import numpy as np
import jax.numpy as jnp

from ygz_slam_tpu.geometry import PinholeCamera, SE3, se3
from ygz_slam_tpu.ops import fast, orb
from ygz_slam_tpu.map import vocabulary as voc
from ygz_slam_tpu.models.visual_odometry import _shared_vocabulary
from ygz_slam_tpu.utils.synthetic import (
    PlaneScene, BoxScene, loop_trajectory)

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)
M = 200


def describe(img):
    c = fast.detect(img, 20.0, cell=12, max_corners=256)
    _, d = orb.compute(img, c.xy)
    return jnp.asarray(d), jnp.asarray(c.mask)


def build_views():
    """M (base, query) image pairs across distinct worlds/poses."""
    pairs = []
    rng = np.random.default_rng(0)
    # 120 planar views: 20 textures x 6 poses.
    for ti in range(20):
        scene = PlaneScene(CAM, plane_z=3.0, seed=5000 + ti)
        for j in range(6):
            xi = rng.normal(0, 0.15, 6).astype(np.float32)
            T = se3.exp(jnp.asarray(xi))
            dxi = rng.normal(0, 0.02, 6).astype(np.float32)
            Tq = se3.exp(jnp.asarray(dxi)).compose(T)
            pairs.append((scene.render(T, SHAPE),
                          scene.render(Tq, SHAPE) * 1.05 + 2.0))
    # 80 box-room views: 4 rooms x 20 loop stations.
    for ri in range(4):
        scene = BoxScene(CAM, seed=6000 + ri)
        traj = loop_trajectory(20, radius=2.9, seed=ri)
        for T in traj:
            dxi = rng.normal(0, 0.02, 6).astype(np.float32)
            Tq = se3.exp(jnp.asarray(dxi)).compose(T)
            pairs.append((scene.render(T, SHAPE),
                          scene.render(Tq, SHAPE) * 0.95 + 3.0))
    return pairs[:M]


def main():
    import time
    t0 = time.time()
    pairs = build_views()
    print(f"rendered {len(pairs)} pairs ({time.time()-t0:.0f}s)")
    base_d, base_m, q_d, q_m = [], [], [], []
    for b, q in pairs:
        d, m = describe(b)
        base_d.append(d); base_m.append(m)
        d, m = describe(jnp.clip(q, 0, 255))
        q_d.append(d); q_m.append(m)
    print(f"described ({time.time()-t0:.0f}s)")

    vocabs = {
        "512w (bootstrap)": _shared_vocabulary(prefer_asset=False),
        "10000w (asset)": _shared_vocabulary(prefer_asset=True),
    }
    out = {}
    for name, vb in vocabs.items():
        bows_b, bows_q = [], []
        for d, m in zip(base_d, base_m):
            w, _ = voc.transform(vb, d, m)
            bows_b.append(voc.bow_vector(vb, w, m))
        for d, m in zip(q_d, q_m):
            w, _ = voc.transform(vb, d, m)
            bows_q.append(voc.bow_vector(vb, w, m))
        B = jnp.stack(bows_b)
        Qm = jnp.stack(bows_q)
        S = np.asarray(voc.score_l1(Qm[:, None, :], B[None, :, :]))
        rows = []
        for A in (25, 50, 100, 200):
            sub = S[:A, :A]
            rank = (sub >= sub[np.arange(A), np.arange(A)][:, None]
                    ).sum(1)          # 1 = top (ties count against us)
            rec1 = float((rank <= 1).mean())
            rows.append((A, rec1, float(rank.mean())))
        out[name] = rows
        print(name)
        for A, r1, mr in rows:
            print(f"  A={A:3d}: recall@1={r1:.3f}  mean-rank={mr:.2f}")
    print(f"done ({time.time()-t0:.0f}s)")
    return out


if __name__ == "__main__":
    main()
