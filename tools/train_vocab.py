"""Offline training of the real-scale ORB vocabulary asset.

The in-process bootstrap vocabulary (512 words from 4 planar textures,
models/visual_odometry._shared_vocabulary) is fine for ~10-keyframe
scenes but saturates as the archive grows — BoW vectors collide and
reloc/loop candidate ranking degrades.  DBoW3's shipped ORBvoc has
~1M words (SURVEY §2.3); this trains a 10^4-word tree (k=10, depth=4)
on descriptors harvested from DIVERSE generated worlds and ships it as
a package asset loaded by default.

Run:  python tools/train_vocab.py  (writes ygz_slam_tpu/assets/orbvoc_10k.npz)
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
import numpy as np
import jax.numpy as jnp

from ygz_slam_tpu.geometry import PinholeCamera, SE3, se3
from ygz_slam_tpu.ops import fast, orb
from ygz_slam_tpu.map import vocabulary as voc
from ygz_slam_tpu.utils.synthetic import (
    PlaneScene, TwoPlaneScene, BoxScene, loop_trajectory)

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)


def harvest(img):
    c = fast.detect(img, 15.0, cell=10, max_corners=300)
    _, d = orb.compute(img, c.xy)
    return np.asarray(d)[np.asarray(c.mask)]


def main(k=10, depth=4, out="ygz_slam_tpu/assets/orbvoc_10k.npz"):
    t0 = time.time()
    descs = []
    # Planar worlds: many textures, several viewpoints each.
    for seed in range(12):
        scene = PlaneScene(CAM, plane_z=3.0, seed=200 + seed)
        for j in range(6):
            xi = jnp.asarray(np.random.default_rng(seed * 10 + j)
                             .normal(0, 0.12, 6).astype(np.float32))
            descs.append(harvest(scene.render(se3.exp(xi), SHAPE)))
    print(f"planar: {sum(len(d) for d in descs)} descs "
          f"({time.time()-t0:.0f}s)")
    # Two-plane (depth-discontinuity) worlds.
    for seed in range(6):
        scene = TwoPlaneScene(CAM, seed=300 + seed)
        for j in range(5):
            xi = jnp.asarray(np.random.default_rng(seed * 7 + j)
                             .normal(0, 0.1, 6).astype(np.float32))
            descs.append(harvest(scene.render(se3.exp(xi), SHAPE)))
    print(f"+two-plane: {sum(len(d) for d in descs)} descs "
          f"({time.time()-t0:.0f}s)")
    # Box rooms seen along loops (wide in-room viewpoint variety).
    for seed in range(4):
        scene = BoxScene(CAM, seed=400 + seed)
        for T in loop_trajectory(36, radius=2.8, seed=seed):
            descs.append(harvest(scene.render(T, SHAPE)))
    desc = np.concatenate(descs)
    print(f"total {len(desc)} descriptors ({time.time()-t0:.0f}s); "
          f"training k={k} depth={depth} ({k**depth} words)...")
    t1 = time.time()
    vocab = voc.train(desc, k=k, depth=depth, iters=6, seed=0)
    print(f"trained in {time.time()-t1:.0f}s")
    # Occupancy stats.
    words, _ = voc.transform(vocab, jnp.asarray(desc),
                             jnp.ones(len(desc), bool))
    occ = np.bincount(np.asarray(words), minlength=k ** depth)
    print(f"word occupancy: nonzero {np.count_nonzero(occ)}/{k**depth}, "
          f"max {occ.max()}, median(nonzero) {np.median(occ[occ>0]):.0f}")
    voc.save(vocab, out)
    print(f"saved {out} ({os.path.getsize(out)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
