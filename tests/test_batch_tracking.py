"""Multi-sequence batch tracking tests (CPU fallback path + 8-device
sequence sharding)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.ops import pyramid, fast
from ygz_slam_tpu.parallel import make_mesh
from ygz_slam_tpu.parallel.batch_tracking import (
    batched_sparse_align, sharded_batch_align,
)
from ygz_slam_tpu.utils.synthetic import PlaneScene

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)


def make_batch(S=8, N=80):
    """S independent scenes with known relative motions."""
    refs, curs, pxs, ds, ms, T_gts = [], [], [], [], [], []
    for s in range(S):
        scene = PlaneScene(CAM, plane_z=3.0, seed=50 + s)
        # Motions stay within the cold-start convergence basin (the VO
        # warm-starts from its motion model; this test starts from
        # identity).
        T_gt = se3.exp(jnp.asarray(
            [0.03 + 0.005 * s, -0.02, 0.01, 0.001 * s, -0.004, 0.002],
            jnp.float32))
        img_r = scene.render(SE3.identity(), SHAPE)
        img_c = scene.render(T_gt, SHAPE)
        c = fast.detect(img_r, 20.0, cell=16, max_corners=N)
        refs.append(pyramid.build_pyramid(img_r, 3))
        curs.append(pyramid.build_pyramid(img_c, 3))
        pxs.append(c.xy)
        ds.append(scene.depth(c.xy, SE3.identity()))
        ms.append(c.mask)
        T_gts.append(T_gt)
    ref_pyrs = tuple(jnp.stack([r[l] for r in refs]) for l in range(3))
    cur_pyrs = tuple(jnp.stack([c[l] for c in curs]) for l in range(3))
    return (
        ref_pyrs, cur_pyrs,
        jnp.stack(pxs), jnp.stack(ds), jnp.stack(ms),
        jax.tree.map(lambda *x: jnp.stack(x), *T_gts),
    )


class TestBatchTracking:
    def test_tracks_all_sequences(self):
        ref_pyrs, cur_pyrs, px, d, m, T_gt = make_batch(S=4)
        T0 = SE3.identity((4,))
        out = batched_sparse_align(ref_pyrs, cur_pyrs, CAM, px, d, m, T0)
        errs = np.asarray(jax.vmap(se3.distance)(out, T_gt))
        assert errs.max() < 1e-2, errs

    def test_sharded_over_mesh(self):
        ref_pyrs, cur_pyrs, px, d, m, T_gt = make_batch(S=8)
        mesh = make_mesh(8)
        T0 = SE3.identity((8,))
        out = sharded_batch_align(
            mesh, ref_pyrs, cur_pyrs, CAM, px, d, m, T0
        )
        errs = np.asarray(jax.vmap(se3.distance)(out, T_gt))
        assert errs.max() < 1e-2, errs


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
