"""Depth-filter tests: seeds must converge to ground-truth depth over
a sequence of frames (the capability the reference's legacy DepthFilter
promised; validated here against the rendering oracle)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.map import depth_filter as df
from ygz_slam_tpu.ops import fast
from ygz_slam_tpu.utils.synthetic import PlaneScene

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)


class TestDepthFilter:
    def test_seeds_converge_to_gt_depth(self):
        scene = PlaneScene(CAM, plane_z=3.0, seed=2)
        T_ref = SE3.identity()
        img_ref = scene.render(T_ref, SHAPE)
        c = fast.detect(img_ref, 20.0, cell=16, max_corners=100)
        seeds = df.Seeds.init(c.xy, c.mask, depth_mean=3.5, depth_min=0.8)
        step = jax.jit(
            lambda s, cur, T7: df.update_seeds_from_frame(
                s, img_ref, cur, CAM, SE3.from_params7(T7)
            )
        )
        for k in range(1, 9):
            T_cur = se3.exp(jnp.asarray(
                [0.05 * k, 0.01 * k, 0.0, 0.0, -0.005 * k, 0.0], jnp.float32))
            img_cur = scene.render(T_cur, SHAPE)
            seeds = step(seeds, img_cur, T_cur.params7())
        gt = scene.depth(c.xy, T_ref)
        conv = np.asarray(seeds.converged(ratio=30.0) & c.mask)
        assert conv.sum() > 40, f"only {conv.sum()} seeds converged"
        est = np.asarray(seeds.depth())
        rel = np.abs(est - np.asarray(gt)) / np.asarray(gt)
        assert np.median(rel[conv]) < 0.03, np.median(rel[conv])

    def test_variance_decreases(self):
        scene = PlaneScene(CAM, plane_z=3.0, seed=3)
        img_ref = scene.render(SE3.identity(), SHAPE)
        c = fast.detect(img_ref, 20.0, cell=16, max_corners=64)
        seeds = df.Seeds.init(c.xy, c.mask, 3.5, 0.8)
        s0 = np.asarray(seeds.sigma2)
        T = se3.exp(jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32))
        seeds = df.update_seeds_from_frame(
            seeds, img_ref, scene.render(T, SHAPE), CAM, T
        )
        s1 = np.asarray(seeds.sigma2)
        m = np.asarray(c.mask)
        assert (s1[m] <= s0[m] + 1e-9).mean() > 0.7

    def test_no_observation_no_change(self):
        scene = PlaneScene(CAM, plane_z=3.0, seed=4)
        img_ref = scene.render(SE3.identity(), SHAPE)
        c = fast.detect(img_ref, 20.0, cell=16, max_corners=32)
        seeds = df.Seeds.init(c.xy, jnp.zeros_like(c.mask), 3.5, 0.8)
        out = df.update_seeds_from_frame(
            seeds, img_ref, img_ref, CAM, SE3.identity()
        )
        np.testing.assert_allclose(np.asarray(out.mu), np.asarray(seeds.mu))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
