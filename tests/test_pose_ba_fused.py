"""Fused pose-only BA kernel vs the XLA reference implementation
(interpret mode on CPU; the same code compiles to Mosaic on TPU)."""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def _problem(seed=0, n=200, n_out=30, noise=0.3):
    from ygz_slam_tpu.geometry import PinholeCamera, se3

    rng = np.random.default_rng(seed)
    cam = PinholeCamera.create(500.0, 500.0, 320.0, 240.0)
    pts = jnp.asarray(
        np.c_[rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
              rng.uniform(2.5, 6.0, n)], jnp.float32)
    T_true = se3.exp(jnp.asarray(
        [0.05, -0.03, 0.08, 0.01, -0.02, 0.015], jnp.float32))
    px = cam.camera_to_pixel(T_true.apply(pts), distorted=False)
    px = px + jnp.asarray(rng.normal(0, noise, (n, 2)), jnp.float32)
    out_idx = rng.choice(n, n_out, replace=False)
    px = px.at[out_idx].add(
        jnp.asarray(rng.uniform(15, 60, (n_out, 2)), jnp.float32))
    mask = jnp.ones(n, bool)
    T0 = se3.exp(jnp.asarray(
        [0.02, 0.01, 0.03, -0.005, 0.008, -0.004], jnp.float32))
    return cam, pts, px, mask, T_true, T0, out_idx


def test_matches_xla_pose_only_ba():
    from ygz_slam_tpu.geometry import se3
    from ygz_slam_tpu.solvers.ba import pose_only_ba
    from ygz_slam_tpu.ops.pallas.pose_ba_fused import pose_only_ba_fused

    cam, pts, px, mask, T_true, T0, out_idx = _problem()
    T_x, inl_x, _ = pose_only_ba(T0, pts, px, mask, cam)
    T_f, inl_f, chi2_f = pose_only_ba_fused(T0, pts, px, mask, cam)

    # Both must land on the true pose (outliers rejected).
    assert float(se3.distance(T_x, T_true)) < 5e-3
    assert float(se3.distance(T_f, T_true)) < 5e-3
    # And agree with each other tightly (same algorithm, fused).
    assert float(se3.distance(T_f, T_x)) < 1e-3
    # Inlier classification: all planted outliers rejected, inlier sets
    # near-identical (boundary points may flip either way).
    inl_f = np.asarray(inl_f)
    inl_x = np.asarray(inl_x)
    assert not inl_f[np.asarray(out_idx)].any()
    assert (inl_f == inl_x).mean() > 0.97
    assert np.isfinite(float(chi2_f))


def test_respects_input_mask_and_padding():
    from ygz_slam_tpu.geometry import se3
    from ygz_slam_tpu.ops.pallas.pose_ba_fused import pose_only_ba_fused

    # n=150 pads to 256 lanes; masked-off points carry garbage.
    cam, pts, px, mask, T_true, T0, _ = _problem(seed=1, n=150, n_out=0)
    bad = np.zeros(150, bool)
    bad[:40] = True
    px_g = px.at[jnp.asarray(np.where(bad)[0])].set(1e5)
    mask_g = mask & ~jnp.asarray(bad)
    T_f, inl_f, _ = pose_only_ba_fused(T0, pts, px_g, mask_g, cam)
    assert float(se3.distance(T_f, T_true)) < 5e-3
    assert not np.asarray(inl_f)[bad].any()


def test_behind_camera_points_masked():
    from ygz_slam_tpu.geometry import se3
    from ygz_slam_tpu.ops.pallas.pose_ba_fused import pose_only_ba_fused

    cam, pts, px, mask, T_true, T0, _ = _problem(seed=2, n_out=0)
    pts = pts.at[:20, 2].set(-3.0)  # behind the camera
    T_f, inl_f, _ = pose_only_ba_fused(T0, pts, px, mask, cam)
    assert float(se3.distance(T_f, T_true)) < 1e-2
    assert not np.asarray(inl_f)[:20].any()


def test_batched_kernel_matches_per_sequence():
    """pose_only_ba_fused_batch: S solves in one kernel must match
    running the single-sequence fused kernel per sequence."""
    from ygz_slam_tpu.geometry.se3 import SE3
    from ygz_slam_tpu.ops.pallas.pose_ba_fused import pose_only_ba_fused
    from ygz_slam_tpu.ops.pallas.pose_ba_fused_batch import (
        pose_only_ba_fused_batch)

    S = 4
    probs = [_problem(seed=s) for s in range(S)]
    cam = probs[0][0]
    pts = jnp.stack([p[1] for p in probs])
    px = jnp.stack([p[2] for p in probs])
    mask = jnp.stack([p[3] for p in probs])
    T0 = jax.tree.map(
        lambda *x: jnp.stack(x), *[p[5] for p in probs])
    Tb, inl_b, chi2_b = pose_only_ba_fused_batch(T0, pts, px, mask, cam)
    for s in range(S):
        T_s, inl_s, chi2_s = pose_only_ba_fused(
            jax.tree.map(lambda a: a[s], T0),
            pts[s], px[s], mask[s], cam)
        assert np.allclose(np.asarray(Tb.R[s]), np.asarray(T_s.R),
                           atol=2e-5), s
        assert np.allclose(np.asarray(Tb.t[s]), np.asarray(T_s.t),
                           atol=2e-4), s
        agree = (np.asarray(inl_b[s]) == np.asarray(inl_s)).mean()
        assert agree > 0.97, (s, agree)


def test_batched_kernel_accuracy():
    """Each sequence's recovered pose must be near its ground truth."""
    from ygz_slam_tpu.geometry import se3
    from ygz_slam_tpu.ops.pallas.pose_ba_fused_batch import (
        pose_only_ba_fused_batch)

    S = 3
    probs = [_problem(seed=10 + s) for s in range(S)]
    cam = probs[0][0]
    pts = jnp.stack([p[1] for p in probs])
    px = jnp.stack([p[2] for p in probs])
    mask = jnp.stack([p[3] for p in probs])
    T0 = jax.tree.map(lambda *x: jnp.stack(x), *[p[5] for p in probs])
    Tb, inl, _ = pose_only_ba_fused_batch(T0, pts, px, mask, cam)
    for s in range(S):
        T_true = probs[s][4]
        d = float(se3.distance(
            jax.tree.map(lambda a: a[s], Tb), T_true))
        assert d < 2e-3, (s, d)
        # Injected outliers rejected.
        out_idx = probs[s][6]
        assert np.asarray(inl[s])[out_idx].mean() < 0.1
