"""Multi-sequence batch tracking tests (CPU fallback path + 8-device
sequence sharding)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # multi-sequence VO runs, minutes

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

    def test_sharded_matches_unsharded(self):
        """8-shard parity: the mesh-sharded program must produce the
        SAME poses as the single-device batched path (pure data
        parallelism — any divergence means the shard_map specs leak)."""
        ref_pyrs, cur_pyrs, px, d, m, T_gt = make_batch(S=8)
        T0 = SE3.identity((8,))
        ref = batched_sparse_align(ref_pyrs, cur_pyrs, CAM, px, d, m, T0)
        mesh = make_mesh(8)
        out = sharded_batch_align(
            mesh, ref_pyrs, cur_pyrs, CAM, px, d, m, T0
        )
        np.testing.assert_allclose(
            np.asarray(out.params7()), np.asarray(ref.params7()),
            atol=1e-5,
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestBatchedTrackStep:
    """Full batched per-frame step (sparse align + patch align +
    pose-only BA across S sequences in one call)."""

    def _problem(self, S=3, N=60):
        from ygz_slam_tpu.ops.interp import sample_patches

        rng = np.random.default_rng(0)
        T_gt = se3.exp(jnp.asarray(
            [0.02, -0.01, 0.005, 0.002, -0.003, 0.001], jnp.float32))
        refs, curs, pxs, ds, pws, pats = [], [], [], [], [], []
        H, W = SHAPE
        for s in range(S):
            sc = PlaneScene(CAM, plane_z=3.0, seed=70 + s)
            ir = sc.render(SE3.identity(), SHAPE)
            ic = sc.render(T_gt, SHAPE)
            px = jnp.asarray(np.c_[
                rng.uniform(15, W - 15, N), rng.uniform(15, H - 15, N)
            ], jnp.float32)
            d = sc.depth(px, SE3.identity())
            pw = CAM.pixel_to_world(
                px, SE3.identity(), depth=d, distorted=False
            )
            refs.append(pyramid.build_pyramid(ir, 3))
            curs.append(pyramid.build_pyramid(ic, 3))
            pxs.append(px); ds.append(d); pws.append(pw)
            pats.append(sample_patches(ir, px, 10))
        rp = tuple(jnp.stack([r[l] for r in refs]) for l in range(3))
        cp = tuple(jnp.stack([c[l] for c in curs]) for l in range(3))
        return (rp, cp, jnp.stack(pxs), jnp.stack(ds), jnp.stack(pws),
                jnp.stack(pats), T_gt, S, N)

    def test_full_step_converges_per_sequence(self):
        from ygz_slam_tpu.parallel import batched_track_step

        rp, cp, px, d, pw, pat, T_gt, S, N = self._problem()
        T0 = SE3.from_params7(
            jnp.tile(SE3.identity().params7()[None], (S, 1))
        )
        T_out, inl = jax.jit(lambda: batched_track_step(
            rp, cp, CAM, px, d, jnp.ones((S, N), bool), pw, pat, T0
        ))()
        for s in range(S):
            err = float(se3.distance(
                jax.tree.map(lambda a: a[s], T_out), T_gt
            ))
            assert err < 5e-3, (s, err)
            assert int(inl[s]) > 0.8 * N, (s, int(inl[s]))

    def test_batched_align2d_matches_single(self):
        """CPU fallback of batched_align2d must equal per-sequence
        align2d exactly (same code path, vmapped)."""
        from ygz_slam_tpu.ops.align import align2d
        from ygz_slam_tpu.parallel import batched_align2d
        from ygz_slam_tpu.ops.interp import sample_patches

        rng = np.random.default_rng(1)
        S, N = 2, 40
        H, W = SHAPE
        imgs, pats, inits = [], [], []
        for s in range(S):
            sc = PlaneScene(CAM, plane_z=3.0, seed=90 + s)
            img = sc.render(SE3.identity(), SHAPE)
            px = jnp.asarray(np.c_[
                rng.uniform(15, W - 15, N), rng.uniform(15, H - 15, N)
            ], jnp.float32)
            imgs.append(img)
            pats.append(sample_patches(img, px, 10))
            inits.append(px + jnp.asarray(
                rng.uniform(-2, 2, (N, 2)), jnp.float32))
        xy, conv, err = batched_align2d(
            jnp.stack(imgs), jnp.stack(pats), jnp.stack(inits)
        )
        for s in range(S):
            r = align2d(imgs[s], pats[s], inits[s])
            assert np.allclose(np.asarray(xy[s]), np.asarray(r.xy),
                               atol=1e-5)
            assert np.array_equal(np.asarray(conv[s]),
                                  np.asarray(r.converged))


class TestFusedBatchPath:
    """The TPU batch path (USE_FUSED_BATCH: per-sequence mega kernels +
    one flattened fused align2d) in interpret mode."""

    @pytest.fixture(autouse=True)
    def interpret_mode(self, monkeypatch):
        import functools
        from jax.experimental import pallas as pl
        from ygz_slam_tpu.ops.pallas import align2d_kernel as ak

        monkeypatch.setattr(
            pl, "pallas_call",
            functools.partial(pl.pallas_call, interpret=True))
        monkeypatch.setattr(ak, "on_tpu", lambda: True)

    def test_fused_step_matches_fallback(self):
        from ygz_slam_tpu.parallel import batch_tracking as bt
        from ygz_slam_tpu.ops.sparse_align import prepare_reference
        from ygz_slam_tpu.ops.pallas.align2d_fused import align2d_prepare

        helper = TestBatchedTrackStep()
        rp, cp, px, d, pw, pat, T_gt, S, N = helper._problem(S=2, N=50)
        mask = jnp.ones((S, N), bool)
        T0 = SE3.from_params7(
            jnp.tile(SE3.identity().params7()[None], (S, 1)))
        ref_preps = [
            prepare_reference(tuple(r[s] for r in rp), CAM, px[s], d[s],
                              mask[s], distorted=False)
            for s in range(S)
        ]
        a2d_prep = align2d_prepare(pat.reshape(S * N, 10, 10))

        prev = bt.USE_FUSED_BATCH
        try:
            bt.USE_FUSED_BATCH = True
            T_f, inl_f = bt.batched_track_step(
                rp, cp, CAM, px, d, mask, pw, pat, T0,
                ref_preps=ref_preps, a2d_prep=a2d_prep)
            bt.USE_FUSED_BATCH = False
            T_s, inl_s = bt.batched_track_step(
                rp, cp, CAM, px, d, mask, pw, pat, T0,
                ref_preps=ref_preps, a2d_prep=a2d_prep)
        finally:
            bt.USE_FUSED_BATCH = prev
        for s in range(S):
            err = float(se3.distance(
                jax.tree.map(lambda a: a[s], T_f), T_gt))
            assert err < 5e-3, (s, err)
            assert int(inl_f[s]) > 0.8 * N, (s, int(inl_f[s]))
            # The fused path must agree with the unfused fallback, not
            # just with ground truth.
            err_fs = float(se3.distance(
                jax.tree.map(lambda a: a[s], T_f),
                jax.tree.map(lambda a: a[s], T_s)))
            assert err_fs < 5e-3, (s, err_fs)
            assert abs(int(inl_f[s]) - int(inl_s[s])) <= 0.1 * N, (
                s, int(inl_f[s]), int(inl_s[s]))
