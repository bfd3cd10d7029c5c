"""Vocabulary (BoW) and pose-graph optimizer tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3, so3
from ygz_slam_tpu.map import vocabulary as voc
from ygz_slam_tpu.solvers import pose_graph as pg
from ygz_slam_tpu.ops import fast, orb, pyramid
from ygz_slam_tpu.utils.synthetic import PlaneScene

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)


def training_descriptors(n_imgs=6, seed=0):
    descs = []
    for i in range(n_imgs):
        scene = PlaneScene(CAM, plane_z=3.0, seed=seed + i)
        img = scene.render(SE3.identity(), (240, 320))
        c = fast.detect(img, 20.0, cell=12, max_corners=200)
        _, d = orb.compute(img, c.xy)
        descs.append(np.asarray(d)[np.asarray(c.mask)])
    return np.concatenate(descs)


DESCS = training_descriptors()
VOCAB = voc.train(DESCS, k=6, depth=2, iters=4)


class TestVocabulary:
    def test_transform_assigns_words(self):
        d = jnp.asarray(DESCS[:64])
        words, mid = voc.transform(VOCAB, d, jnp.ones(64, bool))
        assert int(words.min()) >= 0
        assert int(words.max()) < VOCAB.n_words
        # Same descriptor -> same word, deterministic.
        w2, _ = voc.transform(VOCAB, d, jnp.ones(64, bool))
        np.testing.assert_array_equal(np.asarray(words), np.asarray(w2))

    @pytest.mark.slow
    def test_same_scene_scores_higher(self):
        # Needs a discriminative vocabulary: two scenes drawn from the
        # same texture process share word statistics at 64 words; at
        # ~1000 words same-scene similarity wins.
        big = voc.train(training_descriptors(n_imgs=8), k=10, depth=3, iters=3)
        scene = PlaneScene(CAM, plane_z=3.0, seed=100)
        imgA = scene.render(SE3.identity(), (240, 320))
        # Slightly moved view of the SAME scene.
        imgB = scene.render(se3.exp(jnp.asarray([0.04, 0.01, 0.0, 0.0, -0.01, 0.0], jnp.float32)), (240, 320))
        # A DIFFERENT scene.
        sceneC = PlaneScene(CAM, plane_z=3.0, seed=200)
        imgC = sceneC.render(SE3.identity(), (240, 320))

        def bow(img):
            c = fast.detect(img, 20.0, cell=12, max_corners=200)
            _, d = orb.compute(img, c.xy)
            words, _ = voc.transform(big, d, c.mask)
            return voc.bow_vector(big, words, c.mask)

        vA, vB, vC = bow(imgA), bow(imgB), bow(imgC)
        sAB = float(voc.score_l1(vA, vB))
        sAC = float(voc.score_l1(vA, vC))
        assert sAB > sAC, (sAB, sAC)

    def test_node_matching_filters(self):
        d = jnp.asarray(DESCS[:48])
        words, mid = voc.transform(VOCAB, d, jnp.ones(48, bool))
        idx, ok = voc.match_by_nodes(
            d, mid, jnp.ones(48, bool), d, mid, jnp.ones(48, bool),
            max_dist=0, ratio=1.0,
        )
        # Exact self-matching at distance 0 must find identity.
        matched = np.asarray(idx[np.asarray(ok)])
        rows = np.arange(48)[np.asarray(ok)]
        # Each matched row maps to a descriptor with identical bits.
        da = np.asarray(d)
        for r, m in zip(rows, matched):
            assert (da[r] == da[m]).all()

    def test_jit_transform(self):
        d = jnp.asarray(DESCS[:64])
        f = jax.jit(lambda d, m: voc.transform(VOCAB, d, m))
        words, _ = f(d, jnp.ones(64, bool))
        assert words.shape == (64,)


class TestPoseGraph:
    def _ring(self, K=8, drift=0.05, seed=0):
        """Ground truth ring; odometry edges with drift; one loop edge."""
        rng = np.random.default_rng(seed)
        gt = []
        for k in range(K):
            a = 2 * np.pi * k / K
            T = SE3(
                so3.exp(jnp.asarray([0, 0, a], jnp.float32)),
                jnp.asarray([np.cos(a), np.sin(a), 0.0], jnp.float32),
            )
            gt.append(T)
        gt = jax.tree.map(lambda *x: jnp.stack(x), *gt)
        # Drifted estimate: accumulate noisy odometry.
        est = [jax.tree.map(lambda a: a[0], gt)]
        for k in range(1, K):
            Tk = jax.tree.map(lambda a: a[k], gt)
            Tp = jax.tree.map(lambda a: a[k - 1], gt)
            d = Tk.compose(Tp.inverse())
            noise = se3m_exp(rng.normal(0, drift, 6))
            est.append(noise.compose(d).compose(est[-1]))
        est = jax.tree.map(lambda *x: jnp.stack(x), *est)
        # Edges: odometry (measured = true relative) + loop closure K-1 -> 0.
        ii = list(range(K - 1)) + [K - 1]
        jj = list(range(1, K)) + [0]
        T_ji = []
        for a, b in zip(ii, jj):
            Ta = jax.tree.map(lambda x: x[a], gt)
            Tb = jax.tree.map(lambda x: x[b], gt)
            T_ji.append(Tb.compose(Ta.inverse()).params7())
        edges = pg.PoseGraphEdges(
            i=jnp.asarray(ii, jnp.int32),
            j=jnp.asarray(jj, jnp.int32),
            T_ji7=jnp.stack(T_ji),
            weight=jnp.ones(K, jnp.float32),
            mask=jnp.ones(K, bool),
        )
        return gt, est, edges

    def test_corrects_drift(self):
        gt, est, edges = self._ring()
        K = 8
        fixed = jnp.zeros(K, bool).at[0].set(True)
        opt, chi2 = pg.optimize(est, edges, fixed, n_iter=30)
        err_before = float(jax.vmap(se3.distance)(est, gt).mean())
        err_after = float(jax.vmap(se3.distance)(opt, gt).mean())
        assert err_after < err_before * 0.2, (err_before, err_after)
        assert float(chi2) < 1e-4

    def test_fixed_stays(self):
        gt, est, edges = self._ring()
        fixed = jnp.zeros(8, bool).at[0].set(True)
        opt, _ = pg.optimize(est, edges, fixed, n_iter=10)
        assert float(se3.distance(
            jax.tree.map(lambda a: a[0], opt),
            jax.tree.map(lambda a: a[0], est),
        )) < 1e-5

    def test_edges_from_covisibility(self):
        K = 5
        pose7 = jnp.tile(SE3.identity().params7(), (K, 1))
        cov = jnp.zeros((K, K), jnp.int32)
        cov = cov.at[0, 1].set(50).at[1, 0].set(50)
        cov = cov.at[1, 2].set(5).at[2, 1].set(5)
        valid = jnp.ones(K, bool).at[4].set(False)
        edges = pg.edges_from_covisibility(pose7, cov, valid, min_weight=10)
        m = np.asarray(edges.mask).reshape(K, K)
        assert m[0, 1] and not m[1, 2] and not m[1, 0]


def se3m_exp(xi):
    return se3.exp(jnp.asarray(xi, jnp.float32))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
