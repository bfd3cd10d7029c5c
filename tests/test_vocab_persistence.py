"""Vocabulary persistence + online refresh: a saved map must
relocalize in ANY process (the vocabulary travels with the map, like
DBoW3's ORBvoc.bin), and the vocabulary can be retrained from the
run's own keyframe descriptors without breaking matching.
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # retrain + reloc e2e runs

from ygz_slam_tpu.geometry import PinholeCamera, se3
from ygz_slam_tpu.map import vocabulary as voc
from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status
from ygz_slam_tpu.models import visual_odometry as vom
from ygz_slam_tpu.system.system import System, Sensor
from ygz_slam_tpu.utils.synthetic import PlaneScene

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)
OPTS = dict(init_min_disparity=15.0, kf_min_frames=5,
            kf_max_trans=0.04, kf_max_rot=0.05)


def short_sequence(n=24, seed=0):
    scene = PlaneScene(CAM, plane_z=3.0, seed=seed)
    imgs = []
    for k in range(n):
        t = k / max(n - 1, 1)
        xi = jnp.asarray(
            [0.8 * t, 0.15 * np.sin(2 * t), 0.25 * t,
             0.02 * np.sin(3 * t), -0.1 * t, 0.02 * t], jnp.float32,
        )
        imgs.append(scene.render(se3.exp(xi), SHAPE))
    return imgs


def train_random_vocab(seed):
    rng = np.random.default_rng(seed)
    descs = rng.integers(0, 2 ** 32, size=(600, 8), dtype=np.uint32)
    return voc.train(descs, k=8, depth=3, iters=2, seed=seed)


class TestVocabSerialization:
    def test_state_dict_roundtrip(self, tmp_path):
        v = train_random_vocab(1)
        p = str(tmp_path / "vocab.npz")
        voc.save(v, p)
        v2 = voc.load(p)
        assert v2.k == v.k and v2.depth == v.depth
        for a, b in zip(v.nodes, v2.nodes):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        rng = np.random.default_rng(3)
        q = jnp.asarray(
            rng.integers(0, 2 ** 32, size=(50, 8), dtype=np.uint32)
        )
        mask = jnp.ones(50, bool)
        w1, n1 = voc.transform(v, q, mask)
        w2, n2 = voc.transform(v2, q, mask)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


class TestCrossProcessReloc:
    def test_load_map_relocalizes_under_foreign_bootstrap_vocab(
        self, tmp_path, monkeypatch
    ):
        """The loading process bootstraps a DIFFERENT vocabulary (as a
        fresh process with another seed would); relocalization against
        the loaded map must still work because load_map restores the
        SAVED vocabulary."""
        imgs = short_sequence()
        sys1 = System(camera=CAM, sensor=Sensor.MONOCULAR,
                      options=VOOptions(**OPTS))
        for k, im in enumerate(imgs):
            r = sys1.track_monocular(im, float(k))
        assert r.status == Status.GOOD
        p = str(tmp_path / "map.npz")
        sys1.save_map(p)
        # Query at the newest keyframe's own frame (relocalization's
        # best case — this test gates VOCABULARY consistency, not
        # reloc's distance envelope).
        m = sys1.vo.server.state
        q_fid = int(np.asarray(m.kf_id)[sys1.vo.server.kf_used[-1]])
        q_img = imgs[q_fid]
        # Simulate a fresh process whose in-process bootstrap vocab is
        # unrelated to the one the map was built with.
        foreign = train_random_vocab(99)
        monkeypatch.setattr(
            vom, "_shared_vocabulary", lambda *a, **kw: foreign
        )
        sys2 = System(camera=CAM, sensor=Sensor.MONOCULAR,
                      options=VOOptions(**OPTS))
        assert sys2.vo.vocab is foreign  # the foreign bootstrap is live
        sys2.load_map(p)
        # The saved vocabulary replaced the foreign one.
        for a, b in zip(sys2.vo.vocab.nodes, sys1.vo.vocab.nodes):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        r2 = sys2.track_monocular(q_img, 99.0)
        assert r2.status == Status.GOOD, "reloc failed after load_map"
        assert r2.n_inliers >= sys2.vo.o.reloc_min_inliers


class TestOnlineVocabRefresh:
    def test_refresh_keeps_relocalization_working(self):
        imgs = short_sequence(seed=5)
        vo = VisualOdometry(CAM, VOOptions(**OPTS))
        for k, im in enumerate(imgs):
            vo.add_frame(im, float(k))
        assert vo.status == Status.GOOD
        old_nodes = [np.asarray(n).copy() for n in vo.vocab.nodes]
        ok = vo.refresh_vocabulary(min_descriptors=100)
        assert ok, "refresh should have enough keyframe descriptors"
        assert vo.stats["vocab_refreshes"] == 1
        changed = any(
            not np.array_equal(np.asarray(a), b)
            for a, b in zip(vo.vocab.nodes, old_nodes)
        )
        assert changed, "vocabulary did not change after retraining"
        # Relocalization against the rebuilt BoW tables still works
        # (query at the newest keyframe's own frame).
        from ygz_slam_tpu.models import frontend as fe
        m = vo.server.state
        q_fid = int(np.asarray(m.kf_id)[vo.server.kf_used[-1]])
        pyr = fe.preprocess(imgs[q_fid], vo.o.n_levels)
        r = vo._try_relocalize(pyr)
        assert r is not None, "reloc failed after vocab refresh"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
