"""Cross-epoch map merging (mini-Atlas): after a hard reset, the new
map lives in a fresh world frame/scale; a verified loop against an
OLD-epoch archived keyframe must MERGE the young map back — rebasing
its poses and landmarks by the measured Sim(3) — so the trajectory
becomes globally consistent again.  The reference's keep-everything
Memory never faces this (it also never implements recovery at all);
this is ORB-SLAM3-Atlas-class behavior built on this repo's Sim(3) +
P3P machinery.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status
from ygz_slam_tpu.utils.synthetic import PlaneScene

pytestmark = pytest.mark.slow  # two VO passes over a rendered sweep

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)


def test_reset_then_revisit_merges_epochs():
    n = 36
    scene = PlaneScene(CAM, plane_z=3.0, seed=3)
    poses = []
    for k in range(n):
        t = k / (n - 1)
        xi = jnp.asarray(
            [1.6 * t, 0.1 * np.sin(2 * np.pi * t), 0.0,
             0.0, -0.06 * np.sin(np.pi * t), 0.0], jnp.float32)
        poses.append(se3.exp(xi))
    imgs = [scene.render(T, SHAPE) for T in poses]
    vo = VisualOdometry(CAM, VOOptions(
        init_min_disparity=15.0, kf_min_frames=4, kf_max_trans=0.03,
        loop_min_frame_gap=8,
    ))
    # Epoch 0: sweep out, building keyframes along the way.
    pose_log_epoch0 = {}
    for k in range(n):
        r = vo.add_frame(imgs[k], timestamp=float(k))
        if r.status == Status.GOOD:
            pose_log_epoch0[k] = np.asarray(r.T_cw.params7())
    assert vo.status == Status.GOOD
    n_arc0 = (vo.archive.count if vo.archive else 0) \
        + len(vo.server.kf_used)
    # Hard reset: new epoch, old map archived (NOT discarded).
    vo.reset()
    assert vo.epoch == 1
    assert vo.archive.count >= 3, vo.archive.count
    assert (vo.archive.epochs() == 0).all()
    # Epoch 1: re-traverse the start region.  The young map
    # re-initializes in a fresh frame and scale; keyframe-time loop
    # detection against the epoch-0 archive must fire and MERGE.
    for j, k in enumerate(range(0, 26)):
        r = vo.add_frame(imgs[k], timestamp=float(200 + j))
    assert vo.stats.get("maps_merged", 0) >= 1, dict(vo.stats)
    assert vo.epoch == 0
    # After the merge the CURRENT pose must be consistent with the
    # epoch-0 world frame: compare against the pose epoch 0 logged
    # for the same ground-truth viewpoint.
    k_last = 25
    assert r.status == Status.GOOD
    ref = pose_log_epoch0.get(k_last)
    assert ref is not None
    from ygz_slam_tpu.utils import np_se3
    rel = np_se3.relative7(np.asarray(r.T_cw.params7()), ref)
    # Identical viewpoint -> near-identity relative pose in the merged
    # frame (tolerances cover the two runs' independent drift).
    ang = 2 * np.arccos(np.clip(abs(rel[0]), 0, 1))
    assert np.linalg.norm(rel[4:7]) < 0.12, rel
    assert ang < 0.1, ang


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
