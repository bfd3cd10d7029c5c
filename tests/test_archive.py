"""Global-map tier (KeyframeArchive): eviction archival, archive
relocalization, and long-range loop closing against EVICTED keyframes.

The reference's Memory singleton keeps every keyframe forever
(include/ygz/Basic/Memory.h:16-56); the TPU build's active window is a
fixed-capacity MapState, so this tier is what makes relocalization and
loop closing work beyond the last ~K keyframes.
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # long eviction/loop/reactivation runs

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status
from ygz_slam_tpu.models import frontend as fe
from ygz_slam_tpu.utils.synthetic import PlaneScene
from ygz_slam_tpu.utils import np_se3

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)

# Small window + fast keyframe cadence so eviction happens quickly.
ARC_OPTS = dict(
    init_min_disparity=15.0, kf_min_frames=4, kf_max_trans=0.03,
    kf_max_rot=0.04, map_K=6, loop_min_frame_gap=30,
)


def out_and_back_trajectory(n):
    """Sideways sweep that leaves the start view and returns to it."""
    poses = []
    for k in range(n):
        t = k / max(n - 1, 1)
        x = 1.3 * np.sin(np.pi * t)          # 0 -> 1.3 m -> 0
        xi = jnp.asarray(
            [x, 0.1 * np.sin(2 * np.pi * t), 0.0,
             0.0, -0.08 * np.sin(np.pi * t), 0.0],
            jnp.float32,
        )
        poses.append(se3.exp(xi))
    return poses


def render(poses, scene):
    return [scene.render(T, SHAPE) for T in poses]


def run_vo(imgs, opts=None):
    vo = VisualOdometry(CAM, VOOptions(**(opts or ARC_OPTS)))
    for k, img in enumerate(imgs):
        vo.add_frame(img, timestamp=float(k))
    return vo


class TestEvictionArchival:
    def test_evicted_keyframes_are_archived(self):
        n = 60
        scene = PlaneScene(CAM, plane_z=3.0, seed=3)
        poses = out_and_back_trajectory(n)
        vo = run_vo(render(poses[: n // 2], scene))  # one-way half
        assert len(vo.server.kf_used) <= vo.o.map_K
        assert vo.archive is not None
        assert vo.archive.count >= 1, "no keyframe was ever archived"
        ids = vo.archive.frame_ids()
        assert len(set(ids.tolist())) == len(ids)
        # Archived records must carry usable landmark snapshots.
        view = vo.archive.device_view()
        n_pts = int(view.pt_ok[: vo.archive.count].sum())
        assert n_pts > 20, f"archived landmark snapshots too sparse: {n_pts}"
        # Every archived keyframe is in the pose log (trajectory anchor).
        for fid in ids:
            assert int(fid) in vo.kf_pose_log

    def test_archive_survives_save_load(self, tmp_path):
        from ygz_slam_tpu.system.system import System, Sensor

        n = 30
        scene = PlaneScene(CAM, plane_z=3.0, seed=3)
        poses = out_and_back_trajectory(60)[:n]
        sys1 = System(camera=CAM, sensor=Sensor.MONOCULAR,
                      options=VOOptions(**ARC_OPTS))
        for k, img in enumerate(render(poses, scene)):
            sys1.track_monocular(img, float(k))
        if sys1.vo.archive.count == 0:
            pytest.skip("no eviction happened in this short run")
        p = str(tmp_path / "map.npz")
        sys1.save_map(p)
        sys2 = System(camera=CAM, sensor=Sensor.MONOCULAR,
                      options=VOOptions(**ARC_OPTS))
        sys2.load_map(p)
        assert sys2.vo.archive.count == sys1.vo.archive.count
        np.testing.assert_allclose(
            sys2.vo.archive.poses7(), sys1.vo.archive.poses7()
        )


    def test_post_reset_eviction_still_archives(self):
        """reset() builds a FRESH MapServer — the eviction hook must be
        re-wired on it, or every post-reset eviction silently drops the
        keyframe and the global tier never sees post-reset history
        (round-3 advisor finding, severity high)."""
        n = 30
        scene = PlaneScene(CAM, plane_z=3.0, seed=3)
        poses = out_and_back_trajectory(60)[:n]
        imgs = render(poses, scene)
        vo = run_vo(imgs)
        assert vo.status == Status.GOOD
        vo.reset()
        assert vo.epoch == 1
        # The fresh server must have the archival hook wired.
        assert vo.server.on_evict is not None
        # Re-run the sweep in the new epoch until keyframes exist,
        # then force an eviction and check it lands in the archive
        # with the new epoch tag.
        for j, img in enumerate(imgs):
            vo.add_frame(img, timestamp=float(100 + j))
            if len(vo.server.kf_used) >= 2:
                break
        assert len(vo.server.kf_used) >= 2, "post-reset run built no KFs"
        before = vo.archive.count
        vo.server.evict_kf(vo.server.kf_used[0])
        assert vo.archive.count == before + 1, (
            "post-reset eviction was dropped instead of archived"
        )
        assert int(vo.archive.epochs()[vo.archive.count - 1]) == 1


class TestArchiveRelocalization:
    def test_relocalize_against_evicted_keyframe(self):
        """After the camera has moved far enough that the start-of-run
        keyframes were evicted, a query rendered at the start pose must
        still relocalize — via the archive tier."""
        n = 36
        scene = PlaneScene(CAM, plane_z=3.0, seed=3)
        # One-way sweep (t in [0, 0.5] of the out-and-back).
        poses = out_and_back_trajectory(2 * n)[:n]
        imgs = render(poses, scene)
        vo = run_vo(imgs)
        assert vo.archive.count >= 1, "need evictions for this test"
        early_fid = int(vo.archive.frame_ids()[0])
        # Query at an early archived pose (the VO's world frame is the
        # first keyframe with mean depth normalized to 1, so compare
        # against the ARCHIVED pose, not the GT pose).
        q_pyr = fe.preprocess(imgs[max(early_fid, 2)], vo.o.n_levels)
        feats = vo._jit_detect_free(q_pyr)
        ra = vo._jit_reloc_arc(
            feats.desc, feats.px, feats.valid, feats.angle,
            vo.archive.device_view(),
        )
        assert bool(ra.success), "archive relocalization failed"
        # Recovered camera center must be near the archived keyframe's.
        arc_pose = vo.kf_pose_log[early_fid]
        R, t = np_se3.params7_to_Rt(arc_pose)
        c_arc = -R.T @ t
        c_est = -np.asarray(ra.T_cw.R).T @ np.asarray(ra.T_cw.t)
        err = float(np.linalg.norm(c_est - c_arc))
        # Map units (mean depth 1); the query frame is close to but not
        # exactly at the archived keyframe.
        assert err < 0.15, f"reloc center error {err:.3f} map units"


class TestArchiveLoopClosing:
    def test_out_and_back_closes_global_loop(self):
        """VERDICT round-1 'done' criterion: the camera leaves, more
        keyframes than the window holds elapse, it returns — and the
        loop closes against an EVICTED keyframe, correcting the
        trajectory."""
        n = 110
        scene = PlaneScene(CAM, plane_z=3.0, seed=3)
        poses = out_and_back_trajectory(n)
        imgs = render(poses, scene)
        vo = run_vo(imgs)
        # Enough keyframes elapsed that the start was evicted.
        assert vo.archive.count > vo.o.map_K, (
            vo.archive.count, len(vo.server.kf_used)
        )
        assert vo.stats["loops_closed_global"] >= 1, (
            "no global loop closed", dict(vo.stats)
        )
        # The corrected trajectory must still be metrically sane:
        # sim3-aligned ATE over anchored (corrected) poses bounded.
        from tests.test_vo import sim3_align_ate

        entries = vo.trajectory_poses()
        est, gt = [], []
        for (ts, p7) in entries:
            k = int(ts)
            R, t = np_se3.params7_to_Rt(p7)
            est.append(-R.T @ t)
            Tk = poses[k]
            gt.append(np.asarray(-(Tk.R.T @ Tk.t)))
        ate = sim3_align_ate(np.array(est), np.array(gt))
        assert ate < 0.10, f"post-loop ATE {ate:.4f}"

    def test_loop_correction_improves_or_keeps_consistency(self):
        """End-start consistency: after returning to the start view and
        closing the loop, the final anchored pose must be close to the
        starting pose (the whole point of loop closing)."""
        n = 110
        scene = PlaneScene(CAM, plane_z=3.0, seed=7)
        poses = out_and_back_trajectory(n)
        imgs = render(poses, scene)
        vo = run_vo(imgs)
        if vo.stats["loops_closed_global"] == 0:
            # The significance gate declines closures whose measured
            # correction sits below the verifier's noise floor — but
            # then the revisit must still have been geometrically
            # VERIFIED (counted as a confirmation), and the end-start
            # consistency must already hold without a correction.
            assert vo.stats["loops_confirmed"] >= 1, (
                "loop neither closed nor confirmed", dict(vo.stats)
            )
        entries = vo.trajectory_poses()
        # GT returns to start: compare est end vs est start after the
        # global correction, normalized by trajectory span.
        R0, t0 = np_se3.params7_to_Rt(entries[0][1])
        R1, t1 = np_se3.params7_to_Rt(entries[-1][1])
        c0, c1 = -R0.T @ t0, -R1.T @ t1
        centers = []
        for _, p7 in entries:
            R, t = np_se3.params7_to_Rt(p7)
            centers.append(-R.T @ t)
        span = float(np.ptp(np.asarray(centers)[:, 0]))
        gap = float(np.linalg.norm(c1 - c0))
        assert gap < 0.35 * max(span, 1e-6), (
            f"end-start gap {gap:.3f} vs span {span:.3f}"
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestArchiveReactivation:
    def test_kidnapped_camera_resumes_in_old_region(self):
        """Kidnapped-camera recovery: after the start-of-run keyframes
        are evicted, teleporting the camera back to the start must
        (1) relocalize via the archive, (2) REACTIVATE the matched
        keyframe + its landmarks into the active window, and (3) keep
        tracking GOOD on subsequent frames in that region."""
        n = 52
        scene = PlaneScene(CAM, plane_z=3.0, seed=3)
        # One-way sweep FAR enough that the end view shares zero
        # pixels with the start view (3.4 m ~ 363 px shift at the
        # plane > the 320 px image width), so neither LOST-retry nor
        # ACTIVE-window relocalization can recover — only the archive
        # tier can.  (2.6 m stopped being enough once the round-3
        # descriptor tuning made active reloc stronger.)
        poses = []
        for k in range(n):
            t = k / (n - 1)
            xi = jnp.asarray(
                [3.4 * t, 0.1 * np.sin(2 * np.pi * t), 0.0,
                 0.0, -0.05 * np.sin(np.pi * t), 0.0], jnp.float32,
            )
            poses.append(se3.exp(xi))
        imgs = render(poses, scene)
        vo = run_vo(imgs)
        assert vo.archive.count >= 1
        # Eviction order is least-covisible, not temporal: kidnap to
        # the OLDEST archived keyframe (the start of the sweep), which
        # shares no view with the active end-of-sweep window.
        early_fid = int(vo.archive.frame_ids().min())
        k0 = max(early_fid, 2)
        # Kidnap: force LOST, then feed frames from the start region
        # (slight pose offsets so tracking has real work).
        vo.status = Status.LOST
        vo.lost_count = 0
        kf_before = len(vo.server.kf_used)
        statuses = []
        for j in range(5):
            img = imgs[min(k0 + j, n - 1)]
            r = vo.add_frame(img, timestamp=float(100 + j))
            statuses.append(r.status)
        assert vo.stats["relocs_archive"] >= 1, dict(vo.stats)
        assert vo.stats["keyframes_reactivated"] >= 1, dict(vo.stats)
        # Recovery is sticky: tracking stays GOOD after reactivation.
        assert statuses[0] == Status.GOOD, statuses
        assert all(s == Status.GOOD for s in statuses[1:]), statuses
        # And it tracks with real inliers, not a degenerate pose.
        assert r.n_inliers >= vo.o.min_track_inliers, r.n_inliers
