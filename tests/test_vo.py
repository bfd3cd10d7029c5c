"""End-to-end VO tests on rendered synthetic sequences.

The integration analogue of test_vo_init.cpp / test_vo_track.cpp, but
with exact ground truth: a textured-plane world rendered along a
smooth camera trajectory; the VO must initialize monocularly and track
with bounded (scale-aligned) trajectory error.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3, so3
from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status
from ygz_slam_tpu.utils.synthetic import PlaneScene

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)


def make_trajectory(n_frames, seed=0):
    """Smooth sideways + forward sweep with small rotation."""
    poses = []
    for k in range(n_frames):
        t = k / max(n_frames - 1, 1)
        xi = jnp.asarray(
            [1.1 * t, 0.18 * np.sin(2 * t), 0.3 * t,
             0.03 * np.sin(3 * t), -0.16 * t, 0.03 * t],
            jnp.float32,
        )
        poses.append(se3.exp(xi))
    return poses


# Map scale is normalized to mean depth 1 (true scene depth ~3 m), so
# metric keyframe gates shrink by ~3x; these options compensate.
VO_OPTS = dict(
    init_min_disparity=15.0, kf_min_frames=5, kf_max_trans=0.04,
    kf_max_rot=0.05,
)


def render_sequence(n_frames, seed=0):
    scene = PlaneScene(CAM, plane_z=3.0, seed=seed)
    poses = make_trajectory(n_frames, seed)
    imgs = [scene.render(T, SHAPE) for T in poses]
    return scene, poses, imgs


def sim3_align_ate(est_t, gt_t):
    """Scale+rigid alignment (Umeyama) then RMSE — monocular ATE."""
    est = np.asarray(est_t)
    gt = np.asarray(gt_t)
    mu_e, mu_g = est.mean(0), gt.mean(0)
    e, g = est - mu_e, gt - mu_g
    cov = g.T @ e / len(e)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_e = (e ** 2).sum() / len(e)
    s = np.trace(np.diag(D) @ S) / max(var_e, 1e-12)
    t = mu_g - s * R @ mu_e
    aligned = (s * (R @ est.T)).T + t
    return float(np.sqrt(((aligned - gt) ** 2).sum(axis=1).mean()))


@pytest.fixture(scope="module")
def shared_run():
    """ONE 40-frame VO run shared by every test that only inspects the
    outcome (the VO run, not the render, dominates suite time)."""
    n = 40
    scene, poses, imgs = render_sequence(n)
    vo = VisualOdometry(CAM, VOOptions(**VO_OPTS))
    statuses, est, gt, seeds_seen = [], [], [], False
    for k, img in enumerate(imgs):
        r = vo.add_frame(img, timestamp=float(k))
        statuses.append(r.status)
        if vo.seeds is not None:
            seeds_seen = True
        if r.status == Status.GOOD:
            # Camera center in world: -R^T t.
            est.append(np.asarray(-(r.T_cw.R.T @ r.T_cw.t)))
            gt.append(np.asarray(-(poses[k].R.T @ poses[k].t)))
    return dict(vo=vo, n=n, statuses=statuses, est=np.array(est),
                gt=np.array(gt), seeds_seen=seeds_seen)


class TestVOPipeline:
    def test_initializes_and_tracks(self, shared_run):
        n, statuses = shared_run["n"], shared_run["statuses"]
        assert Status.GOOD in statuses, f"never reached GOOD: {statuses}"
        n_good = sum(s == Status.GOOD for s in statuses)
        assert n_good > n * 0.5, f"only {n_good}/{n} frames tracked"
        assert statuses[-1] == Status.GOOD, "lost tracking at the end"
        ate = sim3_align_ate(shared_run["est"], shared_run["gt"])
        # Trajectory spans ~0.6 m; ATE after Sim3 alignment must be cm-level.
        assert ate < 0.05, f"ATE {ate:.4f} m"

    def test_keyframes_inserted(self, shared_run):
        vo = shared_run["vo"]
        assert len(vo.server.kf_used) >= 3, vo.server.kf_used
        m = vo.server.state
        assert int(m.pt_valid.sum()) > 50
        # Covisibility between consecutive keyframes must be nonzero.
        used = vo.server.kf_used
        w = np.asarray(m.cov_weight)
        assert w[used[0], used[1]] > 10

    def test_static_camera_stays_initing(self):
        scene = PlaneScene(CAM, plane_z=3.0, seed=5)
        img = scene.render(SE3.identity(), SHAPE)
        vo = VisualOdometry(CAM, VOOptions())
        for _ in range(5):
            r = vo.add_frame(img)
        assert r.status in (Status.NOT_READY, Status.INITING)

    def test_depth_filter_creates_seeds(self, shared_run):
        """The wired depth filter (legacy C22) must create seeds for
        depthless keyframe features and eventually promote them."""
        assert shared_run["seeds_seen"], "depth filter never created seeds"

    def test_reset(self):
        n = 20
        scene, poses, imgs = render_sequence(n)
        vo = VisualOdometry(CAM, VOOptions(**VO_OPTS))
        for img in imgs:
            vo.add_frame(img)
        vo.reset()
        assert vo.status == Status.NOT_READY
        assert len(vo.server.kf_used) == 0
        # Can re-run after reset.
        for img in imgs[:12]:
            r = vo.add_frame(img)
        assert r.status in (Status.INITING, Status.GOOD)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


@pytest.mark.slow
class TestChunkedTracking:
    """add_frames: whole-chunk on-device scans must reproduce the
    per-frame path (same poses, same keyframes), truncating correctly
    at keyframe boundaries."""

    def test_matches_per_frame_path(self):
        n = 26
        _, poses, imgs = render_sequence(n, seed=11)

        def run(chunked):
            vo = VisualOdometry(CAM, VOOptions(**VO_OPTS))
            if chunked:
                # Small chunk so several chunk dispatches + keyframe
                # truncations happen within the sequence.
                results = vo.add_frames(
                    imgs, [float(k) for k in range(n)], chunk=6)
            else:
                results = [vo.add_frame(im, float(k))
                           for k, im in enumerate(imgs)]
            return vo, results

        vo_c, res_c = run(True)
        vo_f, res_f = run(False)
        assert len(res_c) == len(res_f) == n
        assert [r.status for r in res_c] == [r.status for r in res_f]
        # Identical keyframe sets and per-frame poses (the chunked path
        # replays flagged frames through the SAME per-frame code).
        assert vo_c.server.kf_used == vo_f.server.kf_used
        for k, (a, b) in enumerate(zip(res_c, res_f)):
            if a.T_cw is None or b.T_cw is None:
                continue
            d = float(se3.distance(
                SE3(jnp.asarray(a.T_cw.R), jnp.asarray(a.T_cw.t)),
                SE3(jnp.asarray(b.T_cw.R), jnp.asarray(b.T_cw.t))))
            # The scan body compiles to a differently-fused program
            # than the per-frame jit; f32 reassociation can flip a
            # marginal GN early-exit iteration, so parity is ATE-level
            # (SURVEY §7 "numerical parity"), not bit-level.  Measured
            # worst case 0.00302 (round-5 hysteresis carry changed the
            # scan program's fusion; drift peaks mid-interval and
            # contracts back to ~9e-4 after the next keyframe BA —
            # non-compounding); bound at 1.5x per the round-3 advisor.
            assert d < 4.5e-3, (k, d)
        assert len(vo_c.trajectory) == len(vo_f.trajectory)
