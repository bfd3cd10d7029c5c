"""Real-TPU smoke of the PRODUCT tracking path (not the bench path):
VisualOdometry.add_frames on the axon chip, exercising the per-level
multi-image window gather + fused align2d + sparse mega kernel + pose
BA inside the chunked scan.  Asserts tracking stays GOOD with sane
poses.  Run under the driver's TPU environment (no CPU override).
"""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def main():
    from ygz_slam_tpu.geometry import PinholeCamera, se3
    from ygz_slam_tpu.models import VisualOdometry, VOOptions, Status
    from ygz_slam_tpu.utils.synthetic import PlaneScene

    print("backend:", jax.devices()[0].platform, flush=True)
    CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
    scene = PlaneScene(CAM, plane_z=3.0, seed=0)
    n = 40
    poses, imgs = [], []
    for k in range(n):
        t = k / (n - 1)
        xi = jnp.asarray(
            [1.1 * t, 0.18 * np.sin(2 * t), 0.3 * t,
             0.03 * np.sin(3 * t), -0.16 * t, 0.03 * t], jnp.float32,
        )
        T = se3.exp(xi)
        poses.append(T)
        imgs.append(np.asarray(scene.render(T, (240, 320))))
    vo = VisualOdometry(CAM, VOOptions(
        init_min_disparity=15.0, kf_min_frames=5, kf_max_trans=0.04,
        kf_max_rot=0.05, chunk_frames=8,
    ))
    t0 = time.perf_counter()
    results = vo.add_frames(imgs, [float(k) for k in range(n)])
    dt = time.perf_counter() - t0
    statuses = [r.status for r in results]
    n_good = sum(s == Status.GOOD for s in statuses)
    est, gt = [], []
    for k, r in enumerate(results):
        if r.status == Status.GOOD:
            est.append(np.asarray(-(np.asarray(r.T_cw.R).T
                                    @ np.asarray(r.T_cw.t))))
            gt.append(np.asarray(-(np.asarray(poses[k].R).T
                                   @ np.asarray(poses[k].t))))
    import sys
    sys.path.insert(0, "tests")
    from test_vo import sim3_align_ate
    ate = sim3_align_ate(np.array(est), np.array(gt))
    ok = (n_good > n * 0.5 and statuses[-1] == Status.GOOD
          and ate < 0.05)
    print(json.dumps({
        "tpu_vo_smoke": "ok" if ok else "FAIL",
        "good": n_good, "n": n, "ate": round(float(ate), 4),
        "wall_s": round(dt, 1), "stats": dict(vo.stats),
    }))
    assert ok, (n_good, statuses[-1], ate)


if __name__ == "__main__":
    main()
