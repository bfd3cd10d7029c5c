"""Shared tracking-bench workload: the reference's envelope (640x480,
3-level pyramid, 200 features) on a REALISTIC camera trajectory.

Earlier bench revisions re-used one displaced frame with a +1%/frame
global brightness ramp — static pose, so every frame after the first
was a warm-started no-op for the pose, while the brightness offset
(unmodelled by the offset-free sparse-direct objective) denied the GN
loops their early exit.  Neither happens with a real camera.  Here the
camera flies a smooth sinusoidal trajectory around the keyframe with
~1.5-2 px/frame of image motion (30 fps handheld envelope) plus 0.5%
sensor noise per frame, and the accuracy gate checks EVERY frame's
pose against its ground truth.

Used by bench.py, _bench_profile.py and _bench_ab2.py so ablation
numbers stay comparable to the headline metric.
"""
import numpy as np
import jax.numpy as jnp

# Chunk depth: each jit EXECUTION over the axon tunnel costs ~26 ms
# FIXED dispatch/round-trip overhead regardless of work (measured by
# varying the chunk: 120/240/480 frames -> 54.2/82.1/139.7 ms, slope
# 0.2375 ms/frame = the device time, intercept 25.7 ms).  960 frames
# (32 s of 30 fps video, 1.2 GB of HBM) amortizes it to ~2.5%
# (measured +8.7% over 480: _bench_ab2 X960).
N_FRAMES = 960
H, W, N = 480, 640, 200
NOISE = 0.005


def make_workload(n_frames: int = N_FRAMES):
    """Returns (cam, px, depth, mask, pts_w, patches, ref_pyr,
    frames [F,H,W], T_gt7 [F,7]) — everything a track-chunk needs plus
    per-frame ground truth."""
    from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
    from ygz_slam_tpu.ops import pyramid
    from ygz_slam_tpu.ops.interp import sample_patches
    from ygz_slam_tpu.utils.synthetic import PlaneScene

    cam = PinholeCamera.create(517.3, 516.5, W / 2, H / 2)
    scene = PlaneScene(cam, plane_z=3.0, seed=0, tex_per_meter=220.0)
    T_ref = SE3.identity()
    img_ref = scene.render(T_ref, (H, W))
    rng = np.random.default_rng(0)
    px = jnp.asarray(
        np.c_[rng.uniform(30, W - 30, N), rng.uniform(30, H - 30, N)],
        jnp.float32,
    )
    depth = scene.depth(px, T_ref)
    mask = jnp.ones(N, bool)
    pts_w = cam.pixel_to_world(px, T_ref, depth=depth, distorted=False)
    patches = sample_patches(img_ref, px, 10)
    ref_pyr = pyramid.build_pyramid(img_ref, 3)

    # Smooth trajectory: ~0.008 m/frame translation at 3 m depth and
    # f=517 -> ~1.4 px/frame, plus slow rotation.  Amplitudes keep all
    # 200 keyframe features inside the frustum for all 120 frames.
    def pose(i):
        s = 2.0 * np.pi * i / 40.0
        xi = np.array([
            0.050 * np.sin(s),
            0.035 * np.sin(2 * s + 0.7),
            0.030 * np.cos(s) - 0.030,
            0.0040 * np.sin(s + 0.3),
            0.0050 * np.cos(2 * s),
            0.0030 * np.sin(s),
        ], np.float32)
        base = np.array([0.04, -0.02, 0.01, 0.004, -0.006, 0.003],
                        np.float32)
        return se3.exp(jnp.asarray(base + xi))

    Ts = [pose(i) for i in range(n_frames)]
    frames = []
    for i, T in enumerate(Ts):
        img = scene.render(T, (H, W))
        img = img + jnp.asarray(
            np.random.default_rng(100 + i).normal(0, NOISE, (H, W)),
            jnp.float32,
        )
        frames.append(img)
    frames = jnp.stack(frames)
    T_gt7 = jnp.stack([T.params7() for T in Ts])
    return cam, px, depth, mask, pts_w, patches, ref_pyr, frames, T_gt7


def gate(T7_all, inliers, T_gt7):
    """Per-frame accuracy gate: every tracked pose lands on its ground
    truth with a healthy inlier count.  Returns (max_err, min_inl, ok).

    Batched (one dispatch): a Python per-frame loop costs 2 tunnel
    round-trips per frame — minutes at 480+ frame chunks."""
    import jax
    from ygz_slam_tpu.geometry import SE3, se3

    d = jax.jit(jax.vmap(
        lambda a, b: se3.distance(SE3.from_params7(a), SE3.from_params7(b))
    ))(T7_all, T_gt7)
    max_err = float(jnp.max(d))
    min_inl = int(jnp.min(inliers))
    return max_err, min_inl, (max_err < 2e-2 and min_inl > int(0.75 * N))
