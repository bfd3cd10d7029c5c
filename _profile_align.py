"""A/B: per-iteration window kernel vs one cached 32x32 window."""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from ygz_slam_tpu.geometry import SE3, PinholeCamera, se3
from ygz_slam_tpu.ops.align import align2d
from ygz_slam_tpu.ops.interp import sample_patches
from ygz_slam_tpu.ops.pallas import align2d_kernel as ak
from ygz_slam_tpu.utils.synthetic import PlaneScene

H, W, N = 480, 640, 200
cam = PinholeCamera.create(517.3, 516.5, W/2, H/2)
scene = PlaneScene(cam, plane_z=3.0, seed=0, tex_per_meter=220.0)
T_cur = se3.exp(jnp.asarray([0.04,-0.02,0.01,0.004,-0.006,0.003]))
img_ref = scene.render(SE3.identity(), (H,W))
img_cur = scene.render(T_cur, (H,W))
rng = np.random.default_rng(0)
px = jnp.asarray(np.c_[rng.uniform(30,W-30,N), rng.uniform(30,H-30,N)], jnp.float32)
depth = scene.depth(px, SE3.identity())
pts_w = cam.pixel_to_world(px, SE3.identity(), depth=depth, distorted=False)
patches = sample_patches(img_ref, px, 10)
proj = cam.world_to_pixel(pts_w, T_cur, distorted=False)
init = proj + jnp.asarray(rng.uniform(-3, 3, (N,2)), jnp.float32)

def align2d_cached(cur_img, ref_pb, xy_init, n_iter=10, win=32):
    Np = ref_pb.shape[0]
    Hh, Ww = cur_img.shape
    PATCH = 8
    ref = ref_pb[:, 1:-1, 1:-1].reshape(Np, -1)
    dxp = 0.5*(ref_pb[:,1:-1,2:]-ref_pb[:,1:-1,:-2])
    dyp = 0.5*(ref_pb[:,2:,1:-1]-ref_pb[:,:-2,1:-1])
    J = jnp.stack([dxp,dyp,jnp.ones_like(dxp)],axis=-1).reshape(Np,-1,3)
    H3 = jnp.einsum("npa,npb->nab",J,J)
    Hinv = jnp.linalg.inv(H3 + 1e-6*jnp.eye(3))
    half = (PATCH-1)/2.0
    slack = (win - PATCH - 1)//2
    # one cached window per point, centered at init
    ox = jnp.clip(jnp.floor(xy_init[:,0]-half)- slack, 0, Ww-win).astype(jnp.int32)
    oy = jnp.clip(jnp.floor(xy_init[:,1]-half)- slack, 0, Hh-win).astype(jnp.int32)
    wins = ak.gather_windows(cur_img, ox, oy, win)   # [N,win,win]
    # sample 8x8 patch inside the cached window at fractional offset
    iy = jnp.arange(PATCH)
    def sample(xy):
        fx = xy[:,0] - half - ox.astype(xy.dtype)
        fy = xy[:,1] - half - oy.astype(xy.dtype)
        fx = jnp.clip(fx, 0.0, win - PATCH - 1.0)
        fy = jnp.clip(fy, 0.0, win - PATCH - 1.0)
        x0 = jnp.floor(fx).astype(jnp.int32); y0 = jnp.floor(fy).astype(jnp.int32)
        ax = (fx - x0)[:,None,None]; ay = (fy - y0)[:,None,None]
        # per-point dynamic 9x9 slice via take_along_axis
        rows = y0[:,None] + jnp.arange(PATCH+1)[None,:]
        cols = x0[:,None] + jnp.arange(PATCH+1)[None,:]
        sub = jnp.take_along_axis(wins, rows[:,:,None], axis=1)
        sub = jnp.take_along_axis(sub, cols[:,None,:], axis=2)  # [N,9,9]
        cur = (sub[:, :PATCH, :PATCH]*(1-ax)*(1-ay)
             + sub[:, :PATCH, 1:]*ax*(1-ay)
             + sub[:, 1:, :PATCH]*(1-ax)*ay
             + sub[:, 1:, 1:]*ax*ay)
        return cur.reshape(Np,-1)
    def cond(st):
        _,_,it,ms = st
        return (it < n_iter) & (ms > 0.03)
    def body(st):
        xy, mean, it, _ = st
        r = sample(xy) - ref + mean[:,None]
        g = jnp.einsum("npa,np->na", J, r)
        upd = jnp.einsum("nab,nb->na", Hinv, g)
        step = jnp.max(jnp.linalg.norm(upd[:,:2],axis=-1))
        return xy-upd[:,:2], mean-upd[:,2], it+1, step
    xy0 = xy_init.astype(cur_img.dtype)
    xy, mean, _, _ = jax.lax.while_loop(cond, body,
        (xy0, jnp.zeros(Np, cur_img.dtype), jnp.asarray(0,jnp.int32),
         jnp.asarray(jnp.inf, cur_img.dtype)))
    err = jnp.mean(jnp.abs(sample(xy)-ref+mean[:,None]),axis=1)
    return xy, mean, err

def timeit(name, fn, *a, reps=50):
    out = fn(*a); jax.block_until_ready(out)
    ts=[]
    for _ in range(3):
        t0=time.perf_counter()
        for _ in range(reps): out = fn(*a)
        jax.block_until_ready(out)
        ts.append((time.perf_counter()-t0)/reps)
    print(f"{name}: {sorted(ts)[1]*1e3:.3f} ms")
    return out

f_old = jax.jit(lambda img, xy: align2d(img, patches, xy))
r_old = timeit("align2d_current", f_old, img_cur, init)
f_new = jax.jit(lambda img, xy: align2d_cached(img, patches, xy))
r_new = timeit("align2d_cached32", f_new, img_cur, init)
xy_o = np.asarray(r_old.xy); xy_n = np.asarray(r_new[0])
conv_o = np.asarray(r_old.converged)
d = np.linalg.norm(xy_o - xy_n, axis=1)
print("agree (converged pts) max px diff:", d[conv_o].max(), "n_conv_old:", conv_o.sum())
err_true = np.linalg.norm(xy_n - np.asarray(proj), axis=1)
print("cached vs true proj: median", np.median(err_true))
