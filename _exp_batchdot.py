"""Mosaic probe: batched one-hot dot_general sampling vs bit-masked
rolls for the align2d-shaped inner loop.

Both kernels sample an 8x8 patch at per-point integer offsets from
[N, 32, 32] (dot) / [N, 1024] (roll) windows, 11 times (the align2d
iteration count), and reduce.  Timed over 200 reps on the chip.
"""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, WIN, P, ITERS = 200, 32, 8, 11


def kernel_roll(w_ref, s_ref, o_ref):
    w0 = w_ref[...]                        # [N, 1024]
    s = s_ref[...]                         # [N, 1] int32 lane offset
    dt = w0.dtype
    acc = jnp.zeros((N, 1), dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WIN * WIN), 1)
    valid = (((lane // WIN) < P) & ((lane % WIN) < P)).astype(dt)
    for i in range(ITERS):
        w = w0
        si = s + i                          # vary per iteration
        for b in range(10):
            bit = ((si >> b) & 1).astype(dt)
            w = bit * pltpu.roll(w, WIN * WIN - (1 << b), 1) + (1 - bit) * w
        acc = acc + jnp.sum(w * valid, axis=1, keepdims=True)
    o_ref[...] = acc


def kernel_dot(w_ref, sy_ref, sx_ref, o_ref):
    w3 = w_ref[...]                        # [N, 32, 32]
    sy = sy_ref[...]                       # [N, 1] int32 row offset
    sx = sx_ref[...]                       # [N, 1] col offset
    dt = w3.dtype
    acc = jnp.zeros((N, 1), dt)
    rr = jax.lax.broadcasted_iota(jnp.int32, (N, P, WIN), 1)
    rh = jax.lax.broadcasted_iota(jnp.int32, (N, P, WIN), 2)
    cc = jax.lax.broadcasted_iota(jnp.int32, (N, WIN, P), 2)
    cw = jax.lax.broadcasted_iota(jnp.int32, (N, WIN, P), 1)
    for i in range(ITERS):
        Prow = ((sy + i)[:, :, None] + rr == rh).astype(dt)   # [N,P,WIN]
        Qcol = (cw == (sx + i)[:, :, None] + cc).astype(dt)   # [N,WIN,P]
        rows = jax.lax.dot_general(
            Prow, w3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dt)                        # [N,P,WIN]
        patch = jax.lax.dot_general(
            rows, Qcol, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dt)                        # [N,P,P]
        acc = acc + jnp.sum(patch.reshape(N, P * P), axis=1,
                            keepdims=True)
    o_ref[...] = acc


def run(name, fn, args, out_shape):
    try:
        f = jax.jit(lambda *a: pl.pallas_call(
            fn,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a))
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(200):
            out = f(*args)
        jax.block_until_ready(out)
        dt_ = (time.perf_counter() - t0) / 200
        print(f"{name}: OK t={dt_*1e6:.1f}us sum0={float(out[0,0]):.3f}",
              flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(N, WIN, WIN)), jnp.float32)
    sy = jnp.asarray(rng.integers(0, 12, (N, 1)), jnp.int32)
    sx = jnp.asarray(rng.integers(0, 12, (N, 1)), jnp.int32)
    s = sy * WIN + sx
    run("roll", kernel_roll, (w.reshape(N, WIN * WIN), s),
        jax.ShapeDtypeStruct((N, 1), jnp.float32))
    run("dot", kernel_dot, (w, sy, sx),
        jax.ShapeDtypeStruct((N, 1), jnp.float32))


if __name__ == "__main__":
    main()
