"""Mosaic feasibility probe: data-dependent early exit inside a Pallas
TPU kernel via lax.while_loop.

Three candidate formulations, compiled and executed on the real chip:
  A. while_loop with scalar carries extracted from vectors (x[0, 0])
  B. while_loop with [1, 1] vector carries, cond reads carry[0][0, 0]
  C. fori_loop fixed-trip with f32 stop-flag freezing (current scheme,
     sanity baseline)
Each variant runs a toy GN-like loop: x <- x - 0.5*(x - target) with a
convergence stop, plus a VMEM tensor reduce per iteration so the loop
body resembles the real kernels' mixed vector/scalar structure.
Prints per-variant correctness + iterations actually taken (A/B should
show the early exit skipping work: timing a long-n variant).
"""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ITER = 300  # long cap: early exit should make this cheap


def kernel_b(data_ref, out_ref):
    """[1,1] vector carries; cond extracts a python-scalar via [0,0]."""
    data = data_ref[...]                    # [8, 256]

    def s2(x):
        return jnp.sum(x, axis=1, keepdims=True)[0:1, :]

    target = s2(data[0:1, :])               # [1, 1]
    x0 = target * 0.0
    it0 = target * 0.0
    stop0 = target * 0.0

    def cond(c):
        x, it, stop = c
        return (stop[0, 0] < 0.5) & (it[0, 0] < float(N_ITER))

    def body(c):
        x, it, stop = c
        # vector work each iteration (reduce over the big block)
        noise = s2(data[1:2, :]) * 1e-9
        dx = 0.5 * (target - x) + noise
        x = x + dx
        conv = jnp.where(jnp.abs(dx) < 1e-3 * jnp.abs(target), 1.0, 0.0)
        return (x, it + 1.0, jnp.maximum(stop, conv))

    x, it, stop = jax.lax.while_loop(cond, body, (x0, it0, stop0))
    out_ref[...] = jnp.concatenate(
        [x, it, stop, jnp.zeros((1, 125), data.dtype)], axis=1)


def kernel_c(data_ref, out_ref):
    """Fixed-trip unroll with f32 freeze flags (current scheme)."""
    data = data_ref[...]

    def s2(x):
        return jnp.sum(x, axis=1, keepdims=True)[0:1, :]

    target = s2(data[0:1, :])
    x = target * 0.0
    it = target * 0.0
    stop = target * 0.0
    for _ in range(N_ITER):
        noise = s2(data[1:2, :]) * 1e-9
        dx = 0.5 * (target - x) + noise
        conv = jnp.where(jnp.abs(dx) < 1e-3 * jnp.abs(target), 1.0, 0.0)
        upd = 1.0 - stop
        x = x + upd * dx
        it = it + upd
        stop = jnp.maximum(stop, conv)
    out_ref[...] = jnp.concatenate(
        [x, it, stop, jnp.zeros((1, 125), data.dtype)], axis=1)


def run(kernel, name):
    data = jnp.asarray(
        np.random.default_rng(0).normal(1.0, 0.1, (8, 256)), jnp.float32)
    try:
        f = jax.jit(lambda d: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d))
        out = f(data)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(50):
            out = f(data)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50
        x, it, stop = float(out[0, 0]), float(out[0, 1]), float(out[0, 2])
        tgt = float(jnp.sum(data[0]))
        print(f"{name}: OK x={x:.4f} target={tgt:.4f} iters={it:.0f} "
              f"stop={stop:.0f} t={dt*1e6:.1f}us", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:500]}", flush=True)


if __name__ == "__main__":
    run(kernel_b, "B_while_vec_carry")
    run(kernel_c, "C_unrolled_freeze")
