"""Mosaic probe: lane rolls on a 576-lane (non-128-multiple) vector —
the shape a 24x24 align2d cache window would flatten to."""
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref):
    x = x_ref[...]
    acc = x * 0.0
    for k in [1, 2, 4, 8, 16, 32, 64, 128, 256]:
        acc = acc + pltpu.roll(x, 576 - k, 1)
    o_ref[...] = acc


def main():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(200, 576)),
                    jnp.float32)
    try:
        f = jax.jit(lambda a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((200, 576), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a))
        out = np.asarray(f(x))
        ref = sum(np.roll(np.asarray(x), -k, 1)
                  for k in [1, 2, 4, 8, 16, 32, 64, 128, 256])
        err = np.abs(out - ref).max()
        print(f"roll576: OK max_err={err:.2e}")
    except Exception as e:
        print(f"roll576: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
