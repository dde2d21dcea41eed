"""Micro-probe: isolate im2col-copy vs matmul cost in the int8 conv kernel.

Times three pallas variants of one flagship conv (conv22: T=500, F=40,
C=256) against the XLA int8 conv: (a) full kernel, (b) dot-only (patch
matrix faked by replicating the input block contiguously — no strided
slices), (c) copy-only (im2col writes, no dot).
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

B, T, F, Cin, Cout = 16, 500, 40, 256, 256
t_tile, co_tile = 36, 256
R = t_tile * F
n_t = -(-T // t_tile)

rng = np.random.default_rng(0)
q = jax.device_put(rng.integers(-127, 128, (B, T, F, Cin)).astype(np.int8))
w2 = jax.device_put(rng.integers(-127, 128, (9 * Cin, Cout)).astype(np.int8))
mult = jax.device_put((rng.uniform(0.5, 2.0, (1, Cout)) * 1e-4).astype(np.float32))
bias = jax.device_put(rng.standard_normal((1, Cout)).astype(np.float32))


def timed(run, k1=8, k2=24, reps=5):
    run()

    def chain(k):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            last = run()
        np.asarray(last)
        return time.perf_counter() - t0

    return float(np.median([(chain(k2) - chain(k1)) / (k2 - k1) * 1e3 for _ in range(reps)]))


scalar = jax.jit(lambda e: jnp.ravel(e)[0].astype(jnp.float32))


def make(variant):
    def kernel(x_cur, w_ref, mult_ref, bias_ref, out_ref, xf_ref, p_ref):
        cur = x_cur[0]
        if variant != "dot_only":
            xf_ref[:] = jnp.zeros_like(xf_ref)
            xf_ref[1 : t_tile + 1, 1 : F + 1, :] = cur
            for k in range(9):
                dt, df = divmod(k, 3)
                p_ref[:, k * Cin : (k + 1) * Cin] = (
                    xf_ref[dt : dt + t_tile, df : df + F, :].reshape(R, Cin)
                )
        else:
            flat = cur.reshape(R, Cin)
            for k in range(9):
                p_ref[:, k * Cin : (k + 1) * Cin] = flat
        if variant == "copy_only":
            out_ref[0] = p_ref[:, :Cout].reshape(t_tile, F, Cout).astype(jnp.int8)
            return
        acc = jax.lax.dot_general(
            p_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc.astype(jnp.float32) * mult_ref[0][None, :] + bias_ref[0][None, :]
        out_ref[0] = jnp.clip(jnp.round(acc), 0, 127).astype(jnp.int8).reshape(
            t_tile, F, co_tile
        )

    return pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, t_tile, F, Cin), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, co_tile), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, F, co_tile), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, F, Cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((t_tile + 2, F + 2, Cin), jnp.int8),
            pltpu.VMEM((R, 9 * Cin), jnp.int8),
        ],
    )


for variant in ("full", "dot_only", "copy_only"):
    f = jax.jit(lambda x, v=variant: make(v)(x, w2, mult, bias))
    print(f"{variant}_ms", round(timed(lambda: scalar(f(q))), 3), flush=True)

# XLA reference conv for the same shape
from doubleattentionspeakerverification_tpu.models.quantized import _CONV_DN

w4 = jax.device_put(rng.integers(-127, 128, (3, 3, Cin, Cout)).astype(np.int8))


def xla_conv(xx):
    y = jax.lax.conv_general_dilated(
        xx, w4, (1, 1), "SAME", dimension_numbers=_CONV_DN,
        preferred_element_type=jnp.int32,
    )
    t = y.astype(jnp.float32) * mult + bias
    return jnp.clip(jnp.round(t), 0, 127).astype(jnp.int8)


fx = jax.jit(xla_conv)
print("xla_ms", round(timed(lambda: scalar(fx(q))), 3), flush=True)
