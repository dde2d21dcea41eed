"""MXU rate check: pallas int8 vs bf16 matmul vs XLA equivalents (v5e)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
from tools._timing import timed_ms

M = K = N = 4096
TM = TN = 256


def mm_kernel(a_ref, b_ref, o_ref, *, acc):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc,
    ).astype(o_ref.dtype)


def pallas_mm(a, b, acc, out_dtype):
    import functools

    return pl.pallas_call(
        functools.partial(mm_kernel, acc=acc),
        grid=(M // TM, N // TN),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )(a, b)


rng = np.random.default_rng(0)
a8 = jax.device_put(rng.integers(-127, 128, (M, K)).astype(np.int8))
b8 = jax.device_put(rng.integers(-127, 128, (K, N)).astype(np.int8))
ab = jax.device_put(rng.standard_normal((M, K)).astype(jnp.bfloat16))
bb = jax.device_put(rng.standard_normal((K, N)).astype(jnp.bfloat16))
scalar = jax.jit(lambda e: jnp.ravel(e)[0].astype(jnp.float32))
flops = 2 * M * K * N

f = jax.jit(lambda a, b: pallas_mm(a, b, jnp.int32, jnp.int32))
ms = timed_ms(lambda: scalar(f(a8, b8)), k1=8, k2=24)
print(f"pallas_int8: {ms:.3f} ms = {flops/ms/1e9:.0f} TOPS")

f = jax.jit(lambda a, b: pallas_mm(a, b, jnp.float32, jnp.float32))
ms = timed_ms(lambda: scalar(f(ab, bb)), k1=8, k2=24)
print(f"pallas_bf16: {ms:.3f} ms = {flops/ms/1e9:.0f} TFLOPS")

g = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.int32))
ms = timed_ms(lambda: scalar(g(a8, b8)), k1=8, k2=24)
print(f"xla_int8:   {ms:.3f} ms = {flops/ms/1e9:.0f} TOPS")

h = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32))
ms = timed_ms(lambda: scalar(h(ab, bb)), k1=8, k2=24)
print(f"xla_bf16:   {ms:.3f} ms = {flops/ms/1e9:.0f} TFLOPS")
