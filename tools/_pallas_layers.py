"""Per-layer pallas-vs-XLA timing for the fused int8 conv (flagship shapes)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
from doubleattentionspeakerverification_tpu.models.quantized import _CONV_DN
from doubleattentionspeakerverification_tpu.ops.conv_int8_pallas import (
    _pick_tiles, conv3x3_int8_fused)

SHAPES = [
    ("conv12", 1000, 80, 128, 128),
    ("conv21", 500, 40, 128, 256),
    ("conv22", 500, 40, 256, 256),
    ("conv31", 250, 20, 256, 512),
    ("conv32", 250, 20, 512, 512),
    ("conv41", 125, 10, 512, 1024),
    ("conv42", 125, 10, 1024, 1024),
]
B = 16


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
rng = np.random.default_rng(0)
tot_p = tot_x = 0.0
for name, T, F, Cin, Cout in SHAPES:
    q = jax.device_put(rng.integers(-127, 128, (B, T, F, Cin)).astype(np.int8))
    w = rng.integers(-127, 128, (3, 3, Cin, Cout)).astype(np.int8)
    mult = jax.device_put((rng.uniform(0.5, 2.0, (1, Cout)) * 1e-4).astype(np.float32))
    bias = jax.device_put(rng.standard_normal((1, Cout)).astype(np.float32))
    w9 = jax.device_put(w.reshape(9, Cin, Cout))
    w4 = jax.device_put(w)

    p_ms = timed(lambda: scalar(conv3x3_int8_fused(q, w9, mult, bias, out_kind="int8")))

    def xla(xx):
        y = jax.lax.conv_general_dilated(
            xx, w4, (1, 1), "SAME", dimension_numbers=_CONV_DN,
            preferred_element_type=jnp.int32)
        t = y.astype(jnp.float32) * mult + bias
        return jnp.clip(jnp.round(t), 0, 127).astype(jnp.int8)

    fx = jax.jit(xla)
    x_ms = timed(lambda: scalar(fx(q)))
    tt, ct = _pick_tiles(T, F, Cin, Cout)
    tot_p += p_ms
    tot_x += x_ms
    print(f"{name}: pallas={p_ms:.3f} xla={x_ms:.3f} t_tile={tt} co_tile={ct}",
          flush=True)
print(f"TOTAL pallas={tot_p:.2f} xla={tot_x:.2f}")
