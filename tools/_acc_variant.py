"""One int8-conv accumulator-dtype variant, timed (internal; see int8_probe)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
from doubleattentionspeakerverification_tpu.config import ModelConfig
from doubleattentionspeakerverification_tpu.models.classifier import init_speaker_classifier
from doubleattentionspeakerverification_tpu.models.quantized import (
    _CONV_DN as DN,
    _ceil_maxpool2_int8,
    calibrate_int8_scales,
    fold_static_scales,
    quantize_vgg,
)
from doubleattentionspeakerverification_tpu.models.vgg import _ceil_maxpool2, vgg_apply

acc = {"int32": jnp.int32, "float32": jnp.float32, "bfloat16": jnp.bfloat16}[sys.argv[1]]
cfg = ModelConfig(compute_dtype="bfloat16")
params, ms0 = init_speaker_classifier(jax.random.PRNGKey(0), cfg)
qvgg = quantize_vgg(params["vgg"])
rng = np.random.default_rng(0)
x = jax.device_put(rng.standard_normal((16, 1000, 80)).astype(np.float32))
scales = calibrate_int8_scales(qvgg, x, None, cfg)
folded = fold_static_scales(qvgg, scales, cfg)


def timed(run, k1=8, k2=40, reps=5):
    run()

    def chain(k):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            last = run()
        np.asarray(last)
        return time.perf_counter() - t0

    return float(np.median([(chain(k2) - chain(k1)) / (k2 - k1) * 1e3 for _ in range(reps)]))


scalar = jax.jit(lambda e: jnp.ravel(e)[0])


def static_conv(xx):
    order = [f"conv{i+1}{j}" for i in range(4) for j in (1, 2)]
    q = jnp.clip(
        jnp.round(xx.astype(jnp.float32)[..., None] / scales[0]), -127, 127
    ).astype(jnp.int8)
    h = None
    for k, name in enumerate(order):
        p = folded[name]
        y = jax.lax.conv_general_dilated(
            q, p["w_q"], (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=acc,
        )
        t = jax.nn.relu(y.astype(jnp.float32) * p["mult"] + p["bias"])
        if k == len(order) - 1:
            h = _ceil_maxpool2(t.astype(jnp.bfloat16))
        else:
            q = jnp.clip(jnp.round(t), 0, 127).astype(jnp.int8)
            if k % 2 == 1:
                q = _ceil_maxpool2_int8(q)
    b, t_, f, c = h.shape
    return jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t_, c * f)


f = jax.jit(static_conv)
out = np.asarray(f(x))
ref = np.asarray(jax.jit(lambda xx: vgg_apply(params["vgg"], xx, None, cfg)[0])(x))
rel = float(np.abs(ref - out).max() / np.abs(ref).max())
ms_ = timed(lambda: scalar(f(x)))
print(f"acc={sys.argv[1]} ms={ms_:.3f} relerr={rel:.5f}", flush=True)
