"""Decompose the int8 embed step on TPU: conv stack vs tail vs epilogues (run from repo root)."""
import time, sys, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

from doubleattentionspeakerverification_tpu.config import ModelConfig
from doubleattentionspeakerverification_tpu.models.classifier import (
    get_embedding, init_speaker_classifier, trunk_tail)
from doubleattentionspeakerverification_tpu.models.vgg import vgg_apply
from doubleattentionspeakerverification_tpu.models.quantized import (
    quantize_vgg, quantized_vgg_apply, calibrate_int8_scales,
    fold_static_scales, quantized_vgg_apply_static, _CONV_DN)
from doubleattentionspeakerverification_tpu.utils.kernel_auto import resolve_model_kernels

cfg = resolve_model_kernels(ModelConfig(compute_dtype="bfloat16"), need_dsp=False)
params, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg)
qvgg = quantize_vgg(params["vgg"])
rng = np.random.default_rng(0)
eb, et = 16, 1000
x = jax.device_put(rng.standard_normal((eb, et, 80)).astype(np.float32))
lens = None

def timed(run, k1=8, k2=40, reps=5):
    """Median of `reps` two-point latency-corrected estimates (the relay's
    session speed drifts; single estimates can even go negative)."""
    run()
    def chain(k):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            last = run()
        np.asarray(last)  # host fetch sync
        return time.perf_counter() - t0
    est = []
    for _ in range(reps):
        a, b = chain(k1), chain(k2)
        est.append((b - a) / (k2 - k1) * 1e3)
    return float(np.median(est))

scalar = jax.jit(lambda e: jnp.ravel(e)[0])

# full fp embed
fp_fn = jax.jit(partial(get_embedding, cfg=cfg))
print("fp_embed_ms", timed(lambda: scalar(fp_fn(params, ms, x, lens))))

# fp conv stack only
fpconv = jax.jit(lambda xx: vgg_apply(params["vgg"], xx, None, cfg)[0])
print("fp_conv_ms", timed(lambda: scalar(fpconv(x))))

# dynamic int8 conv stack only
dconv = jax.jit(lambda xx: quantized_vgg_apply(qvgg, xx, None, cfg)[0])
print("int8_dyn_conv_ms", timed(lambda: scalar(dconv(x))))

# static int8 conv stack only
scales = calibrate_int8_scales(qvgg, x, lens, cfg)
folded = fold_static_scales(qvgg, scales, cfg)
sconv = jax.jit(lambda xx: quantized_vgg_apply_static(folded, scales[0], xx, None, cfg)[0])
print("int8_static_conv_ms", timed(lambda: scalar(sconv(x))))

# tail only (on a precomputed encoder output)
enc, enc_len = jax.jit(lambda xx: quantized_vgg_apply_static(folded, scales[0], xx, None, cfg))(x)
enc = jax.device_put(np.asarray(enc))
tail = jax.jit(lambda p, s, e: trunk_tail(p, s, e, None, cfg, train=False, rng=None)[0])
print("tail_ms", timed(lambda: scalar(tail(params, ms, enc))))

# raw int8 conv chain: 8 convs, no epilogue except relu-cast, to find the MXU floor
w = {k: qvgg[k]["w_q"] for k in qvgg}
def raw_chain(xq):
    h = xq[..., None].astype(jnp.int8)
    order = [f"conv{i+1}{j}" for i in range(4) for j in (1, 2)]
    for i, name in enumerate(order):
        y = jax.lax.conv_general_dilated(h, w[name], (1, 1), "SAME",
              dimension_numbers=_CONV_DN, preferred_element_type=jnp.int32)
        h = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)  # cheap requant stand-in
        if i % 2 == 1:
            from doubleattentionspeakerverification_tpu.models.quantized import _ceil_maxpool2_int8
            h = _ceil_maxpool2_int8(h)
    return h
xq = jax.device_put((rng.standard_normal((eb, et, 80)) * 10).astype(np.int8))
rawj = jax.jit(raw_chain)
print("int8_raw_conv_ms", timed(lambda: scalar(rawj(xq))))

# ---- epilogue variants: where does static_conv - raw_conv go?
from doubleattentionspeakerverification_tpu.models.quantized import (
    _mask_time_int8, _ceil_maxpool2_int8, _CONV_DN as DN)
from doubleattentionspeakerverification_tpu.models.vgg import _ceil_maxpool2

def static_conv_variant(xx, epilogue_dtype=jnp.float32, flatten=True):
    order = [f"conv{i+1}{j}" for i in range(4) for j in (1, 2)]
    h0 = xx.astype(jnp.float32)[..., None]
    q = jnp.clip(jnp.round(h0 / scales[0]), -127, 127).astype(jnp.int8)
    for k, name in enumerate(order):
        p = folded[name]
        y = jax.lax.conv_general_dilated(q, p["w_q"], (1, 1), "SAME",
              dimension_numbers=DN, preferred_element_type=jnp.int32)
        t = jax.nn.relu(y.astype(epilogue_dtype) * p["mult"].astype(epilogue_dtype)
                        + p["bias"].astype(epilogue_dtype))
        last = k == len(order) - 1
        if last:
            h = t.astype(jnp.bfloat16)
        else:
            q = jnp.clip(jnp.round(t), 0, 127).astype(jnp.int8)
        if k % 2 == 1:
            if last:
                h = _ceil_maxpool2(h)
            else:
                q = _ceil_maxpool2_int8(q)
    if not flatten:
        return h
    b, t_, f, c = h.shape
    return jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t_, c * f)

v_bf16 = jax.jit(lambda xx: static_conv_variant(xx, jnp.bfloat16))
print("static_conv_bf16_epilogue_ms", timed(lambda: scalar(v_bf16(x))))
v_noflat = jax.jit(lambda xx: static_conv_variant(xx, jnp.float32, flatten=False))
print("static_conv_noflatten_ms", timed(lambda: scalar(v_noflat(x))))

# raw chain without pools (pool cost isolation)
def raw_nopool(xq):
    h = xq[..., None].astype(jnp.int8)
    for i, name in enumerate([f"conv{i+1}{j}" for i in range(4) for j in (1, 2)]):
        y = jax.lax.conv_general_dilated(h, w[name], (1, 1), "SAME",
              dimension_numbers=DN, preferred_element_type=jnp.int32)
        h = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
        if i % 2 == 1:
            h = h[:, ::2, ::2, :]  # stride-subsample stand-in for the pool
    return h
rawnp = jax.jit(raw_nopool)
print("int8_rawconv_nopool_ms", timed(lambda: scalar(rawnp(xq))))

# ---- fused pallas conv stack (r4 kernel)
from doubleattentionspeakerverification_tpu.models.quantized import (
    quantized_vgg_apply_static, get_embedding_int8_static)
pconv = jax.jit(lambda xx: quantized_vgg_apply_static(
    folded, scales[0], xx, None, cfg, use_pallas_conv=True)[0])
print("int8_pallas_conv_ms", timed(lambda: scalar(pconv(x))))
pembed = jax.jit(lambda p, s, xx: get_embedding_int8_static(
    p, folded, scales[0], s, xx, None, cfg, use_pallas_conv=True))
print("int8_pallas_embed_ms", timed(lambda: scalar(pembed(params, ms, x))))
# parity on the real chip
ref = np.asarray(sconv(x), np.float32)
got = np.asarray(pconv(x), np.float32)
print("pallas_vs_xla_static_maxdiff", float(np.abs(ref - got).max()))
