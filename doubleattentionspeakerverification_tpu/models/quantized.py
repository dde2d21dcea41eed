"""int8-quantized inference encoder (serving fast path).

The reference has no quantized inference (its serving story is a one-shot
fp32 script, ``scripts/getEmbeddingExample.py``). On TPU the MXU runs int8
convs well above the bf16 rate (358 vs 122 TFLOP/s measured on v5e at the
flagship block-1 conv shape, 2.9x), and the VGG encoder is >99% of
embedding FLOPs. End to end the win is bounded by the non-MXU chain both
paths share (Amdahl): measured on v5e, int8 embedding runs **1.47x** the
bf16 path (19,277 vs 13,107 audio-s/s on the 16x10 s bench workload,
BENCH_r03 extras) — the conv MXU time drops ~6 ms -> ~2 ms while ~6 ms of
quantize/mask/pool/tail elementwise remains in both.

Scheme (standard, robust for cosine-scored embeddings):
- weights: symmetric per-output-channel int8, quantized once at load time;
- activations: symmetric per-tensor int8 with a *dynamic* scale
  (``amax/127`` computed on device per conv input — no calibration pass,
  no accuracy cliff on out-of-distribution inputs);
- conv accumulates in int32 on the MXU, dequantizes to f32, adds the f32
  bias; ReLU / masking / ceil-pool / pooling / FC tail stay in f32 — they
  are bandwidth-trivial next to the convs.

The pooling + FC tail is the exact fp path (``classifier.trunk_tail``), so
quantization error enters only through the conv stack; embeddings cosine-
match the fp model to ~1e-3, far below speaker-separation margins (tested
in ``tests/test_quantized.py``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.masked_ops import mask_time
from .classifier import ModelState, trunk_tail
from .vgg import _CONV_DN, _ceil_maxpool2


def quantize_vgg(vgg_params) -> dict:
    """fp VGG params -> int8 params: per-output-channel symmetric weights.

    Returns a pytree of ``{"w_q": int8 (3,3,Cin,Cout), "w_s": f32 (Cout,),
    "b": f32 (Cout,)}`` per conv.
    """
    q = {}
    for name, p in vgg_params.items():
        w = jnp.asarray(p["w"], jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
        w_q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        q[name] = {"w_q": w_q, "w_s": s, "b": jnp.asarray(p["b"], jnp.float32)}
    return q


def _conv3x3_int8(x: jnp.ndarray, qp, compute_dtype) -> jnp.ndarray:
    """NHWC -> int8 conv on the MXU -> dequantized ``compute_dtype`` (+bias).

    The int8 MXU rate (~2.9x bf16 measured on v5e at the flagship block-1
    shape) only survives end to end if the quantize/dequantize elementwise
    passes around each conv stay cheap: the activation amax reduces in f32
    (scale accuracy) but every tensor-sized read/write runs in the model's
    compute dtype — in bf16 that halves the HBM bytes of the non-MXU chain,
    which otherwise dominates the embed step."""
    sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-12)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q,
        qp["w_q"],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_CONV_DN,
        preferred_element_type=jnp.int32,
    )
    scale = (sx * qp["w_s"]).astype(compute_dtype)
    return y.astype(compute_dtype) * scale + qp["b"].astype(compute_dtype)


def quantized_vgg_apply(
    qparams,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    cfg: ModelConfig,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """int8 twin of ``vgg.vgg_apply`` — same block/mask/pool structure
    (conv3x3+ReLU, conv3x3+ReLU, ceil-maxpool per block; pad frames re-zeroed
    after every ReLU so padded batches match unpadded forwards)."""
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    n_blocks = 3 if cfg.front_end == "VGG3L" else 4
    h = mask_time(x.astype(compute_dtype), lengths)[..., None]
    cur_len = lengths
    for i in range(n_blocks):
        h = jax.nn.relu(_conv3x3_int8(h, qparams[f"conv{i + 1}1"], compute_dtype))
        h = mask_time(h, cur_len)
        h = jax.nn.relu(_conv3x3_int8(h, qparams[f"conv{i + 1}2"], compute_dtype))
        h = mask_time(h, cur_len)
        h = _ceil_maxpool2(h)
        if cur_len is not None:
            cur_len = -(-cur_len // 2)
    b, t, f, c = h.shape
    out = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t, c * f)
    return out, cur_len


def make_int8_embed_fn(params, cfg: ModelConfig):
    """The one place the int8 inference path is wired: quantizes the conv
    weights once (closed over) and returns a jitted
    ``(params, state, x, lengths) -> (B, emb)`` drop-in for the fp
    ``get_embedding`` — shared by ``api.SpeakerEmbeddingModel`` and the
    ``score_trials`` CLI so their quantize schemes cannot diverge."""
    from ..utils.kernel_auto import resolve_model_kernels

    rcfg = resolve_model_kernels(cfg, need_dsp=False)
    qvgg = quantize_vgg(params["vgg"])
    return jax.jit(
        lambda p, s, x, lens: get_embedding_int8(p, qvgg, s, x, lens, rcfg)
    )


def get_embedding_int8(
    params,
    qvgg,
    state: ModelState,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    cfg: ModelConfig,
) -> jnp.ndarray:
    """Eval-mode scoring embedding with the int8 encoder.

    Same tap as the fp ``classifier.get_embedding`` (post-BN, pre-preLayer,
    reference ``model.py:52-59``); ``params`` is the ordinary fp pytree (the
    tail uses it), ``qvgg`` comes from :func:`quantize_vgg`.
    """
    enc, enc_len = quantized_vgg_apply(qvgg, x, lengths, cfg)
    emb, _, _ = trunk_tail(params, state, enc, enc_len, cfg, train=False, rng=None)
    return emb
