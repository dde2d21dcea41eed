"""VGG conv front-ends (reference ``scripts/CNNs.py``), TPU-native.

Differences from the reference by design:
- NHWC layout (batch, time, freq, channel) — the TPU conv-friendly layout —
  instead of torch NCHW; the final flatten is re-ordered to the reference's
  channel-major (B, T', C*F') layout so head slicing downstream matches.
- Valid-length tracking + masking make padded batches bit-equal to the
  reference's unpadded forwards: invalid frames are re-zeroed after every
  ReLU (so zero-padding == conv boundary padding) and lengths follow the
  ceil-mode pools (T -> ceil(T/2) per stage, ``CNNs.py:7-20``).
- Optional bfloat16 conv compute with float32 accumulation (MXU-native).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.masked_ops import mask_time
from .init import conv2d_params

_CONV_DN = jax.lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
)


def vgg_channel_plan(front_end: str, kernel_size: int) -> Tuple[Tuple[int, int], ...]:
    """Per-block (in, out) channel pairs. VGG3L: k/4, k/2, k (``CNNs.py:22-33``);
    VGG4L: k/8, k/4, k/2, k (``CNNs.py:54-67``)."""
    k = kernel_size
    if front_end == "VGG3L":
        chans = [k // 4, k // 2, k]
    elif front_end == "VGG4L":
        chans = [k // 8, k // 4, k // 2, k]
    else:
        raise ValueError(f"unknown front_end {front_end!r}")
    plan = []
    prev = 1
    for c in chans:
        plan.append((prev, c))
        prev = c
    return tuple(plan)


def vgg_output_dim(front_end: str, kernel_size: int, feature_size: int = 80) -> int:
    """Reference ``getVGG3LOutputDimension``/``getVGG4LOutputDimension``
    (``CNNs.py:7-20``): ceil-halve the freq axis per block, times channels."""
    n_blocks = 3 if front_end == "VGG3L" else 4
    f = feature_size
    for _ in range(n_blocks):
        f = math.ceil(f / 2)
    return f * kernel_size


def output_lengths(lengths: jnp.ndarray, front_end: str) -> jnp.ndarray:
    """Valid time length through the ceil-mode pool stack."""
    n_blocks = 3 if front_end == "VGG3L" else 4
    out = lengths
    for _ in range(n_blocks):
        out = -(-out // 2)  # ceil div
    return out


def init_vgg(key, cfg: ModelConfig):
    plan = vgg_channel_plan(cfg.front_end, cfg.kernel_size)
    params = {}
    keys = jax.random.split(key, 2 * len(plan))
    for i, (cin, cout) in enumerate(plan):
        params[f"conv{i + 1}1"] = conv2d_params(keys[2 * i], cin, cout)
        params[f"conv{i + 1}2"] = conv2d_params(keys[2 * i + 1], cout, cout)
    return params


def _conv3x3(x: jnp.ndarray, p, compute_dtype) -> jnp.ndarray:
    # Conv runs natively in compute_dtype (the MXU accumulates in f32
    # internally either way); an explicit f32 preferred_element_type would
    # make the VJP mix f32 cotangents with bf16 kernels and fail.
    w = p["w"].astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_CONV_DN,
    )
    return y + p["b"].astype(compute_dtype)


def _ceil_maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max-pool with ceil_mode=True over (time, freq) of NHWC."""
    pads = [(0, 0)] + [(0, x.shape[d] % 2) for d in (1, 2)] + [(0, 0)]
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding=pads,
    )


def vgg_apply(
    params,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    cfg: ModelConfig,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(B, T, F) features -> (B, T', C*F') encodings + valid output lengths.

    Per block (``CNNs.py:68-91``): conv3x3+ReLU, conv3x3+ReLU, ceil-maxpool.
    Masking after each ReLU keeps pad frames at exactly zero, which makes the
    padded computation identical to an unpadded one (post-ReLU activations are
    >= 0, so ceil-pool windows straddling the boundary pick the valid value).
    """
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    n_blocks = 3 if cfg.front_end == "VGG3L" else 4
    h = mask_time(x, lengths)[..., None]  # (B, T, F, 1)
    cur_len = lengths

    def block(h, p1, p2, blk_len):
        h = jax.nn.relu(_conv3x3(h, p1, compute_dtype))
        h = mask_time(h, blk_len)
        h = jax.nn.relu(_conv3x3(h, p2, compute_dtype))
        h = mask_time(h, blk_len)
        return _ceil_maxpool2(h)

    if cfg.remat_vgg:
        block = jax.checkpoint(block, static_argnums=())

    for i in range(n_blocks):
        h = block(h, params[f"conv{i + 1}1"], params[f"conv{i + 1}2"], cur_len)
        if cur_len is not None:
            cur_len = -(-cur_len // 2)
    # NHWC (B, T', F', C) -> reference channel-major flatten (B, T', C*F')
    b, t, f, c = h.shape
    out = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, t, c * f)
    return out.astype(jnp.float32), cur_len
