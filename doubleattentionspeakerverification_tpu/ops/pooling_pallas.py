"""Pallas TPU kernel: fused masked multi-head attention pooling.

Computes the reference's level-1 MHA pooling (``scripts/poolings.py:73-109``)
in a single pass over the encoder output: per-head scores, masked online
softmax over time, and the per-head weighted sum — without materializing
score/weight tensors in HBM. The XLA path (`models.poolings.mha_pool`) reads
the (B, T, D) encoder output three times (scores, softmax, weighted sum);
this kernel reads it once and writes only the (B, H, d_h) contexts.

Layout: the caller passes ht reshaped to (B, T, H, d_h); each grid step
processes one (batch row, time tile), carrying the online-softmax state
(running max m, running denominator l, running weighted sum acc) in VMEM
scratch across the time tiles of a row.

Training-path gradients are provided through a custom VJP whose backward is
expressed in XLA ops (the backward recomputes scores; pooling is a tiny
fraction of the model's FLOPs but a large fraction of its pooled-path HBM
traffic, which is what the fused forward removes).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30


def _kernel(len_ref, ht_ref, q_ref, out_ref, m_ref, l_ref, acc_ref, *, t_tile, heads, d_h):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(ti == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_BIG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ht = ht_ref[0].astype(jnp.float32)              # (t_tile, H, d_h)
    q = q_ref[:]                                    # (H, d_h) transposed query

    # scores[t, h] = sum_d ht[t, h, d] * q[h, d]  (VPU reduce over d)
    scores = jnp.sum(ht * q[None, :, :], axis=-1)   # (t_tile, H)

    # time-validity mask for this tile
    t0 = ti * t_tile
    tids = jax.lax.broadcasted_iota(jnp.int32, (t_tile, heads), 0) + t0
    valid = tids < len_ref[bi]
    scores = jnp.where(valid, scores, NEG_BIG)

    # online softmax update
    m_prev = m_ref[0]                               # (H,)
    tile_max = jnp.max(scores, axis=0)              # (H,)
    m_new = jnp.maximum(m_prev, tile_max)
    corr = jnp.exp(m_prev - m_new)                  # (H,)
    e = jnp.where(valid, jnp.exp(scores - m_new[None, :]), 0.0)  # (t_tile, H)

    l_new = l_ref[0] * corr + jnp.sum(e, axis=0)
    acc_new = acc_ref[:] * corr[:, None] + jnp.sum(e[:, :, None] * ht, axis=0)

    m_ref[0] = m_new
    l_ref[0] = l_new
    acc_ref[:] = acc_new

    @pl.when(ti == n_t - 1)
    def _finalize():
        out_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[0], 1e-30)[:, None]).astype(out_ref.dtype)


def _mha_pool_fused_fwd_impl(
    ht4: jnp.ndarray, q_t: jnp.ndarray, lengths: jnp.ndarray, t_tile: int
) -> jnp.ndarray:
    b, t, heads, d_h = ht4.shape
    n_t = pl.cdiv(t, t_tile)
    pad_t = n_t * t_tile - t
    if pad_t:
        ht4 = jnp.pad(ht4, ((0, 0), (0, pad_t), (0, 0), (0, 0)))

    grid = (b, n_t)
    kernel = functools.partial(_kernel, t_tile=t_tile, heads=heads, d_h=d_h)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                # whole lengths vector in SMEM (rank-1 blocks must cover the
                # array on TPU); the kernel indexes it by program_id(0)
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, t_tile, heads, d_h),
                    lambda bi, ti: (bi, ti, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, heads, d_h), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((1, heads), jnp.float32),
                pltpu.VMEM((1, heads), jnp.float32),
                pltpu.VMEM((heads, d_h), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, heads, d_h), jnp.float32),
    )(lengths, ht4, q_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mha_pool_fused(ht4, q_t, lengths, scale: float, t_tile: int):
    return _mha_pool_fused_fwd_impl(ht4, q_t * scale, lengths, t_tile)


def _xla_weights(ht4, q_t, lengths, scale):
    """Reference softmax weights in XLA ops (for the backward)."""
    scores = jnp.einsum("bthd,hd->bth", ht4, q_t) * scale
    if lengths is not None:
        t = ht4.shape[1]
        mask = (jnp.arange(t)[None, :] < lengths[:, None])[..., None]
        scores = jnp.where(mask, scores, NEG_BIG)
    w = jax.nn.softmax(scores, axis=1)
    return w


def _fwd(ht4, q_t, lengths, scale, t_tile):
    out = _mha_pool_fused(ht4, q_t, lengths, scale, t_tile)
    return out, (ht4, q_t, lengths)


def _bwd(scale, t_tile, res, g):
    ht4, q_t, lengths = res
    w = _xla_weights(ht4, q_t, lengths, scale)            # (B,T,H)
    # ctx = sum_t w[t,h] ht[t,h,:]
    # d_ht (value path) = w[t,h] * g[h,:]
    d_ht_value = w[..., None] * g[:, None, :, :]
    # score gradient: ds[t,h] = w[t,h] * (<g[h], ht[t,h]> - <g[h], ctx[h]>)
    gv = jnp.einsum("bthd,bhd->bth", ht4, g)
    ctxg = jnp.einsum("bth,bth->bh", w, gv)
    ds = w * (gv - ctxg[:, None, :])
    d_ht_score = ds[..., None] * (q_t * scale)[None, None, :, :]
    d_q = jnp.einsum("bth,bthd->hd", ds, ht4) * scale
    return d_ht_value + d_ht_score, d_q, None


_mha_pool_fused.defvjp(_fwd, _bwd)


def mha_pool_pallas(
    params,
    ht: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    heads: int,
    dk_is_heads: bool = True,
    t_tile: int = 128,
) -> jnp.ndarray:
    """Drop-in fused version of ``models.poolings.mha_pool`` (context vectors
    only; alignments come from the XLA path when needed).

    params: {'query': (d_h, H)} as in the reference; returns (B, H, d_h).
    """
    b, t, d = ht.shape
    d_h = d // heads
    scale = 1.0 / math.sqrt(float(heads if dk_is_heads else d_h))
    ht4 = ht.reshape(b, t, heads, d_h)
    q_t = params["query"].T  # (H, d_h)
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    t_tile = min(t_tile, max(8, t))
    return _mha_pool_fused(ht4, q_t, lengths.astype(jnp.int32), scale, t_tile)
