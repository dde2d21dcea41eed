"""Pallas TPU kernel: fused int8 3x3 conv + requantize epilogue.

Why this exists (measured on v5e, tools/int8_probe.py r4): XLA cannot fuse
elementwise epilogues into its convolution op, so every int8 conv in the
static-scale quantized encoder (models/quantized.py) materializes its int32
output to HBM and re-reads it in a separate requantize fusion — ~8 bytes of
int32 traffic per element on top of the 1-byte int8 write. At the flagship
shapes that int32 round-trip, not the MXU, bounds the embed step (static
int8 conv stack 8.1 ms vs a 6.6 ms raw-conv floor, fp 12.2 ms).

This kernel computes the SAME-padded 3x3 conv as nine shifted (R, Cin) x
(Cin, Cout) int8 matmuls accumulated in VMEM int32 scratch, applies the
folded epilogue (per-channel ``mult``/``bias`` from
``models.quantized.fold_static_scales``; ReLU and the next conv's
requantization collapse into ``clip(round(acc * mult + bias), 0, 127)``)
while the tile is still in VMEM, and writes ONLY the int8 (or, for the last
conv, bfloat16) result — HBM sees 3 int8 reads (time-halo views) + 1 write
per element instead of XLA's 1 read + 4+4 int32 write+read + 1 write.

Halo handling: the time axis is tiled; each grid step receives the previous
/ current / next time tiles as three views of the same array (clamped index
maps) and assembles a (t_tile+2, F+2, Cin) zero-padded patch buffer in VMEM
scratch, so the nine taps become pure static slices. Rows beyond the valid
T of a partial last tile are zeroed (SAME conv padding semantics), and the
F axis is padded inside the scratch buffer — no concatenates in-kernel.

Grid order is (Cout tiles, B, time tiles): time fastest, so the current
tile's input block is the next step's halo block (Mosaic re-uses blocks
whose index map is unchanged between consecutive steps), and the weight
block stays resident for a whole (co, :) stripe.

The first conv (Cin=1) stays in XLA — its patch matrix is K=9 and
MXU-irrelevant; models/quantized.py routes it through the XLA int8 conv
branch (int8 input, int32 accumulate, separate requantize fusion), which
is cheap at Cin=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(x_prev, x_cur, x_next, w_ref, mult_ref, bias_ref, out_ref,
            xf_ref, p_ref, *, t_tile, n_t, T, F, Cin, co_tile, out_kind):
    t = pl.program_id(2)
    r = t_tile * F

    # ---- assemble the FLATTENED zero-padded patch buffer.
    # xf_ref is ((t_tile+4)*F, Cin): row (lt+2)*F + f holds x[t0+lt, f]
    # (lt=-2 and the tail stay zero so every tap slice below is in-bounds).
    # Flat layout makes each of the nine taps a pure contiguous ROW SHIFT:
    # x[t+dt, f+df] lives at flat row (base + dt*F + df). The price is that
    # a df shift wraps across the F boundary (row t, f=F-1 borrows row
    # t+1, f=0), fixed by static row masks — much cheaper than the v3
    # strided (F+2)-pitch reshapes, which Mosaic copied segment-by-segment.
    cur = x_cur[0]  # (t_tile, F, Cin) int8
    t0 = t * t_tile
    if T % t_tile:
        # partial last tile: rows >= T were read out of bounds (undefined);
        # SAME padding needs them to be ZERO because row T-1's dt=+1 tap
        # reads them even though its own output row is valid
        rows = jax.lax.broadcasted_iota(jnp.int32, (t_tile, 1, 1), 0) + t0
        cur = jnp.where(rows < T, cur, jnp.zeros((), cur.dtype))
    xf_ref[0 : 2 * F, :] = jnp.zeros((2 * F, Cin), jnp.int8)
    xf_ref[2 * F : 2 * F + r, :] = cur.reshape(r, Cin)
    xf_ref[2 * F + r :, :] = jnp.zeros((2 * F, Cin), jnp.int8)

    @pl.when(t > 0)
    def _prev_halo():
        xf_ref[F : 2 * F, :] = x_prev[0, t_tile - 1]

    @pl.when(t < n_t - 1)
    def _next_halo():
        xf_ref[2 * F + r : 3 * F + r, :] = x_next[0, 0]

    # ---- im2col in VMEM: nine shifted slices -> one (R, 9*Cin) patch
    # matrix, then ONE MXU matmul per step. (A 9-matmul K=Cin accumulation
    # variant measured 2x SLOWER than XLA end to end: ~4000 grid steps of
    # tiny dots were per-step-overhead-bound, r4 int8_probe.)
    rowmod = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) % F
    for k in range(9):
        dt, df = divmod(k, 3)  # each in {0,1,2}, representing {-1,0,+1}
        s = (dt + 1) * F + df - 1
        xs = xf_ref[s : s + r, :]
        if df == 0:      # df == -1: f=0 would borrow the previous row's F-1
            xs = jnp.where(rowmod != 0, xs, jnp.zeros((), xs.dtype))
        elif df == 2:    # df == +1: f=F-1 would borrow the next row's 0
            xs = jnp.where(rowmod != F - 1, xs, jnp.zeros((), xs.dtype))
        p_ref[:, k * Cin : (k + 1) * Cin] = xs
    acc = jax.lax.dot_general(
        p_ref[:], w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    # ---- fused epilogue: dequant + bias (+ReLU) + requantize, one write
    acc = acc.astype(jnp.float32) * mult_ref[0][None, :] + bias_ref[0][None, :]
    if out_kind == "int8":
        # clip lower bound 0 subsumes the ReLU (negative pre-activations
        # round below zero and clamp to the quantized zero)
        q = jnp.clip(jnp.round(acc), 0, 127).astype(jnp.int8)
    else:
        q = jax.nn.relu(acc).astype(jnp.dtype(out_kind))
    out_ref[0] = q.reshape(t_tile, F, co_tile)


def _vmem_estimate(t_tile: int, F: int, Cin: int, co_tile: int) -> int:
    """Bytes of VMEM a grid step needs: 3 double-buffered input views, the
    double-buffered weight and output blocks, the padded patch scratch, the
    im2col matrix, and the dot's int32 result + f32 epilogue temporary
    (stack-allocated by Mosaic — ignoring these is how v2 OOM'd at 23.7 MB
    against the 16 MB scoped limit)."""
    r = t_tile * F
    return (
        6 * t_tile * F * Cin            # x_prev/cur/next, 2 pipeline buffers
        + 2 * 9 * Cin * co_tile         # weight block
        + 2 * 2 * r * co_tile           # out block (<=2B/elt), 2 buffers
        + (t_tile + 2) * (F + 2) * Cin  # xf halo scratch
        + r * 9 * Cin                   # im2col patch matrix
        + 8 * r * co_tile               # dot s32 + f32 epilogue temp
    )


def _pick_tiles(T: int, F: int, Cin: int, Cout: int, budget: int = 12_000_000):
    """Tile sizes tuned for FEW, FAT grid steps (per-step overhead made a
    small-tile variant 2x slower than XLA): maximize matmul rows R =
    t_tile*F (capped at 2560) subject to the explicit VMEM estimate, then
    widen co_tile as far as the budget allows."""
    best = (min(T, 8), min(Cout, 128))
    for co_tile in (1024, 512, 256, 128):
        if co_tile > Cout and co_tile != 128:
            continue
        co = min(co_tile, Cout)
        start = max(8, min(T, max(8, 2560 // F)) // 4 * 4)
        for t_tile in range(start, 7, -4):
            if _vmem_estimate(t_tile, F, Cin, co) <= budget:
                if t_tile * F * co > best[0] * F * best[1]:
                    best = (t_tile, co)
                break
    return best


@functools.partial(
    jax.jit, static_argnames=("out_kind", "interpret")
)
def conv3x3_int8_fused(
    q: jnp.ndarray,        # (B, T, F, Cin) int8
    w9: jnp.ndarray,       # (9, Cin, Cout) int8  (3x3 taps flattened)
    mult: jnp.ndarray,     # (1, Cout) f32 folded scale  s_in * w_s / s_next
    bias: jnp.ndarray,     # (1, Cout) f32 folded bias   b / s_next
    *,
    out_kind: str = "int8",
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME 3x3 conv over (T, F) with the static-scale epilogue fused in.

    Output: (B, T, F, Cout) of ``out_kind`` — 'int8' for inter-conv layers
    (values already on the NEXT conv's scale), 'bfloat16'/'float32' for the
    stack's last conv (plain dequantized ReLU activations).
    """
    B, T, F, Cin = q.shape
    Cout = w9.shape[2]
    t_tile, co_tile = _pick_tiles(T, F, Cin, Cout)
    n_t = _cdiv(T, t_tile)
    n_co = _cdiv(Cout, co_tile)

    kernel = functools.partial(
        _kernel, t_tile=t_tile, n_t=n_t, T=T, F=F, Cin=Cin,
        co_tile=co_tile, out_kind=out_kind,
    )
    x_spec = lambda f: pl.BlockSpec(
        (1, t_tile, F, Cin), f, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(n_co, B, n_t),
        in_specs=[
            x_spec(lambda c, b, t: (b, jnp.maximum(t - 1, 0), 0, 0)),
            x_spec(lambda c, b, t: (b, t, 0, 0)),
            x_spec(lambda c, b, t: (b, jnp.minimum(t + 1, n_t - 1), 0, 0)),
            pl.BlockSpec((9 * Cin, co_tile), lambda c, b, t: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda c, b, t: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_tile), lambda c, b, t: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, F, co_tile), lambda c, b, t: (b, t, 0, c),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, F, Cout), jnp.dtype(out_kind)),
        scratch_shapes=[
            pltpu.VMEM(((t_tile + 4) * F, Cin), jnp.int8),
            pltpu.VMEM((t_tile * F, 9 * Cin), jnp.int8),
        ],
        interpret=interpret,
    )(q, q, q, w9.reshape(9 * Cin, Cout), mult, bias)
