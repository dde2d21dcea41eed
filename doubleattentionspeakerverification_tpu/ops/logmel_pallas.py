"""Pallas TPU kernel: fused log-mel spectrogram.

The XLA path (``dsp.features.log_mel_spectrogram``) materializes the framed
signal (B, T, 512) in HBM — a 3.2x blow-up of the audio — before the DFT
matmul. This kernel keeps audio in HBM as (B, C, 160) hop-sized chunks,
DMAs each time-tile's chunk rows into VMEM once, builds the overlapping
512-sample frames with three static shifted row-slices (hop 160, n_fft 512
=> frame i = rows[i..i+3] truncated), then runs the windowed real-DFT and
mel projection as two MXU matmuls and the log floor on the VPU. One HBM read
of the audio, one HBM write of the (B, T, 80) features.

Pre-emphasis (+ the x32768 rescale) stays in XLA before the kernel: it needs
one sample of cross-tile history and is a trivially fused elementwise pass.

Constants (Hamming window folded into the DFT bases, Slaney mel) come from
``dsp.mel`` — identical numerics to the XLA path (parity-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FeatureConfig
from ..dsp.features import _dft_mel_constants, num_frames, preemphasize


def _kernel(
    audio_hbm,
    cosb_ref,
    sinb_ref,
    mel_ref,
    out_ref,
    rows_ref,
    sem,
    *,
    tile_frames: int,
    hop: int,
    n_fft: int,
    log_floor: float,
    overlap: int,
):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    rows_needed = tile_frames + overlap  # ceil(n_fft/hop) extra rows, 8-aligned

    # DMA this tile's chunk rows: audio (B, C, row_width) -> rows. Rows are
    # host-padded to a 128-multiple lane width so the HBM slice is full-width
    # (Mosaic can't DMA sub-lane-tile slices); the kernel reads the hop-sample
    # prefix of each row.
    dma = pltpu.make_async_copy(
        audio_hbm.at[bi, pl.ds(ti * tile_frames, rows_needed), :],
        rows_ref,
        sem,
    )
    dma.start()
    dma.wait()

    rows = rows_ref[:, :hop]                              # (R, hop)
    n_whole = n_fft // hop                                # 3 whole rows/frame
    rem = n_fft - n_whole * hop                           # 32 leftover samples
    # frame i = rows[i..i+3] (+32 samples of row i+3). Shifted views are built
    # with layout-preserving rolls: slicing at row offsets 1..3 directly makes
    # Mosaic's concatenate see misaligned sublane layouts.
    parts = []
    for i in range(n_whole):
        shifted = pltpu.roll(rows, rows_needed - i, 0) if i else rows
        parts.append(shifted[:tile_frames, :])
    if rem:
        parts.append(pltpu.roll(rows, rows_needed - n_whole, 0)[:tile_frames, :rem])
    frames = jnp.concatenate(parts, axis=1)               # (tile, n_fft)

    # HIGHEST precision: near-cancelling low-frequency DFT bins need true-f32
    # multiplies, not the MXU's default bf16 passes (same pin as the XLA path)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cosb_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(frames, sinb_ref[:], preferred_element_type=jnp.float32, precision=hi)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32, precision=hi)
    out_ref[0] = jnp.log(jnp.maximum(log_floor, mel))


def log_mel_spectrogram_pallas(
    wave: jnp.ndarray, cfg: FeatureConfig, tile_frames: int = 128
) -> jnp.ndarray:
    """(B, N) waveform -> (B, T, n_mels); numerics match the XLA path."""
    if wave.ndim == 1:
        return log_mel_spectrogram_pallas(wave[None], cfg, tile_frames)[0]
    b, n = wave.shape
    hop, n_fft = cfg.hop_length, cfg.n_fft
    t = num_frames(n, cfg)
    n_tiles = max(1, -(-t // tile_frames))
    # rows one frame spans beyond its own, 8-aligned for sublane-friendly
    # shapes — derived from the config, so non-default hop/n_fft stay correct
    frame_rows = -(-n_fft // hop)
    overlap = -(-frame_rows // 8) * 8
    rows_needed = tile_frames + overlap

    y = preemphasize(wave.astype(jnp.float32), cfg)
    # pad so every tile's DMA window is in bounds, then chunk into hop rows,
    # each padded to a 128-multiple lane width for full-width DMA slices
    total_rows = n_tiles * tile_frames + overlap
    pad = total_rows * hop - n
    y = jnp.pad(y, ((0, 0), (0, pad)))
    row_width = -(-hop // 128) * 128
    chunks = y.reshape(b, total_rows, hop)
    if row_width != hop:
        chunks = jnp.pad(chunks, ((0, 0), (0, 0), (0, row_width - hop)))

    cos_b, sin_b, mel_t = _dft_mel_constants(cfg)
    kernel = functools.partial(
        _kernel, tile_frames=tile_frames, hop=hop, n_fft=n_fft,
        log_floor=cfg.log_floor, overlap=overlap,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # audio stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_frames, cfg.n_mels), lambda bi, ti: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile_frames, cfg.n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows_needed, row_width), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(chunks, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(mel_t))
    return out[:, :t]
