"""Compile + run every non-default Pallas kernel config on the REAL TPU.

The interpret-mode tests (`tests/test_pallas_logmel.py`,
`tests/test_conv_int8_pallas.py`) prove numerics, but Mosaic can reject or
miscompile a layout the interpreter accepts (VERDICT r3 #6). This sweep
drives each parametrized configuration through the actual TPU compiler,
executes it, and records the max abs diff vs the XLA reference path.

  python tools/tpu_kernel_sweep.py           # one JSON line per config

Exit code 1 if any config fails to compile/run or exceeds tolerance.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    from doubleattentionspeakerverification_tpu.config import FeatureConfig
    from doubleattentionspeakerverification_tpu.dsp.features import (
        log_mel_spectrogram,
        num_frames,
    )
    from doubleattentionspeakerverification_tpu.ops.logmel_pallas import (
        log_mel_spectrogram_pallas,
    )

    backend = jax.default_backend()
    failures = 0
    results = []

    # ---- log-mel kernel: the exact grid tests/test_pallas_logmel.py runs
    # in interpreter mode (plus the default config as a control)
    logmel_cases = [
        ("default", dict(), 16000 * 2, 128),
        ("sr8k_nfft256", dict(sample_rate=8000, n_fft=256), 12000, 32),
        ("hop44", dict(window_stride_s=0.00275), 6000, 32),
        ("nfft480_exact_mult", dict(n_fft=480), 10000, 32),
        ("partial_tile", dict(), 2000, 128),
        ("tile_boundary", dict(), 512 + 160 * 31, 32),
        ("hop40_small", dict(window_stride_s=0.0025), 8000, 32),
    ]
    for name, kw, n_samples, tile_frames in logmel_cases:
        cfg = FeatureConfig(**kw)
        rng = np.random.default_rng(11)
        wave = (rng.standard_normal((2, n_samples)) * 0.1).astype(np.float32)
        row = {"kernel": "logmel_pallas", "config": name, "backend": backend}
        try:
            ref = np.asarray(
                jax.jit(lambda w, c=cfg: log_mel_spectrogram(w, c))(wave)
            )
            got = np.asarray(
                jax.jit(
                    lambda w, c=cfg, tf=tile_frames: log_mel_spectrogram_pallas(
                        w, c, tile_frames=tf
                    )
                )(wave)
            )
            ok = got.shape == ref.shape == (
                2, num_frames(n_samples, cfg), cfg.n_mels
            )
            md = float(np.max(np.abs(got - ref))) if ok else float("nan")
            ok = ok and md < 2e-4
            row.update(ok=ok, max_diff=md)
        except Exception as e:
            row.update(ok=False, error=f"{type(e).__name__}: {e}"[:300])
        failures += not row["ok"]
        results.append(row)
        print(json.dumps(row), flush=True)

    # ---- fused int8 conv kernel: flagship block shapes + odd edges
    from doubleattentionspeakerverification_tpu.models.quantized import _CONV_DN
    from doubleattentionspeakerverification_tpu.ops.conv_int8_pallas import (
        conv3x3_int8_fused,
    )

    conv_cases = [
        ("block2_flagship", (4, 500, 40, 128, 256), "int8"),
        ("block3_flagship", (4, 250, 20, 256, 512), "int8"),
        ("block4_flagship", (2, 125, 10, 512, 1024), "bfloat16"),
        ("partial_tiles", (2, 37, 20, 128, 128), "int8"),
        ("tiny_T", (1, 3, 10, 128, 128), "int8"),
    ]
    for name, (b, t, f, cin, cout), kind in conv_cases:
        rng = np.random.default_rng(5)
        q = rng.integers(-127, 128, (b, t, f, cin)).astype(np.int8)
        w = rng.integers(-127, 128, (3, 3, cin, cout)).astype(np.int8)
        mult = (rng.uniform(0.5, 2.0, (1, cout)) * 1e-4).astype(np.float32)
        bias = rng.standard_normal((1, cout)).astype(np.float32)
        row = {"kernel": "conv_int8_pallas", "config": name, "backend": backend}
        try:
            def ref_fn(qq):
                y = jax.lax.conv_general_dilated(
                    qq, w, (1, 1), "SAME", dimension_numbers=_CONV_DN,
                    preferred_element_type=jnp.int32,
                )
                acc = y.astype(jnp.float32) * mult + bias
                if kind == "int8":
                    return jnp.clip(jnp.round(acc), 0, 127).astype(jnp.int8)
                return jax.nn.relu(acc).astype(jnp.dtype(kind))

            ref = np.asarray(jax.jit(ref_fn)(q), np.float32)
            got = np.asarray(
                conv3x3_int8_fused(
                    q, w.reshape(9, cin, cout), mult, bias, out_kind=kind
                ),
                np.float32,
            )
            md = float(np.max(np.abs(got - ref)))
            # int8: exact; bf16 out: one rounding class
            ok = md <= (0.0 if kind == "int8" else 1e-2 * max(1.0, np.abs(ref).max()))
            row.update(ok=bool(ok), max_diff=md)
        except Exception as e:
            row.update(ok=False, error=f"{type(e).__name__}: {e}"[:300])
        failures += not row["ok"]
        results.append(row)
        print(json.dumps(row), flush=True)

    n_ok = sum(r["ok"] for r in results)
    print(json.dumps({"summary": f"{n_ok}/{len(results)} configs ok",
                      "backend": backend}), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
