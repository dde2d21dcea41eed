"""Fused int8 conv kernel (`ops/conv_int8_pallas.py`), interpret mode.

The kernel must reproduce the XLA static-int8 conv + epilogue EXACTLY
(identical integer math: int8 inputs, int32 accumulation, the same f32
epilogue) across tile-edge cases: partial last time tile, halo rows across
tiles, Cout tiling, and the bf16 last-conv variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doubleattentionspeakerverification_tpu.models.quantized import _CONV_DN
from doubleattentionspeakerverification_tpu.ops.conv_int8_pallas import (
    _pick_tiles,
    conv3x3_int8_fused,
)


def _ref(q, w, mult, bias, out_kind):
    y = jax.lax.conv_general_dilated(
        q, w, (1, 1), "SAME", dimension_numbers=_CONV_DN,
        preferred_element_type=jnp.int32,
    )
    acc = y.astype(jnp.float32) * mult + bias
    if out_kind == "int8":
        return jnp.clip(jnp.round(acc), 0, 127).astype(jnp.int8)
    return jax.nn.relu(acc).astype(jnp.dtype(out_kind))


def _mk(b, t, f, cin, cout, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.integers(-127, 128, (b, t, f, cin)).astype(np.int8)
    w = rng.integers(-127, 128, (3, 3, cin, cout)).astype(np.int8)
    mult = (rng.uniform(0.5, 2.0, (cout,)) * 1e-3).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    return q, w, mult, bias


@pytest.mark.parametrize(
    "b,t,f,cin,cout,out_kind",
    [
        (2, 23, 80, 8, 16, "int8"),       # partial last tile (t_tile=8)
        (1, 16, 80, 8, 16, "int8"),       # exact tiling, halo across 2 tiles
        (2, 9, 80, 8, 16, "int8"),        # t barely above one tile
        (1, 7, 80, 8, 16, "int8"),        # t < t_tile (single partial tile)
        (2, 23, 80, 8, 16, "bfloat16"),   # last-conv variant
        (1, 20, 5, 8, 16, "float32"),     # tiny F, f32 out
    ],
)
def test_kernel_matches_xla(b, t, f, cin, cout, out_kind):
    q, w, mult, bias = _mk(b, t, f, cin, cout)
    want = np.asarray(_ref(q, w, mult[None], bias[None], out_kind))
    got = np.asarray(
        conv3x3_int8_fused(
            q, w.reshape(9, cin, cout), mult[None], bias[None],
            out_kind=out_kind, interpret=True,
        )
    )
    assert got.shape == want.shape and got.dtype == want.dtype
    if out_kind == "int8":
        # same integer math -> at most a round-to-nearest tie can differ
        # under f32 reassociation; require exactness
        np.testing.assert_array_equal(got, want)
    else:
        np.testing.assert_allclose(
            got.astype(np.float32), want.astype(np.float32), rtol=1e-2, atol=1e-3
        )


def test_cout_tiling_path(monkeypatch):
    """Force n_co > 1 (the flagship block-4 case: Cout split into tiles)."""
    import doubleattentionspeakerverification_tpu.ops.conv_int8_pallas as mod

    b, t, f, cin, cout = 1, 10, 80, 8, 256
    monkeypatch.setattr(mod, "_pick_tiles", lambda T, F, Ci, Co: (8, 128))
    q, w, mult, bias = _mk(b, t, f, cin, cout, seed=3)
    want = np.asarray(_ref(q, w, mult[None], bias[None], "int8"))
    got = np.asarray(
        conv3x3_int8_fused(q, w.reshape(9, cin, cout), mult[None], bias[None],
                           out_kind="int8", interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_static_apply_pallas_path_matches_xla():
    """The full static-int8 VGG forward with the Pallas convs (interpret)
    equals the XLA static path bit-for-bit on the int8 intermediates."""
    from doubleattentionspeakerverification_tpu.config import ModelConfig
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.models.quantized import (
        calibrate_int8_scales,
        fold_static_scales,
        quantize_vgg,
        quantized_vgg_apply_static,
    )

    cfg = ModelConfig(kernel_size=16, heads_number=4, embedding_size=32,
                      num_spkrs=5)
    params, _ = init_speaker_classifier(jax.random.PRNGKey(0), cfg)
    qvgg = quantize_vgg(params["vgg"])
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 50, 80)).astype(np.float32)
    lens = np.array([50, 33], np.int32)
    scales = calibrate_int8_scales(qvgg, x, lens, cfg)
    folded = fold_static_scales(qvgg, scales, cfg)

    ref, ref_len = quantized_vgg_apply_static(folded, scales[0], x, lens, cfg)
    out, out_len = quantized_vgg_apply_static(
        folded, scales[0], x, lens, cfg, use_pallas_conv=True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(out_len))
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32),
        rtol=1e-2, atol=1e-3,
    )
