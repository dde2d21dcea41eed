"""SpecAugment on-device masking (dsp/augment.py + TrainConfig.specaugment).

Beyond-reference capability (its only augmentation is random slicing,
scripts/train.py:205-207); off by default for parity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from doubleattentionspeakerverification_tpu.dsp.augment import spec_augment


def test_spec_augment_masks_full_spans_and_nothing_else():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((4, 64, 80))
    y = np.asarray(spec_augment(x, rng, time_masks=1, time_width=10,
                                freq_masks=1, freq_width=8))
    for b in range(4):
        # zeroed time frames form one contiguous span of width <= 10 that is
        # zero across all unmasked mel bins; same transposed for freq
        t_zero = np.where((y[b] == 0).all(axis=1))[0]
        f_zero = np.where((y[b] == 0).all(axis=0))[0]
        assert len(t_zero) <= 10 and len(f_zero) <= 8
        if len(t_zero):
            assert (np.diff(t_zero) == 1).all()
        if len(f_zero):
            assert (np.diff(f_zero) == 1).all()
        # every zero cell lies on a masked row or column (no stray zeros)
        zb = np.argwhere(y[b] == 0)
        assert all(t in t_zero or f in f_zero for t, f in zb)


def test_spec_augment_deterministic_and_key_dependent():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 80)),
                    jnp.float32)
    a = spec_augment(x, jax.random.PRNGKey(7))
    b = spec_augment(x, jax.random.PRNGKey(7))
    c = spec_augment(x, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_spec_augment_zero_masks_noop():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 40, 80)),
                    jnp.float32)
    y = spec_augment(x, jax.random.PRNGKey(0), time_masks=0, time_width=0,
                     freq_masks=0, freq_width=0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_spec_augment_expected_mask_fraction():
    """Mean masked width per span is ~max_width/2; with 1 time mask over T
    frames the expected masked-frame fraction is width/(2T). Check within a
    loose band over many samples."""
    rng = jax.random.PRNGKey(3)
    x = jnp.ones((512, 100, 16))
    y = np.asarray(spec_augment(x, rng, time_masks=1, time_width=40,
                                freq_masks=0, freq_width=0))
    frac = (y == 0).all(axis=2).mean()
    assert 0.12 < frac < 0.28  # expectation 0.20


def test_train_step_with_specaugment_runs_and_differs():
    from doubleattentionspeakerverification_tpu.config import (
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.training.step import (
        init_train_state,
        make_train_step,
    )

    model = ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=4)
    batch = {
        "inputs": np.random.default_rng(0)
        .standard_normal((2, 2, 48, 80))
        .astype(np.float32),
        "lengths": np.full((2, 2), 48, np.int32),
        "labels": np.zeros((2, 2), np.int32),
    }

    losses = {}
    for flag in (False, True):
        cfg = ExperimentConfig(
            model=model,
            train=TrainConfig(batch_size=2, gradient_accumulation=2, specaugment=flag,
                              specaugment_time_width=12, specaugment_freq_width=8),
        )
        p, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
        state = init_train_state(p, ms, cfg)
        step = make_train_step(cfg, donate=False)
        _, metrics = step(state, batch, jax.random.PRNGKey(5))
        losses[flag] = float(metrics["loss"])
        assert np.isfinite(losses[flag])
    assert losses[False] != losses[True]  # augmentation actually engaged
