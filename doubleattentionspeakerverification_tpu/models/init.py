"""Parameter initializers.

Default initialization mirrors the distributions the reference model starts
from, so training-from-scratch dynamics are comparable:
- conv / linear layers: torch's default ``kaiming_uniform_(a=sqrt(5))`` with
  the matching uniform bias bound (what ``nn.Conv2d``/``nn.Linear`` do).
- attention query/vector params: ``xavier_normal_``
  (reference ``scripts/poolings.py:9-12`` new_parameter).
- AM-Softmax W: ``xavier_normal_`` gain 1 (``scripts/loss.py:22-23``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform(key, shape, fan_in: int, a: float = math.sqrt(5.0), dtype=jnp.float32):
    """torch ``kaiming_uniform_`` with leaky-relu gain, as used by default
    torch layers: bound = sqrt(6 / ((1 + a^2) * fan_in))."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def uniform_bias(key, shape, fan_in: int, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_normal(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """torch ``xavier_normal_``: std = gain * sqrt(2 / (fan_in + fan_out)).
    Fans follow torch's convention for 2D tensors: fan_in = shape[1],
    fan_out = shape[0]."""
    fan_out, fan_in = shape[0], shape[1] if len(shape) > 1 else shape[0]
    if len(shape) > 2:  # conv-like (out, in, *kernel)
        receptive = math.prod(shape[2:])
        fan_in = shape[1] * receptive
        fan_out = shape[0] * receptive
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def linear_params(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    """Weight stored as (in, out) — the natural layout for x @ W on the MXU."""
    kw, kb = jax.random.split(key)
    w = kaiming_uniform(kw, (out_dim, in_dim), fan_in=in_dim, dtype=dtype).T
    b = uniform_bias(kb, (out_dim,), fan_in=in_dim, dtype=dtype)
    return {"w": w, "b": b}


def conv2d_params(key, in_ch: int, out_ch: int, ksize: int = 3, dtype=jnp.float32):
    """HWIO kernel layout (TPU-native)."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * ksize * ksize
    w = kaiming_uniform(kw, (out_ch, in_ch, ksize, ksize), fan_in=fan_in, dtype=dtype)
    w = jnp.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
    b = uniform_bias(kb, (out_ch,), fan_in=fan_in, dtype=dtype)
    return {"w": w, "b": b}
