"""Plain MLP block: Dense(relu) hidden stack + linear head.

Mirrors the reference ``MLP_layer`` semantics (``charge_gn.py:30-45``):
hidden widths from config, relu activations, linear output layer, keras-style
glorot-uniform kernels and zero biases.  Matmul precision is configurable so
golden-parity runs can force fp32-highest on the MXU (SURVEY §7 stage 3).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    hidden: Sequence[int]
    out_dim: int
    dtype: Any = jnp.float32
    precision: Any = jax.lax.Precision.HIGHEST

    @nn.compact
    def __call__(self, x):
        for i, width in enumerate(self.hidden):
            x = nn.Dense(
                width,
                name=f"dense_{i}",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                precision=self.precision,
                kernel_init=nn.initializers.glorot_uniform(),
            )(x)
            x = nn.relu(x)
        x = nn.Dense(
            self.out_dim,
            name=f"dense_{len(self.hidden)}",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=self.precision,
            kernel_init=nn.initializers.glorot_uniform(),
        )(x)
        return x
