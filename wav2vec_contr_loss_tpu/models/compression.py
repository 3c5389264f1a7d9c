"""Compression head: encoder features -> low-dim embedding sequence.

Equivalent of the reference's CompressionModule
(reference: compression_module.py:7-67): mean over the K hidden states,
Dropout(0.1), LeakyReLU, Linear(1024 -> 256) applied per frame.

TPU-native difference: the encoder already hands us the K-mean
(`layer_mean`, see models/wav2vec2.py), so this module takes (B, T, F)
directly instead of the reference's (B, K, F, T) stack; `from_stack` covers
callers holding a full stack. Output layout is (B, T, H) (time-major last
is a torch convention that buys nothing under XLA).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["CompressionModule", "clip_embedding"]


class CompressionModule(nn.Module):
    input_dim: int = 1024
    hidden_dim: int = 256
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, layer_mean: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        """(B, T, input_dim) K-averaged encoder features -> (B, T, hidden)."""
        x = nn.Dropout(self.dropout_rate)(
            layer_mean.astype(self.dtype), deterministic=deterministic
        )
        x = nn.leaky_relu(x, negative_slope=0.01)
        return nn.Dense(self.hidden_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj")(x)

    def from_stack(self, stack: jnp.ndarray, deterministic: bool = True
                   ) -> jnp.ndarray:
        """(B, K, F, T) reference-layout stack -> (B, T, hidden)
        (reference: compression_module.py:46-48 pools over K first)."""
        layer_mean = jnp.mean(stack, axis=1).transpose(0, 2, 1)
        return self(layer_mean, deterministic)


def clip_embedding(seq: jnp.ndarray, l2_normalize: bool = True) -> jnp.ndarray:
    """(B, T, H) -> (B, H): plain mean over time then L2 norm.

    The mean deliberately includes padded frames — that is what the
    reference does everywhere (reference: stage1_utils.py:122-123,
    extract_stage1_embeddings.py:156-163) and score parity requires it.
    """
    z = jnp.mean(seq.astype(jnp.float32), axis=1)
    if l2_normalize:
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    return z
