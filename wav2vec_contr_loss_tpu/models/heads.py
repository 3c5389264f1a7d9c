"""Stage-2 classifier heads and the end-to-end BCE model assembly.

Heads match the reference's (reference: stage2_utils.py:22-50); the
end-to-end model mirrors End2EndBCEModel
(reference: baseline_train.py:155-178): encoder -> compression ->
time-mean -> Linear(hidden -> 1) logits.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .compression import CompressionModule, clip_embedding
from .wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

__all__ = ["LinearBinaryHead", "SmallMLPBinaryHead", "build_head",
           "SpoofDetector"]


class LinearBinaryHead(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return nn.Dense(1, param_dtype=jnp.float32, name="fc")(x)[..., 0]


class SmallMLPBinaryHead(nn.Module):
    hidden: int = 128
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(1, param_dtype=jnp.float32, name="fc2")(x)[..., 0]


def build_head(head_type: str, hidden: int = 128, dropout: float = 0.2) -> nn.Module:
    """Factory keyed the same way as the reference's HEAD_TYPE config
    (reference: stage2_utils.py:45-50)."""
    if head_type == "linear":
        return LinearBinaryHead()
    if head_type == "mlp":
        return SmallMLPBinaryHead(hidden=hidden, dropout=dropout)
    raise ValueError(f"Unknown head type: {head_type}")


class SpoofDetector(nn.Module):
    """Encoder + compression (+ optional classifier) in one module.

    mode:
      'embed'  -> (B, D) L2-normalized clip embeddings (Stage-1 / extraction,
                  reference: extract_stage1_embeddings.py:147-163),
      'logits' -> (B,) BCE logits (baseline end-to-end,
                  reference: baseline_train.py:155-178).
    """

    encoder_config: Wav2Vec2Config
    hidden_dim: int = 256
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(
        self,
        waveforms: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        encoder_deterministic: Optional[bool] = None,
        mode: str = "embed",
    ):
        # a frozen encoder stays in eval mode even while the head trains
        # (reference: encoder.py:24-27, stage1_utils.py:104-107)
        enc_det = deterministic if encoder_deterministic is None else encoder_deterministic
        enc_out = Wav2Vec2Encoder(self.encoder_config, name="encoder")(
            waveforms, attention_mask, deterministic=enc_det
        )
        seq = CompressionModule(
            input_dim=self.encoder_config.hidden_size,
            hidden_dim=self.hidden_dim,
            dropout_rate=self.dropout_rate,
            name="compression",
        )(enc_out["layer_mean"], deterministic=deterministic)
        if mode == "embed":
            return clip_embedding(seq, l2_normalize=True)
        if mode == "logits":
            pooled = clip_embedding(seq, l2_normalize=False)
            return nn.Dense(1, param_dtype=jnp.float32, name="classifier")(
                pooled
            )[..., 0]
        raise ValueError(f"Unknown mode: {mode}")
