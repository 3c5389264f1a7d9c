"""int8 quantized matmuls for the serving path (TPU-native capability).

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate (394 vs 197
TOPS) and int8 weights halve the encoder's weight HBM reads — both are
wins for the latency-bound serving forward (`SpoofScorer`,
docs/SERVING.md). The reference has no quantized path (it serves fp32
torch from .npy files — generate_eval_score_file.py:97-295); this is a
beyond-reference deployment feature, opt-in and measured.

Two modes, selected by `Wav2Vec2Config.quant`:

- 'w8a8': per-output-channel symmetric int8 weights + dynamic per-token
  symmetric int8 activations; the contraction runs int8 x int8 -> int32
  on the MXU and is rescaled in fp32. ~2x matmul peak.
- 'w8'  : weight-only int8 — the kernel is dequantized into the bf16
  matmul operand feed (XLA fuses the convert, so HBM reads stay int8).
  Same MXU rate as bf16, half the weight bandwidth, tighter numerics.

Inference-only: `jnp.round` has zero gradient, so the trainers never set
`quant` (Stage1Trainer/BaselineTrainer build encoders with the default
'none'). Quantized parameter trees are produced from trained fp32 params
by `quantize_encoder_params` — serving binds them as jit arguments.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["QuantDense", "quantize_encoder_params", "QUANT_TARGETS"]

# Dense submodules that carry >99% of the encoder's weight bytes
# (24 stacked layers x (4 attention projections + 2 FF matmuls)); LN
# scales, biases, the conv tower, and the feature projection stay fp32.
QUANT_TARGETS = frozenset({
    "q_proj", "k_proj", "v_proj", "out_proj", "qkv_proj",
    "intermediate_dense", "output_dense",
})


def _zeros_int8(key, shape, dtype=jnp.int8):
    # structural init only: quantized serving always binds params converted
    # from a trained fp32 tree (quantize_encoder_params), never init values
    del key
    return jnp.zeros(shape, dtype)


class QuantDense(nn.Module):
    """Dense layer over an int8 kernel with per-output-channel scales.

    Params: `kernel` int8 (in, out), `scale` f32 (out,), `bias` f32 (out,)
    — stacked along the layer axis by the encoder's `nn.scan` exactly like
    the fp32 Dense params they replace."""

    features: int
    dtype: Any = jnp.bfloat16
    mode: str = "w8a8"  # 'w8a8' | 'w8'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", _zeros_int8,
                            (x.shape[-1], self.features))
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dims = (((x.ndim - 1,), (0,)), ((), ()))
        if self.mode == "w8a8":
            xf = x.astype(jnp.float32)
            # dynamic symmetric per-token activation scale
            sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                             1e-8) / 127.0
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(xq, kernel, dims,
                                    preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (sx * scale)
        elif self.mode == "w8":
            # dequant happens in the matmul operand feed (fused convert):
            # weight HBM reads stay int8, accumulation stays the bf16 MXU
            y = jax.lax.dot_general(
                x.astype(self.dtype), kernel.astype(self.dtype), dims,
                preferred_element_type=jnp.float32)
            y = y * scale
        else:
            raise ValueError(f"unknown quant mode {self.mode!r}")
        return (y + bias).astype(self.dtype)


def _quantize_dense(node: Dict) -> Dict:
    """{kernel f32[..., in, out], bias} -> {kernel int8, scale, bias}.

    Works on scan-stacked kernels ([L, in, out] -> scales [L, out]) and
    plain ones alike: the scale is per output channel over the
    contraction axis (-2)."""
    w = jnp.asarray(node["kernel"], jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=-2), 1e-30) / 127.0
    wq = jnp.clip(jnp.round(w / sw[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"kernel": wq, "scale": sw.astype(jnp.float32)}
    if "bias" in node:
        out["bias"] = jnp.asarray(node["bias"], jnp.float32)
    return out


def quantize_encoder_params(params: Dict) -> Dict:
    """fp32 encoder param tree -> the tree `quant != 'none'` encoders bind.

    Quantizes exactly the QUANT_TARGETS Dense subtrees (wherever they sit
    — stacked under `layers` or not); every other leaf passes through
    unchanged."""

    def walk(name: str, node):
        if isinstance(node, dict):
            if name in QUANT_TARGETS and "kernel" in node:
                return _quantize_dense(node)
            return {k: walk(k, v) for k, v in node.items()}
        return node

    return {k: walk(k, v) for k, v in params.items()}
