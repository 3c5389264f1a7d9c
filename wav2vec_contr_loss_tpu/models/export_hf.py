"""JAX parameters -> HuggingFace Wav2Vec2 checkpoint (the inverse of
models/hf_convert.py).

A TPU-trained encoder should not lock its user out of the torch
ecosystem: `save_hf_checkpoint` writes a directory that
`transformers.Wav2Vec2Model.from_pretrained` loads directly — the exact
call the reference consumes pretrained encoders with
(reference: encoder.py:21). Everything hf_convert does is undone here:

  * Dense kernels transpose back (in, out) -> (out, in),
  * conv kernels transpose back (k, in, out) -> (out, in, k),
  * the collapsed positional-conv kernel is re-decomposed into the torch
    weight-norm parametrization (g = ||w|| over dims (0,1), v = w — an
    exact reconstruction since g·v/||v|| = w), emitted under whichever
    key layout the installed torch uses (weight_g/weight_v, the
    parametrizations.* layout, or a plain materialized weight),
  * the scan-stacked per-layer weights are unstacked, and a fused qkv
    projection is split back into q/k/v.

Round-trip parity (state dict AND torch forward outputs) is proven in
tests/test_export_hf.py.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable

import numpy as np

from .wav2vec2 import Wav2Vec2Config

__all__ = ["hf_config_from", "export_hf_state_dict", "save_hf_checkpoint"]


def hf_config_from(config: Wav2Vec2Config):
    """Our config dataclass -> transformers.Wav2Vec2Config (inverse of
    hf_convert.config_from_hf)."""
    from transformers import Wav2Vec2Config as HFConfig

    return HFConfig(
        hidden_size=config.hidden_size,
        num_hidden_layers=config.num_layers,
        num_attention_heads=config.num_heads,
        intermediate_size=config.intermediate_size,
        conv_dim=list(config.conv_dim),
        conv_kernel=list(config.conv_kernel),
        conv_stride=list(config.conv_stride),
        conv_bias=config.conv_bias,
        feat_extract_norm=config.feat_extract_norm,
        do_stable_layer_norm=config.do_stable_layer_norm,
        num_conv_pos_embeddings=config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=config.num_conv_pos_embedding_groups,
        layer_norm_eps=config.layer_norm_eps,
        hidden_dropout=config.hidden_dropout,
        attention_dropout=config.attention_dropout,
        activation_dropout=config.activation_dropout,
        feat_proj_dropout=config.feat_proj_dropout,
        apply_spec_augment=config.apply_spec_augment,
        mask_time_prob=config.mask_time_prob,
        mask_time_length=config.mask_time_length,
        mask_time_min_masks=config.mask_time_min_masks,
        layerdrop=0.0,
    )


def _f32(x) -> np.ndarray:
    # always copy: restored/jax leaves can be non-writable buffers, which
    # torch.from_numpy rejects (bf16-stored leaves also upcast here)
    return np.array(x, dtype=np.float32)


def _dense_out(sd: Dict, prefix: str, tree: Dict) -> None:
    sd[f"{prefix}.weight"] = _f32(tree["kernel"]).T
    sd[f"{prefix}.bias"] = _f32(tree["bias"])


def _ln_out(sd: Dict, prefix: str, tree: Dict) -> None:
    sd[f"{prefix}.weight"] = _f32(tree["scale"])
    sd[f"{prefix}.bias"] = _f32(tree["bias"])


def _pos_conv_out(sd: Dict, kernel, target_keys: Iterable[str]) -> None:
    """Emit the positional conv under the installed torch's weight-norm
    key layout. g·v/||v|| reproduces w exactly (g IS ||v||)."""
    w = _f32(kernel).transpose(2, 1, 0)          # -> (out, in/groups, k)
    prefix = "encoder.pos_conv_embed.conv"
    g = np.sqrt((w ** 2).sum(axis=(0, 1), keepdims=True))  # dim=2 norm
    # An all-zero (out,in) slice gives g[k]=0 AND ||v[k]||=0, and torch's
    # reconstruction g·v/||v|| would emit NaN (0·0/0). Substitute a unit
    # v for those slices (weight-norm layouts only — the plain-weight
    # layout exports w untouched): g stays 0, so the rebuilt w is
    # exactly 0, mirroring hf_convert's max(norm, 1e-12) import guard.
    v = w
    zero_k = (g == 0.0)[0, 0]
    if zero_k.any():
        v = w.copy()
        v[0, 0, zero_k] = 1.0
    keys = set(target_keys)
    if f"{prefix}.weight_g" in keys:
        sd[f"{prefix}.weight_g"] = g
        sd[f"{prefix}.weight_v"] = v
    elif f"{prefix}.parametrizations.weight.original0" in keys:
        sd[f"{prefix}.parametrizations.weight.original0"] = g
        sd[f"{prefix}.parametrizations.weight.original1"] = v
    else:
        sd[f"{prefix}.weight"] = w


def export_hf_state_dict(config: Wav2Vec2Config, params: Dict,
                         target_keys: Iterable[str]) -> Dict[str, np.ndarray]:
    """Flax Wav2Vec2Encoder params -> torch Wav2Vec2Model state dict
    (numpy values; bare-model names, no 'wav2vec2.' prefix).

    `target_keys` is the key set of the destination model's state_dict —
    it only decides the positional-conv weight-norm layout."""
    if config.quant != "none":
        raise ValueError("cannot export int8-quantized params to HF; "
                         "export the fp checkpoint instead")
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}

    fe = p["feature_extractor"]
    for i in range(len(config.conv_dim)):
        sd[f"feature_extractor.conv_layers.{i}.conv.weight"] = \
            _f32(fe[f"conv{i}"]["kernel"]).transpose(2, 1, 0)
        if config.conv_bias:
            sd[f"feature_extractor.conv_layers.{i}.conv.bias"] = \
                _f32(fe[f"conv{i}"]["bias"])
        if config.feat_extract_norm == "layer":
            _ln_out(sd, f"feature_extractor.conv_layers.{i}.layer_norm",
                    fe[f"norm{i}"]["LayerNorm_0"])
    if config.feat_extract_norm == "group":
        _ln_out(sd, "feature_extractor.conv_layers.0.layer_norm",
                fe["group_norm"])

    _ln_out(sd, "feature_projection.layer_norm",
            p["feature_projection"]["layer_norm"])
    _dense_out(sd, "feature_projection.projection",
               p["feature_projection"]["projection"])
    _pos_conv_out(sd, p["pos_conv_embed"]["conv"]["kernel"], target_keys)
    sd["encoder.pos_conv_embed.conv.bias"] = \
        _f32(p["pos_conv_embed"]["conv"]["bias"])
    _ln_out(sd, "encoder.layer_norm", p["encoder_layer_norm"])
    if "masked_spec_embed" in p:
        sd["masked_spec_embed"] = _f32(p["masked_spec_embed"])

    layers = p["layers"]["layer"]

    def sliced(tree: Dict, i: int) -> Dict:
        return {k: sliced(v, i) if isinstance(v, dict) else np.asarray(v)[i]
                for k, v in tree.items()}

    for i in range(config.num_layers):
        li = sliced(layers, i)
        pre = f"encoder.layers.{i}"
        att = li["attention"]
        if config.fused_qkv:
            k3 = _f32(att["qkv_proj"]["kernel"])    # (in, 3*D)
            b3 = _f32(att["qkv_proj"]["bias"])
            d = k3.shape[1] // 3
            for j, n in enumerate(("q_proj", "k_proj", "v_proj")):
                sd[f"{pre}.attention.{n}.weight"] = \
                    np.ascontiguousarray(k3[:, j * d:(j + 1) * d].T)
                sd[f"{pre}.attention.{n}.bias"] = b3[j * d:(j + 1) * d]
        else:
            for n in ("q_proj", "k_proj", "v_proj"):
                _dense_out(sd, f"{pre}.attention.{n}", att[n])
        _dense_out(sd, f"{pre}.attention.out_proj", att["out_proj"])
        _dense_out(sd, f"{pre}.feed_forward.intermediate_dense",
                   li["feed_forward"]["intermediate_dense"])
        _dense_out(sd, f"{pre}.feed_forward.output_dense",
                   li["feed_forward"]["output_dense"])
        _ln_out(sd, f"{pre}.layer_norm", li["layer_norm"])
        _ln_out(sd, f"{pre}.final_layer_norm", li["final_layer_norm"])
    return sd


def save_hf_checkpoint(out_dir: str, config: Wav2Vec2Config,
                       params: Dict) -> str:
    """Write an HF snapshot directory (config.json + weights) that
    `transformers.Wav2Vec2Model.from_pretrained(out_dir)` loads as-is.
    Uses safetensors when the package is present, torch pickle otherwise."""
    import torch
    from transformers import Wav2Vec2Model

    model = Wav2Vec2Model(hf_config_from(config))
    template = model.state_dict()
    sd = export_hf_state_dict(config, params, template.keys())
    tensors = {}
    for k, v in sd.items():
        if k not in template:
            raise KeyError(f"exported key {k!r} not in Wav2Vec2Model "
                           f"(transformers layout change?)")
        tensors[k] = torch.from_numpy(v).to(template[k].dtype)
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    # masked_spec_embed may legitimately be absent from a converted tree
    # (only used under SpecAugment training); anything else missing is a
    # mapping bug.
    real_missing = [m for m in missing if m != "masked_spec_embed"]
    if real_missing or unexpected:
        raise RuntimeError(f"HF export incomplete: missing={real_missing} "
                           f"unexpected={list(unexpected)}")
    try:
        import safetensors  # noqa: F401
        safe = True
    except ImportError:
        safe = False
    os.makedirs(out_dir, exist_ok=True)
    model.save_pretrained(out_dir, safe_serialization=safe)
    return out_dir
