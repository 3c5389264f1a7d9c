"""HuggingFace Wav2Vec2 checkpoint -> JAX parameter conversion.

The reference consumes pretrained encoders directly via
`transformers.Wav2Vec2Model.from_pretrained` (reference: encoder.py:21).
Here the torch state dict is mapped onto our flax parameter tree:

  * Dense kernels transpose (out, in) -> (in, out),
  * conv kernels transpose (out, in, k) -> (k, in, out),
  * the positional conv's weight-norm parametrization (g, v) is collapsed
    into the effective kernel w = g * v / ||v|| (norm over dims 0,1 —
    torch weight_norm dim=2),
  * per-layer transformer weights are stacked along a leading axis to feed
    the scanned layer stack (models/wav2vec2.py).

Works from (a) an in-memory torch state dict (tests use a random small HF
model), (b) a pretrained HF model name when network/cache is available, or
(c) a locally dropped snapshot dir / weights file with NO network
(`load_local_hf_checkpoint`, surfaced as cli.convert_hf_checkpoint).
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import numpy as np

from .wav2vec2 import Wav2Vec2Config, config_from_dict, config_to_dict

__all__ = ["convert_hf_state_dict", "config_from_hf", "load_pretrained",
           "load_local_hf_checkpoint", "save_encoder_init",
           "load_encoder_init"]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _dense(sd: Mapping, prefix: str) -> Dict:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def _ln(sd: Mapping, prefix: str) -> Dict:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _pos_conv_kernel(sd: Mapping, prefix: str) -> np.ndarray:
    """Collapse torch weight-norm (dim=2) into the effective conv kernel."""
    if f"{prefix}.weight_v" in sd:
        v = _np(sd[f"{prefix}.weight_v"])
        g = _np(sd[f"{prefix}.weight_g"])
    elif f"{prefix}.parametrizations.weight.original1" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    elif f"{prefix}.weight" in sd:  # already materialized
        return _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0)
    else:
        raise KeyError(f"no positional-conv weight under {prefix}")
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)     # (out, in/groups, k)
    return w.transpose(2, 1, 0)             # -> (k, in/groups, out)


def convert_hf_state_dict(
    state_dict: Mapping, config: Wav2Vec2Config
) -> Dict:
    """torch Wav2Vec2Model state dict -> flax params for Wav2Vec2Encoder."""
    sd = {k.removeprefix("wav2vec2."): v for k, v in state_dict.items()}

    fe: Dict = {}
    for i in range(len(config.conv_dim)):
        conv = {"kernel": _np(sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
                              ).transpose(2, 1, 0)}
        if config.conv_bias:
            conv["bias"] = _np(sd[f"feature_extractor.conv_layers.{i}.conv.bias"])
        fe[f"conv{i}"] = conv
        if config.feat_extract_norm == "layer":
            fe[f"norm{i}"] = {
                "LayerNorm_0": _ln(sd, f"feature_extractor.conv_layers.{i}.layer_norm")
            }
    if config.feat_extract_norm == "group":
        fe["group_norm"] = _ln(sd, "feature_extractor.conv_layers.0.layer_norm")

    params: Dict = {
        "feature_extractor": fe,
        "feature_projection": {
            "layer_norm": _ln(sd, "feature_projection.layer_norm"),
            "projection": _dense(sd, "feature_projection.projection"),
        },
        "pos_conv_embed": {
            "conv": {
                "kernel": _pos_conv_kernel(sd, "encoder.pos_conv_embed.conv"),
                "bias": _np(sd["encoder.pos_conv_embed.conv.bias"]),
            }
        },
        "encoder_layer_norm": _ln(sd, "encoder.layer_norm"),
    }
    if config.apply_spec_augment and "masked_spec_embed" in sd:
        params["masked_spec_embed"] = _np(sd["masked_spec_embed"])

    # stack per-layer weights along the scan axis
    def stacked(make_one):
        leaves = [make_one(i) for i in range(config.num_layers)]
        return _stack_trees(leaves)

    def attention_params(i: int) -> Dict:
        if config.fused_qkv:
            parts = [_dense(sd, f"encoder.layers.{i}.attention.{n}")
                     for n in ("q_proj", "k_proj", "v_proj")]
            return {
                "qkv_proj": {
                    "kernel": np.concatenate([p["kernel"] for p in parts], axis=1),
                    "bias": np.concatenate([p["bias"] for p in parts]),
                },
                "out_proj": _dense(sd, f"encoder.layers.{i}.attention.out_proj"),
            }
        return {
            name: _dense(sd, f"encoder.layers.{i}.attention.{name}")
            for name in ("q_proj", "k_proj", "v_proj", "out_proj")
        }

    params["layers"] = {
        "layer": stacked(
            lambda i: {
                "attention": attention_params(i),
                "feed_forward": {
                    "intermediate_dense": _dense(
                        sd, f"encoder.layers.{i}.feed_forward.intermediate_dense"
                    ),
                    "output_dense": _dense(
                        sd, f"encoder.layers.{i}.feed_forward.output_dense"
                    ),
                },
                "layer_norm": _ln(sd, f"encoder.layers.{i}.layer_norm"),
                "final_layer_norm": _ln(sd, f"encoder.layers.{i}.final_layer_norm"),
            }
        )
    }
    return params


def _stack_trees(trees):
    out = {}
    for k, v in trees[0].items():
        if isinstance(v, dict):
            out[k] = _stack_trees([t[k] for t in trees])
        else:
            out[k] = np.stack([t[k] for t in trees], axis=0)
    return out


def config_from_hf(hf_config) -> Wav2Vec2Config:
    """transformers.Wav2Vec2Config -> our config dataclass."""
    return Wav2Vec2Config(
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        conv_dim=tuple(hf_config.conv_dim),
        conv_kernel=tuple(hf_config.conv_kernel),
        conv_stride=tuple(hf_config.conv_stride),
        conv_bias=hf_config.conv_bias,
        feat_extract_norm=hf_config.feat_extract_norm,
        do_stable_layer_norm=hf_config.do_stable_layer_norm,
        num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf_config.num_conv_pos_embedding_groups,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_dropout=hf_config.hidden_dropout,
        attention_dropout=hf_config.attention_dropout,
        activation_dropout=hf_config.activation_dropout,
        feat_proj_dropout=hf_config.feat_proj_dropout,
        apply_spec_augment=hf_config.apply_spec_augment,
        mask_time_prob=hf_config.mask_time_prob,
        mask_time_length=hf_config.mask_time_length,
        mask_time_min_masks=getattr(hf_config, "mask_time_min_masks", 2),
    )


def load_pretrained(model_name: str):
    """(config, params) from a pretrained HF checkpoint. Needs the HF cache
    or network access; in air-gapped environments use
    `load_local_hf_checkpoint` / cli.convert_hf_checkpoint on a dropped
    snapshot directory instead."""
    from transformers import Wav2Vec2Model

    model = Wav2Vec2Model.from_pretrained(model_name)
    cfg = config_from_hf(model.config)
    return cfg, convert_hf_state_dict(model.state_dict(), cfg)


def _read_weight_file(path: str) -> Dict:
    """One weights file -> {name: np.ndarray}. Supports safetensors and
    torch pickle (.bin/.pt), both loaded host-side (no GPU/torch device)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}


def load_local_hf_checkpoint(src: str):
    """(config, params) from a LOCALLY dropped HF checkpoint — no network.

    `src` may be:
      * an HF snapshot directory (config.json + model.safetensors /
        pytorch_model.bin, sharded *.index.json supported), e.g. the
        result of `save_pretrained` or a manually copied hub snapshot;
      * a single .safetensors / .bin / .pt weights file with config.json
        beside it.

    This is the offline ingestion leg for the air-gapped environment: the
    reference loads `Wav2Vec2Model.from_pretrained` over the network
    (reference: encoder.py:21); here a file drop plus
    cli.convert_hf_checkpoint yields persisted Orbax params with zero
    code between "weights appear" and training/verify_parity."""
    import json as _json

    if os.path.isdir(src):
        d = src
        weight_files: list = []
        for index in ("model.safetensors.index.json",
                      "pytorch_model.bin.index.json"):
            ip = os.path.join(d, index)
            if os.path.exists(ip):
                with open(ip) as f:
                    shard_names = sorted(set(
                        _json.load(f)["weight_map"].values()))
                weight_files = [os.path.join(d, s) for s in shard_names]
                break
        if not weight_files:
            for cand in ("model.safetensors", "pytorch_model.bin",
                         "pytorch_model.pt"):
                cp = os.path.join(d, cand)
                if os.path.exists(cp):
                    weight_files = [cp]
                    break
        if not weight_files:
            raise FileNotFoundError(
                f"no weights (model.safetensors / pytorch_model.bin / "
                f"*.index.json) under {d}")
    else:
        d = os.path.dirname(os.path.abspath(src))
        weight_files = [src]

    config_path = os.path.join(d, "config.json")
    if not os.path.exists(config_path):
        raise FileNotFoundError(f"no config.json beside weights: {config_path}")
    from transformers import Wav2Vec2Config as HFConfig

    with open(config_path) as f:
        hf_cfg = HFConfig.from_dict(_json.load(f))
    sd: Dict = {}
    for wf in weight_files:
        sd.update(_read_weight_file(wf))
    cfg = config_from_hf(hf_cfg)
    return cfg, convert_hf_state_dict(sd, cfg)


def save_encoder_init(out_dir: str, config: Wav2Vec2Config, params: Dict,
                      name: str = "encoder", source: str = "") -> str:
    """Persist converted encoder params as an Orbax checkpoint the CLIs
    can consume via `--encoder_init <out_dir>`."""
    from ..train import checkpoint as ckpt

    return ckpt.save_checkpoint(
        out_dir, name, params,
        extra={"enc_config": config_to_dict(config), "source": source},
    )


def load_encoder_init(path: str):
    """(config, params) from a directory written by `save_encoder_init`.

    Accepts the out_dir itself (containing the 'encoder' checkpoint) or a
    direct <dir>/<name> checkpoint path."""
    from ..train import checkpoint as ckpt

    path = os.path.abspath(path)
    if ckpt.checkpoint_exists(path, "encoder"):
        directory, name = path, "encoder"
    else:
        directory, name = os.path.dirname(path), os.path.basename(path)
        if not ckpt.checkpoint_exists(directory, name):
            raise FileNotFoundError(f"no encoder checkpoint at {path}")
    params, sidecar = ckpt.restore_checkpoint(directory, name)
    cfg = config_from_dict(sidecar["extra"]["enc_config"])
    return cfg, params
