"""Reference-trained torch `.pt` checkpoints -> framework checkpoints.

The reference's reload contract consumes three trained torch artifact
formats:

  * stage-1: ``{epoch, compression_state_dict, train_loss, dev_loss,
    config, [encoder_state_dict]}`` written by train_stage1.py:114-129 and
    reloaded at extract_stage1_embeddings.py:94-163 (including the
    DataParallel ``module.`` prefix stripping of
    `load_state_dict_flexible`);
  * stage-2 head: ``{epoch, model_state_dict, ..., config}`` written by
    stage2_utils.py:186-207 and reloaded at
    generate_eval_score_file.py:97-124;
  * baseline: ``{epoch, model_state_dict, best_eer, ..., config}`` written
    by baseline_train.py:392-417 and reloaded at
    eval_baseline_score_file.py:54-74.

This module maps each into the Orbax checkpoints our extractor / scorer /
server restore natively (`Stage1Trainer.from_checkpoint`,
`cli.generate_scores.load_stage2_head`, `BaselineTrainer.from_checkpoint`),
so a reference user's trained models carry over WITHOUT retraining.
Surfaced as `cli.convert_reference_checkpoint`.

Encoder architecture resolution (the .pt files carry weights but no HF
config.json): an ``--encoder_init`` directory from
`cli.convert_hf_checkpoint` supplies both architecture and pretrained
weights (required for frozen stage-1 checkpoints, which embed no encoder
state — the reference re-downloads by MODEL_NAME at reload,
extract_stage1_embeddings.py:117); an ``--hf_config`` config.json supplies
architecture only; failing both, well-known MODEL_NAME values map to the
built-in configs.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from ..config import BaselineConfig, Stage1Config, Stage2Config
from .hf_convert import _np, config_from_hf, convert_hf_state_dict, load_encoder_init
from .wav2vec2 import LARGE_960H, XLSR_300M, Wav2Vec2Config

__all__ = [
    "detect_kind",
    "convert_reference_checkpoint",
    "convert_stage1_checkpoint",
    "convert_stage2_checkpoint",
    "convert_baseline_checkpoint",
    "stage1_config_from_ckpt_dict",
    "export_reference_checkpoint",
    "export_stage1_checkpoint",
    "export_stage2_checkpoint",
    "export_baseline_checkpoint",
]

# MODEL_NAME values of the published runs -> built-in architectures
# (reference: encoder.py:17 default, train_stage1.sbatch:71 sweeps)
_KNOWN_MODELS = {
    "facebook/wav2vec2-xls-r-300m": XLSR_300M,
    "facebook/wav2vec2-large-960h": LARGE_960H,
}


def _load_pt(path: str) -> Dict:
    """torch.load a reference checkpoint (host-side, trusted local file —
    the reference saves with plain pickle, so weights_only must stay off
    for the embedded config dicts)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _strip_module_prefix(sd: Mapping) -> Dict:
    """DataParallel 'module.' prefixes (reference:
    extract_stage1_embeddings.py:94-107 load_state_dict_flexible)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def detect_kind(ckpt: Mapping) -> str:
    """'stage1' | 'stage2' | 'baseline' from a loaded .pt dict's keys."""
    if "compression_state_dict" in ckpt:
        return "stage1"
    sd = ckpt.get("model_state_dict")
    if sd is None:
        raise ValueError(
            "unrecognized reference checkpoint: neither "
            "compression_state_dict (stage-1) nor model_state_dict "
            "(stage-2 head / baseline) present")
    if any(k.startswith(("encoder.", "module.encoder.")) for k in sd):
        return "baseline"
    return "stage2"


# ------------------------------------------------------------ sub-trees
def convert_compression_state_dict(sd: Mapping) -> Dict:
    """torch CompressionModule state dict -> our flax params
    (reference: compression_module.py:30-32 — the only parameters are
    mlp3.weight/bias; dropout/LeakyReLU are parameter-free)."""
    sd = _strip_module_prefix(sd)
    return {"proj": {"kernel": _np(sd["mlp3.weight"]).T,
                     "bias": _np(sd["mlp3.bias"])}}


def convert_head_state_dict(sd: Mapping) -> Tuple[str, Dict]:
    """torch stage-2 head state dict -> (head_type, flax params)
    (reference: stage2_utils.py:22-42: LinearBinaryHead 'fc.*',
    SmallMLPBinaryHead 'net.0/3.*')."""
    sd = _strip_module_prefix(sd)
    if "fc.weight" in sd:
        return "linear", {"fc": {"kernel": _np(sd["fc.weight"]).T,
                                 "bias": _np(sd["fc.bias"])}}
    if "net.0.weight" in sd:
        return "mlp", {
            "fc1": {"kernel": _np(sd["net.0.weight"]).T,
                    "bias": _np(sd["net.0.bias"])},
            "fc2": {"kernel": _np(sd["net.3.weight"]).T,
                    "bias": _np(sd["net.3.bias"])},
        }
    raise ValueError(
        f"unrecognized stage-2 head state dict (keys: {sorted(sd)[:6]}...)")


def convert_encoder_state_dict(sd: Mapping, enc_config: Wav2Vec2Config
                               ) -> Dict:
    """Reference Wav2Vec2Encoder wrapper state dict -> our flax params.
    The wrapper holds the HF model at attribute `model`
    (reference: encoder.py:21), so keys are 'model.<hf key>'."""
    sd = _strip_module_prefix(sd)
    sd = {(k[len("model."):] if k.startswith("model.") else k): v
          for k, v in sd.items()}
    return convert_hf_state_dict(sd, enc_config)


def _resolve_encoder(
    encoder_init: Optional[str],
    hf_config: Optional[str],
    model_name: Optional[str],
    need_params: bool,
) -> Tuple[Wav2Vec2Config, Optional[Dict]]:
    """-> (architecture config, pretrained params or None)."""
    if encoder_init is not None:
        return load_encoder_init(encoder_init)
    if need_params:
        raise ValueError(
            "this checkpoint embeds no encoder weights (frozen-encoder "
            "run: the reference reloads the pretrained encoder by "
            "MODEL_NAME at extraction time) — pass --encoder_init "
            "<dir from convert_hf_checkpoint> to supply them")
    if hf_config is not None:
        import json

        from transformers import Wav2Vec2Config as HFConfig

        with open(hf_config) as f:
            return config_from_hf(HFConfig.from_dict(json.load(f))), None
    if model_name in _KNOWN_MODELS:
        return _KNOWN_MODELS[model_name], None
    raise ValueError(
        f"cannot resolve the encoder architecture for MODEL_NAME="
        f"{model_name!r}: pass --encoder_init or --hf_config "
        f"(known names: {sorted(_KNOWN_MODELS)})")


# ------------------------------------------------------------- configs
def stage1_config_from_ckpt_dict(c: Mapping) -> Stage1Config:
    """Inverse of Stage1Config.ckpt_config — the reference's UPPERCASE
    checkpoint config dict (reference: stage1_config.py:261-283) back to
    our dataclass; keys absent from the dict keep our defaults."""
    field_map = {
        "MODEL_NAME": "model_name", "INPUT_DIM": "input_dim",
        "HIDDEN_DIM": "hidden_dim", "DROPOUT": "dropout",
        "BATCH_SIZE": "batch_size", "HEAD_LR": "head_lr",
        "ENC_LR": "enc_lr", "WEIGHT_DECAY": "weight_decay",
        "TEMPERATURE": "temperature", "TOPK_NEG": "topk_neg",
        "WARMUP_EPOCHS": "warmup_epochs", "ALPHA_END": "alpha_end",
        "ALPHA_RAMP_EPOCHS": "alpha_ramp_epochs",
        "USE_RAWBOOST": "use_rawboost", "RAWBOOST_PROB": "rawboost_prob",
        "UNIFORMITY_WEIGHT": "uniformity_weight",
        "UNIFORMITY_T": "uniformity_t",
        "SUPCON_SIMILARITY": "supcon_similarity",
        "FINETUNE_ENCODER": "finetune_encoder",
    }
    kw = {field_map[k]: v for k, v in c.items() if k in field_map}
    return Stage1Config(**kw)


def _baseline_config_from_ckpt_dict(c: Mapping) -> BaselineConfig:
    """Reference baseline config dict (baseline_train.py:400-414; note its
    lowercase enc_lr/head_lr and train_batch_size keys) -> BaselineConfig."""
    field_map = {
        "MODEL_NAME": "model_name", "INPUT_DIM": "input_dim",
        "HIDDEN_DIM": "hidden_dim", "DROPOUT": "dropout",
        "enc_lr": "enc_lr", "head_lr": "head_lr",
        "WEIGHT_DECAY": "weight_decay", "train_batch_size": "batch_size",
        "USE_RAWBOOST": "use_rawboost", "RAWBOOST_PROB": "rawboost_prob",
        "PATIENCE": "patience", "FINETUNE_ENCODER": "finetune_encoder",
    }
    kw = {field_map[k]: v for k, v in c.items() if k in field_map}
    return BaselineConfig(**kw)


# ------------------------------------------------------------ converters
def convert_stage1_checkpoint(
    src: str,
    out_dir: str,
    encoder_init: Optional[str] = None,
    hf_config: Optional[str] = None,
    name: str = "best",
    config_overrides: Optional[Dict] = None,
    ckpt: Optional[Dict] = None,
) -> str:
    """Reference stage-1 .pt -> an Orbax checkpoint directory that
    `Stage1Trainer.from_checkpoint(out_dir, name)` (and therefore
    cli.extract_embeddings / the serving stack) restores natively.

    The full Stage1State is synthesized: imported compression (+ encoder,
    when the .pt embeds a finetuned one) parameters, fresh optimizer
    state (the reference saves none — train_stage1.py:119-128), step 0.
    """
    import jax

    from ..train import checkpoint as ckpt_mod
    from ..train.stage1 import Stage1Trainer

    ckpt = _load_pt(src) if ckpt is None else ckpt
    if "compression_state_dict" not in ckpt:
        raise ValueError(f"{src} is not a reference stage-1 checkpoint")
    cfg = stage1_config_from_ckpt_dict(ckpt.get("config", {}))
    if config_overrides:
        cfg = cfg.replace(**config_overrides)
    finetuned = "encoder_state_dict" in ckpt

    enc_cfg, enc_params = _resolve_encoder(
        encoder_init, hf_config, cfg.model_name, need_params=not finetuned)
    if finetuned:
        enc_params = convert_encoder_state_dict(
            ckpt["encoder_state_dict"], enc_cfg)
    comp_params = convert_compression_state_dict(
        ckpt["compression_state_dict"])

    trainer = Stage1Trainer(cfg, enc_config=enc_cfg, enc_params=enc_params)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    state = state.replace(
        params={**state.params,
                "compression": jax.device_put(comp_params)})

    metrics = {k: ckpt[k] for k in ("epoch", "train_loss", "dev_loss")
               if k in ckpt}
    metrics["converted_from"] = os.path.abspath(src)
    path = ckpt_mod.save_checkpoint(
        out_dir, name, state, cfg.ckpt_config(), metrics,
        trainer._sidecar_extra())
    ckpt_mod.wait_for_saves()
    return path


def convert_stage2_checkpoint(
    src: str,
    out_dir: str,
    name: str = "stage2_binary_head_best",
    ckpt: Optional[Dict] = None,
) -> str:
    """Reference stage-2 head .pt -> the checkpoint
    `cli.generate_scores.load_stage2_head` / `cli.train_stage2` consume."""
    from ..train import checkpoint as ckpt_mod

    ckpt = _load_pt(src) if ckpt is None else ckpt
    head_type, params = convert_head_state_dict(ckpt["model_state_dict"])
    c = ckpt.get("config", {})
    in_dim = c.get("IN_DIM")
    if in_dim is None:  # infer from the first layer's kernel
        first = params["fc" if head_type == "linear" else "fc1"]
        in_dim = int(np.asarray(first["kernel"]).shape[0])
    cfg = Stage2Config(
        head_type=c.get("HEAD_TYPE", head_type),
        in_dim=int(in_dim),
        hidden_dim=int(c.get("HIDDEN_DIM", 128)),
        dropout=float(c.get("DROPOUT", 0.2)),
    )
    if cfg.head_type != head_type:
        raise ValueError(
            f"checkpoint config says HEAD_TYPE={cfg.head_type} but the "
            f"state dict is a {head_type} head")
    metrics = {k: ckpt[k] for k in ("epoch", "train_loss", "dev_loss",
                                    "dev_acc", "dev_auc", "dev_eer")
               if k in ckpt and ckpt[k] is not None}
    metrics["converted_from"] = os.path.abspath(src)
    path = ckpt_mod.save_checkpoint(out_dir, name, params,
                                    cfg.ckpt_config(), metrics)
    ckpt_mod.wait_for_saves()
    return path


def convert_baseline_checkpoint(
    src: str,
    out_dir: str,
    encoder_init: Optional[str] = None,
    hf_config: Optional[str] = None,
    name: str = "baseline_best",
    config_overrides: Optional[Dict] = None,
    ckpt: Optional[Dict] = None,
) -> str:
    """Reference baseline .pt (full End2EndBCEModel state dict:
    encoder.* / compression.* / classifier.*, baseline_train.py:153-176)
    -> a checkpoint `BaselineTrainer.from_checkpoint(out_dir, name)`
    (and cli.score_baseline) restores natively. The baseline .pt always
    embeds the encoder weights, so only the ARCHITECTURE needs resolving.
    """
    import jax

    from ..train import checkpoint as ckpt_mod
    from ..train.baseline import BaselineTrainer

    ckpt = _load_pt(src) if ckpt is None else ckpt
    sd = _strip_module_prefix(ckpt["model_state_dict"])
    cfg = _baseline_config_from_ckpt_dict(ckpt.get("config", {}))
    if config_overrides:
        cfg = cfg.replace(**config_overrides)

    enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    comp_sd = {k[len("compression."):]: v for k, v in sd.items()
               if k.startswith("compression.")}
    if not enc_sd or not comp_sd or "classifier.weight" not in sd:
        raise ValueError(
            f"{src} is not a reference baseline checkpoint "
            "(need encoder.* / compression.* / classifier.*)")

    enc_cfg, _ = _resolve_encoder(encoder_init, hf_config, cfg.model_name,
                                  need_params=False)
    enc_params = convert_encoder_state_dict(enc_sd, enc_cfg)
    comp_params = convert_compression_state_dict(comp_sd)
    cls_params = {"kernel": _np(sd["classifier.weight"]).T,
                  "bias": _np(sd["classifier.bias"])}

    trainer = BaselineTrainer(cfg, enc_config=enc_cfg, enc_params=enc_params)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    state = state.replace(
        params={**state.params,
                "compression": jax.device_put(comp_params),
                "classifier": jax.device_put(cls_params)})

    metrics = {k: ckpt[k] for k in ("epoch", "best_eer", "train_loss",
                                    "dev_loss") if k in ckpt}
    metrics["converted_from"] = os.path.abspath(src)
    path = ckpt_mod.save_checkpoint(
        out_dir, name, state, cfg.ckpt_config(), metrics,
        trainer._sidecar_extra())
    ckpt_mod.wait_for_saves()
    return path


def convert_reference_checkpoint(
    src: str,
    out_dir: str,
    kind: str = "auto",
    encoder_init: Optional[str] = None,
    hf_config: Optional[str] = None,
    name: Optional[str] = None,
) -> Tuple[str, str]:
    """-> (kind, checkpoint path). Front door: detect the artifact format
    and dispatch."""
    ckpt = _load_pt(src)  # loaded ONCE; threaded into the converter
    if kind == "auto":
        kind = detect_kind(ckpt)
    if kind == "stage1":
        path = convert_stage1_checkpoint(
            src, out_dir, encoder_init, hf_config, name=name or "best",
            ckpt=ckpt)
    elif kind == "stage2":
        path = convert_stage2_checkpoint(
            src, out_dir, name=name or "stage2_binary_head_best", ckpt=ckpt)
    elif kind == "baseline":
        path = convert_baseline_checkpoint(
            src, out_dir, encoder_init, hf_config,
            name=name or "baseline_best", ckpt=ckpt)
    else:
        raise ValueError(f"unknown kind {kind!r}")
    return kind, path


# ----------------------------------------------- export (the inverse leg)
def _torch_compression_sd(comp_params: Mapping):
    """Our compression params -> the reference CompressionModule state
    dict (compression_module.py:30-32: mlp3.weight/bias)."""
    import torch

    proj = comp_params["proj"]
    return {
        "mlp3.weight": torch.from_numpy(
            np.ascontiguousarray(np.asarray(proj["kernel"], np.float32).T)),
        "mlp3.bias": torch.from_numpy(np.asarray(proj["bias"], np.float32)),
    }


def _torch_encoder_sd(enc_config, enc_params: Mapping, prefix: str = "model."):
    """Our encoder params -> the reference Wav2Vec2Encoder wrapper's state
    dict: the HF Wav2Vec2Model keys under the wrapper's `model.` attribute
    (reference: encoder.py:21), in the installed torch's weight-norm key
    layout, dtypes matching a freshly constructed model."""
    import torch
    from transformers import Wav2Vec2Model

    from .export_hf import export_hf_state_dict, hf_config_from

    template = Wav2Vec2Model(hf_config_from(enc_config)).state_dict()
    sd = export_hf_state_dict(enc_config, enc_params, template.keys())
    out = {}
    for k, v in sd.items():
        if k not in template:
            raise KeyError(f"exported key {k!r} not in Wav2Vec2Model "
                           "(transformers layout change?)")
        out[prefix + k] = torch.from_numpy(v).to(template[k].dtype)
    # untouched buffers/params the flax tree has no counterpart for
    # (e.g. masked_spec_embed when SpecAugment params were never created)
    for k, v in template.items():
        if prefix + k not in out:
            out[prefix + k] = v
    return out


def export_stage1_checkpoint(src_dir: str, out_pt: str,
                             name: str = "best") -> str:
    """Our stage-1 checkpoint -> a reference-format .pt the reference's
    own reload path consumes (extract_stage1_embeddings.py:94-163):
    {epoch, compression_state_dict, train_loss, dev_loss, config,
    [encoder_state_dict if finetuned]} (train_stage1.py:114-129)."""
    import torch

    from ..train import checkpoint as ckpt_mod
    from ..train.stage1 import Stage1Trainer

    trainer, state = Stage1Trainer.from_checkpoint(src_dir, name)
    sidecar = ckpt_mod.load_sidecar(src_dir, name)
    metrics = sidecar.get("metrics") or {}
    out = {
        "epoch": metrics.get("epoch", 0),
        "compression_state_dict": _torch_compression_sd(
            state.params["compression"]),
        "train_loss": metrics.get("train_loss"),
        "dev_loss": metrics.get("dev_loss"),
        "config": sidecar.get("config") or trainer.cfg.ckpt_config(),
    }
    if trainer.cfg.finetune_encoder:
        out["encoder_state_dict"] = _torch_encoder_sd(
            trainer.enc_config, state.params["encoder"])
    os.makedirs(os.path.dirname(os.path.abspath(out_pt)), exist_ok=True)
    torch.save(out, out_pt)
    return out_pt


def export_stage2_checkpoint(src_dir: str, out_pt: str,
                             name: str = "stage2_binary_head_best") -> str:
    """Our stage-2 head checkpoint -> the reference's head .pt
    (stage2_utils.py:186-207), loadable by
    generate_eval_score_file.load_stage2_head."""
    import torch

    from ..train import checkpoint as ckpt_mod

    params, sidecar = ckpt_mod.restore_checkpoint(src_dir, name)
    metrics = sidecar.get("metrics") or {}
    c = sidecar.get("config") or {}

    def t(x):
        return torch.from_numpy(
            np.ascontiguousarray(np.asarray(x, np.float32)))

    if "fc" in params:
        sd = {"fc.weight": t(np.asarray(params["fc"]["kernel"]).T),
              "fc.bias": t(params["fc"]["bias"])}
    elif "fc1" in params:
        sd = {"net.0.weight": t(np.asarray(params["fc1"]["kernel"]).T),
              "net.0.bias": t(params["fc1"]["bias"]),
              "net.3.weight": t(np.asarray(params["fc2"]["kernel"]).T),
              "net.3.bias": t(params["fc2"]["bias"])}
    else:
        raise ValueError(f"unrecognized stage-2 head params: {sorted(params)}")
    out = {
        "epoch": metrics.get("epoch", 0),
        "model_state_dict": sd,
        "train_loss": metrics.get("train_loss"),
        "dev_loss": metrics.get("dev_loss"),
        "dev_acc": metrics.get("dev_acc"),
        "dev_auc": metrics.get("dev_auc"),
        "dev_eer": metrics.get("dev_eer"),
        "config": c,
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_pt)), exist_ok=True)
    torch.save(out, out_pt)
    return out_pt


def export_baseline_checkpoint(src_dir: str, out_pt: str,
                               name: str = "baseline_best") -> str:
    """Our baseline checkpoint -> the reference's full-model .pt
    (baseline_train.py:392-417), loadable by
    eval_baseline_score_file.py:54-74's End2EndBCEModel."""
    import torch

    from ..train import checkpoint as ckpt_mod
    from ..train.baseline import BaselineTrainer

    trainer, state = BaselineTrainer.from_checkpoint(src_dir, name)
    sidecar = ckpt_mod.load_sidecar(src_dir, name)
    metrics = sidecar.get("metrics") or {}
    enc_params = state.params.get("encoder") or state.frozen["encoder"]
    sd = _torch_encoder_sd(trainer.enc_config, enc_params,
                           prefix="encoder.model.")
    for k, v in _torch_compression_sd(state.params["compression"]).items():
        sd[f"compression.{k}"] = v
    cls = state.params["classifier"]
    sd["classifier.weight"] = torch.from_numpy(
        np.ascontiguousarray(np.asarray(cls["kernel"], np.float32).T))
    sd["classifier.bias"] = torch.from_numpy(
        np.asarray(cls["bias"], np.float32))
    out = {
        "epoch": metrics.get("epoch", 0),
        "model_state_dict": sd,
        "best_eer": metrics.get("best_eer"),
        "train_loss": metrics.get("train_loss"),
        "dev_loss": metrics.get("dev_loss"),
        "config": sidecar.get("config") or trainer.cfg.ckpt_config(),
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_pt)), exist_ok=True)
    torch.save(out, out_pt)
    return out_pt


def export_reference_checkpoint(src_dir: str, out_pt: str,
                                kind: str = "auto",
                                name: Optional[str] = None
                                ) -> Tuple[str, str]:
    """-> (kind, .pt path). Inverse of convert_reference_checkpoint: our
    trained checkpoints back to the reference's .pt formats, so models
    trained here remain consumable by the reference's scripts."""
    from ..train import checkpoint as ckpt_mod

    if kind == "auto":
        if name is not None:
            raise ValueError("--name requires an explicit --kind")
        for k, default in (("stage1", "best"),
                           ("stage2", "stage2_binary_head_best"),
                           ("baseline", "baseline_best")):
            if ckpt_mod.checkpoint_exists(src_dir, default):
                kind = k
                break
        else:
            raise FileNotFoundError(
                f"no best/stage2_binary_head_best/baseline_best "
                f"checkpoint under {src_dir}")
    fn = {"stage1": export_stage1_checkpoint,
          "stage2": export_stage2_checkpoint,
          "baseline": export_baseline_checkpoint}.get(kind)
    if fn is None:
        raise ValueError(f"unknown kind {kind!r}")
    defaults = {"stage1": "best", "stage2": "stage2_binary_head_best",
                "baseline": "baseline_best"}
    return kind, fn(src_dir, out_pt, name=name or defaults[kind])
