"""Configuration tree: one dataclass hierarchy + the published experiment
presets.

Replaces the reference's scattered module-constant + argparse configs
(reference: stage1_config.py:8-42/45-220, stage2_config.py:8-28, inline
CONFIG blocks in baseline_train.py:23-57). The printed banner keeps the
reference's KEY=value format so logs diff cleanly (stage1_config.py:223-258),
and `ckpt_config` emits the same UPPERCASE dict that the reference embeds in
checkpoints as the reload contract (stage1_config.py:261-283).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional

__all__ = [
    "DataPaths",
    "Stage1Config",
    "Stage2Config",
    "BaselineConfig",
    "EXPERIMENT_PRESETS",
    "preset",
    "run_tag",
    "dropout0_probe",
]


def run_tag(model_name: str) -> str:
    """HF model id -> filesystem-safe run tag (reference:
    stage1_config.py:185-186)."""
    return model_name.replace("/", "__")


@dataclass(frozen=True)
class DataPaths:
    train_root: str = ""
    train_protocol: str = ""
    dev_root: str = ""
    dev_protocol: str = ""
    eval_root: str = ""
    eval_protocol: str = ""
    itw_root: str = ""
    itw_protocol: str = ""
    save_dir: str = "checkpoints"
    emb_dir: str = "embeddings"
    scores_dir: str = "scores"


@dataclass(frozen=True)
class Stage1Config:
    """Stage-1 SupCon embedding training (reference: stage1_config.py)."""

    model_name: str = "facebook/wav2vec2-xls-r-300m"
    target_sample_rate: int = 16000
    max_duration_seconds: int = 5
    input_dim: int = 1024
    hidden_dim: int = 256
    dropout: float = 0.1

    epochs: int = 100
    batch_size: int = 32
    num_samples: Optional[int] = None
    head_lr: float = 5e-3
    enc_lr: float = 1e-5
    weight_decay: float = 3e-3
    seed: int = 1337
    finetune_encoder: bool = False
    grad_clip: float = 5.0              # on head params only (stage1_utils.py:129)

    temperature: float = 0.2
    supcon_similarity: str = "cosine"   # 'cosine' | 'geodesic'
    uniformity_weight: float = 0.0
    uniformity_t: float = 2.0
    topk_neg: int = 15
    warmup_epochs: int = 100
    alpha_end: float = 1.0
    alpha_ramp_epochs: int = 80

    use_rawboost: bool = True
    rawboost_prob: float = 0.7
    rawboost_mode: str = "device"       # 'device' (fused) | 'host' (faithful) | 'off'
    # device FIR algorithm. 'fft' computes the same linear convolution via
    # padded rfft/irfft — measured 149.2 vs 148.1 clips/s/chip at the
    # finetune recipe (r2); rounding vs 'direct' is ~1e-6 relative (fp32
    # FFT), far below the augmentation's own noise floors. 'direct'
    # restores the scipy-identical convolution order in one flag.
    rawboost_fir_impl: str = "fft"
    # device ISD noise-position selection: 'exact' = exactly
    # floor(T*beta/100) random positions (the reference semantics,
    # RawBoost.py:78-79; r5 default). The adopted 16-step bitwise
    # threshold search measured 155.4 vs 155.7 clips/s/chip at the
    # bs=32 finetune recipe — free to noise (naive argsort+scatter
    # cost -9.0%, sort-based forms -3.3%/-1.7%). 'bernoulli' keeps the
    # r1-r4 i.i.d. approximation as a fallback flag.
    rawboost_isd_mode: str = "exact"

    compute_dtype: str = "bfloat16"     # encoder matmul dtype; loss is fp32
    # TPU execution knobs. The defaults below ARE the measured-good recipe
    # from the benchmark (fits the bs=32 XLS-R finetune in one v5e's HBM at
    # 130+ clips/s/chip) so `cli.run_pipeline --exp_name ...` hits
    # bench-class throughput without hand flags. They are numerically
    # neutral: remat/unroll only change scheduling, never values.
    # Waveform host->device wire format. 'int16' halves H2D bytes (audio
    # is 16-bit PCM at the source; exact round trip when unresampled,
    # <=-96 dB re-quantization otherwise — ops/wire.py). Non-default:
    # 'float32' is the reference's representation end-to-end.
    wire_dtype: str = "float32"
    remat_encoder: bool = True          # rematerialize encoder layers in bwd
    remat_policy: str = "dots"          # 'full' | 'dots' (keep matmul outputs)
    remat_conv: bool = False            # recompute conv-extractor activations
                                        # in bwd (needed for bs>=64 finetune)
    scan_unroll: int = 24               # encoder layer-scan unroll factor
    fused_qkv: bool = False             # one (D,3D) qkv matmul per layer
    attention_impl: str = "xla"         # 'xla' | 'pallas' (fused VMEM attn)
    # 'murmur' (counter-hash bits, +29% finetune throughput) | 'threefry'
    # (jax.random). Same Bernoulli semantics, different random stream —
    # dropout parity vs the torch reference is statistical either way.
    dropout_impl: str = "murmur"
    supcon_impl: str = "xla"            # 'xla' | 'pallas' (fused kernel)
    # attention score/softmax domain. 'bfloat16' halves the (B,H,T,T) HBM
    # traffic in fwd and in the remat recompute — measured 145.5 vs 132.0
    # clips/s/chip at the bs=32 finetune recipe (r2 sweep), with ~1e-3
    # relative drift on attention probs (PARITY.md §deviations). 'float32'
    # restores the reference's exact softmax domain in one flag.
    softmax_dtype: str = "bfloat16"
    # K=25 layer-mean accumulator domain: 'float32' (exact) | 'bfloat16'
    # (measured throughput-neutral at the recipe — kept fp32)
    layer_mean_dtype: str = "float32"
    # attention score layout: 'bhqk' (head-major) | 'bqhk' (time-major —
    # avoids XLA relayout copies around the score matmuls). Identical
    # values either way.
    attention_layout: str = "bhqk"
    # Freeze the conv feature extractor while finetuning the transformer
    # (standard HF practice; skips the conv backward). The reference's
    # freeze is all-or-nothing (encoder.py:24-26) — parity default False.
    freeze_feature_extractor: bool = False
    # conv-extractor LayerNorm impl: 'xla' | 'pallas' (fused LN+GELU)
    conv_ln_impl: str = "xla"
    # Parameter/optimizer-state layout over the mesh: 'replicated'
    # (XLS-R-300m fits per chip) | 'fsdp' (ZeRO-3: stacked layer params +
    # Adam state sharded along 'data'; XLA all-gathers per layer and
    # reduce-scatters grads — for bigger encoders / smaller chips) | 'pp'
    # (pipeline parallelism: the layer stack splits into mesh-'model'-many
    # contiguous stages, microbatches flow over ICI via ppermute, params +
    # Adam state shard per stage — parallel/pipeline.py; composes with dp
    # on the 'data' axis, mutually exclusive with tensor parallelism)
    param_sharding: str = "replicated"
    # GPipe microbatches per step under param_sharding='pp' (batch_size
    # must divide; more microbatches shrink the (S-1)/(M+S-1) bubble)
    pipeline_microbatches: int = 2
    # Megatron-style sequence parallelism: shard the encoder's (B, T', D)
    # residual stream over the mesh ('data', 'model') axes so LN/dropout/
    # residual regions run on T/n_model frames per chip and each block's
    # tensor-parallel all-reduce becomes reduce-scatter + all-gather.
    # Composes with tensor parallelism and param_sharding='fsdp';
    # mutually exclusive with 'pp'; no-op at n_model=1
    # (models/wav2vec2.py `sequence_parallel`).
    sequence_parallel: bool = False
    # AdamW first-moment storage. 'bfloat16' halves mu traffic/residency
    # (~1.3 GB less HBM per step for the 315M-param encoder) — measured
    # 148.1 vs 145.8 clips/s/chip at the bs=32 finetune recipe (r2 sweep).
    # The second moment stays fp32 (its sqrt sets the step scale);
    # 'float32' restores the reference's exact AdamW numerics in one flag.
    adam_mu_dtype: str = "bfloat16"
    # AdamW second-moment storage. 'bfloat16' halves nu's ~1.26 GB fp32
    # footprint (frees ~630 MB of HBM residency + the matching traffic;
    # EMA/rsqrt math stays fp32 — see ops/adam_bf16nu.py
    # for the ~0.2%-on-step-scale error bound) and measured +0.9% on-chip
    # (149.2 -> 150.5 clips/s, r3); also the enabler (with remat_conv) for
    # bs=64 finetuning in one v5e's HBM. 'float32' restores the
    # reference's exact AdamW step-scale in one flag (PARITY.md deviation
    # #7).
    adam_nu_dtype: str = "bfloat16"
    # Weight-gradient dtype for the scan-stacked encoder matmul kernels.
    # 'bfloat16' differentiates w.r.t. the bf16-cast kernel tree, so the
    # dW matmuls (13.8% of the step, docs/PROFILE_r3.md) write bf16 —
    # halving their HBM output traffic and the optimizer's gradient reads
    # (and, under dp, the gradient all-reduce bytes on ICI). The forward
    # is BIT-IDENTICAL (kernels are cast to bf16 at use anyway; only the
    # storage point of the cast moves); the only deviation is bf16
    # rounding of dW before the fp32 Adam math (MXU still accumulates the
    # dW contraction in fp32) — same class as adam_mu/nu_dtype. Measured
    # +3.0% on-chip (150.8 -> 155.3 clips/s at the bs=32 finetune recipe,
    # r3) and ADOPTED: the default 'auto' resolves to bf16 dW exactly when
    # compute_dtype='bfloat16' (the recipe) and to f32 otherwise (fp32
    # compute consumes fp32 kernels — moving the cast there would change
    # the forward). 'float32' restores the reference-exact gradient dtype
    # in one flag (PARITY.md deviation #9); explicit 'bfloat16' with fp32
    # compute is refused.
    grad_dtype: str = "auto"

    def replace(self, **kw) -> "Stage1Config":
        return dataclasses.replace(self, **kw)

    def ckpt_config(self) -> Dict:
        return {
            "MODEL_NAME": self.model_name,
            "RUN_TAG": run_tag(self.model_name),
            "INPUT_DIM": self.input_dim,
            "HIDDEN_DIM": self.hidden_dim,
            "DROPOUT": self.dropout,
            "BATCH_SIZE": self.batch_size,
            "HEAD_LR": self.head_lr,
            "ENC_LR": self.enc_lr,
            "WEIGHT_DECAY": self.weight_decay,
            "TEMPERATURE": self.temperature,
            "TOPK_NEG": self.topk_neg,
            "WARMUP_EPOCHS": self.warmup_epochs,
            "ALPHA_END": self.alpha_end,
            "ALPHA_RAMP_EPOCHS": self.alpha_ramp_epochs,
            "USE_RAWBOOST": self.use_rawboost,
            "RAWBOOST_PROB": self.rawboost_prob,
            "UNIFORMITY_WEIGHT": self.uniformity_weight,
            "UNIFORMITY_T": self.uniformity_t,
            "SUPCON_SIMILARITY": self.supcon_similarity,
            "FINETUNE_ENCODER": self.finetune_encoder,
        }

    def print_banner(self, paths: Optional[DataPaths] = None,
                     world_size: int = 1, rank: int = 0) -> None:
        if rank != 0:
            return
        print("=== CONFIG ===")
        print(f"MODEL_NAME={self.model_name}")
        if paths is not None:
            print(f"SAVE_DIR={paths.save_dir}")
            print(f"TRAIN_ROOT={paths.train_root}")
            print(f"TRAIN_PROTOCOL={paths.train_protocol}")
            print(f"DEV_ROOT={paths.dev_root}")
            print(f"DEV_PROTOCOL={paths.dev_protocol}")
        print(f"TARGET_SAMPLE_RATE={self.target_sample_rate}")
        print(f"MAX_DURATION_SECONDS={self.max_duration_seconds}")
        print(f"INPUT_DIM={self.input_dim}")
        print(f"HIDDEN_DIM={self.hidden_dim}")
        print(f"DROPOUT={self.dropout}")
        print(f"EPOCHS={self.epochs}")
        print(f"BATCH_SIZE={self.batch_size}")
        print(f"NUM_SAMPLES={self.num_samples}")
        print(f"HEAD_LR={self.head_lr}")
        print(f"ENC_LR={self.enc_lr}")
        print(f"WEIGHT_DECAY={self.weight_decay}")
        print(f"TEMPERATURE={self.temperature}")
        print(f"SEED={self.seed}")
        print(f"UNIFORMITY_WEIGHT={self.uniformity_weight}")
        print(f"UNIFORMITY_T={self.uniformity_t}")
        print(f"SUPCON_SIMILARITY={self.supcon_similarity}")
        print(f"TOPK_NEG={self.topk_neg}")
        print(f"WARMUP_EPOCHS={self.warmup_epochs}")
        print(f"ALPHA_END={self.alpha_end}")
        print(f"ALPHA_RAMP_EPOCHS={self.alpha_ramp_epochs}")
        print(f"USE_RAWBOOST={self.use_rawboost}")
        print(f"RAWBOOST_PROB={self.rawboost_prob}")
        print(f"FINETUNE_ENCODER={self.finetune_encoder}")
        print(f"DISTRIBUTED={world_size > 1} | WORLD_SIZE={world_size} | RANK={rank}")
        print("=============")


@dataclass(frozen=True)
class Stage2Config:
    """Stage-2 classifier over extracted embeddings
    (reference: stage2_config.py:8-28)."""

    head_type: str = "linear"   # 'linear' | 'mlp'
    in_dim: int = 256
    hidden_dim: int = 128
    dropout: float = 0.2
    lr: float = 1e-4
    weight_decay: float = 1e-4
    epochs: int = 200
    batch_size: int = 64
    patience: int = 15
    # NOTE: the reference's LOG_EVERY (stage2_config.py:65, gating per-STEP
    # prints inside its epoch loop) has no equivalent here: the whole
    # stage-2 epoch runs as one fused lax.scan (train/stage2.py), so the
    # finest logging granularity is the epoch line. Knob dropped, not dead.
    seed: int = 1337

    def replace(self, **kw) -> "Stage2Config":
        return dataclasses.replace(self, **kw)

    def ckpt_config(self) -> Dict:
        return {
            "HEAD_TYPE": self.head_type,
            "IN_DIM": self.in_dim,
            "HIDDEN_DIM": self.hidden_dim,
            "DROPOUT": self.dropout,
            "LR": self.lr,
            "WEIGHT_DECAY": self.weight_decay,
            "BATCH_SIZE": self.batch_size,
            "PATIENCE": self.patience,
        }


@dataclass(frozen=True)
class BaselineConfig:
    """End-to-end BCE baseline (reference: baseline_train.py:23-57)."""

    wire_dtype: str = "float32"         # see Stage1Config.wire_dtype
    model_name: str = "facebook/wav2vec2-xls-r-300m"
    target_sample_rate: int = 16000
    max_duration_seconds: int = 5
    input_dim: int = 1024
    hidden_dim: int = 256
    dropout: float = 0.1

    epochs: int = 100
    batch_size: int = 32
    num_samples: Optional[int] = None
    head_lr: float = 5e-3
    enc_lr: float = 1e-5
    weight_decay: float = 3e-3
    seed: int = 1337
    finetune_encoder: bool = True
    grad_clip: float = 5.0              # on ALL params (baseline_train.py:203)
    patience: int = 10                  # early stop on dev EER

    use_rawboost: bool = True
    rawboost_prob: float = 0.7
    rawboost_mode: str = "device"
    use_pos_weight: bool = True

    compute_dtype: str = "bfloat16"     # the AMP equivalent; no GradScaler
    # same measured TPU recipe as Stage1Config (see its knob comments for
    # the measurements; each deviation restores with one flag)
    remat_encoder: bool = True
    remat_policy: str = "dots"
    scan_unroll: int = 24
    dropout_impl: str = "murmur"
    softmax_dtype: str = "bfloat16"
    adam_mu_dtype: str = "bfloat16"
    adam_nu_dtype: str = "bfloat16"   # same adoption as Stage1Config (r3)
    grad_dtype: str = "auto"          # same adoption as Stage1Config (r3)
    rawboost_fir_impl: str = "fft"
    rawboost_isd_mode: str = "exact"  # see Stage1Config (r5)
    param_sharding: str = "replicated"  # | 'fsdp' (see Stage1Config)

    def replace(self, **kw) -> "BaselineConfig":
        return dataclasses.replace(self, **kw)

    def ckpt_config(self) -> Dict:
        return {
            "MODEL_NAME": self.model_name,
            "RUN_TAG": run_tag(self.model_name),
            "INPUT_DIM": self.input_dim,
            "HIDDEN_DIM": self.hidden_dim,
            "DROPOUT": self.dropout,
            "BATCH_SIZE": self.batch_size,
            "HEAD_LR": self.head_lr,
            "ENC_LR": self.enc_lr,
            "WEIGHT_DECAY": self.weight_decay,
            "USE_RAWBOOST": self.use_rawboost,
            "RAWBOOST_PROB": self.rawboost_prob,
            "FINETUNE_ENCODER": self.finetune_encoder,
        }


# ---------------------------------------------------------------- presets
# The published sweep (see BASELINE.md; configured in train_stage1.sbatch:
# finetune, bs=32, 100 epochs, warmup 100 => alpha == 0).
_SWEEP = dict(finetune_encoder=True, batch_size=32, epochs=100,
              warmup_epochs=100)

EXPERIMENT_PRESETS: Dict[str, Stage1Config] = {
    "supcon": Stage1Config(**_SWEEP),
    "supcon_temp_0.05": Stage1Config(temperature=0.05, **_SWEEP),
    "supcon_temp_0.07": Stage1Config(temperature=0.07, **_SWEEP),
    "supcon_temp_0.07_batch_64": Stage1Config(
        temperature=0.07, finetune_encoder=True, batch_size=64, epochs=100,
        warmup_epochs=100,
    ),
    "supcon_temp_0.1": Stage1Config(temperature=0.1, **_SWEEP),
    "supcon_temp_0.6": Stage1Config(temperature=0.6, **_SWEEP),
    "supcon_geodesic": Stage1Config(supcon_similarity="geodesic", **_SWEEP),
    "supcon_geodesic_temp_0.05": Stage1Config(
        supcon_similarity="geodesic", temperature=0.05, **_SWEEP),
    "supcon_geodesic_temp_0.07": Stage1Config(
        supcon_similarity="geodesic", temperature=0.07, **_SWEEP),
    "supcon_geodesic_temp_0.1": Stage1Config(
        supcon_similarity="geodesic", temperature=0.1, **_SWEEP),
    "supcon_geodesic_temp_0.6": Stage1Config(
        supcon_similarity="geodesic", temperature=0.6, **_SWEEP),
    "supcon_uniformity": Stage1Config(uniformity_weight=0.2, **_SWEEP),
    "supcon_uniformity_weight_0.01": Stage1Config(uniformity_weight=0.01, **_SWEEP),
    "supcon_uniformity_weight_0.05": Stage1Config(uniformity_weight=0.05, **_SWEEP),
    "supcon_uniformity_weight_0.1": Stage1Config(uniformity_weight=0.1, **_SWEEP),
    "supcon_uniformity_weight_0.6": Stage1Config(uniformity_weight=0.6, **_SWEEP),
}


def preset(name: str) -> Stage1Config:
    if name not in EXPERIMENT_PRESETS:
        raise KeyError(
            f"unknown experiment preset {name!r}; "
            f"known: {sorted(EXPERIMENT_PRESETS)}"
        )
    return EXPERIMENT_PRESETS[name]


def dropout0_probe(cfg, enc_config):
    """Profiling probe (docs/PROFILE_r4.md): every dropout rate plus
    SpecAugment off, otherwise identical — the throughput delta vs the
    default recipe bounds the whole PRNG+mask+apply complex in one
    number. Shared by bench.py --dropout0 and tools/profile_step.py so
    the knob set cannot silently diverge. NOT a training config: the
    reference trains with dropout 0.1 + SpecAugment (parity)."""
    return (
        cfg.replace(dropout=0.0),
        enc_config.with_(
            hidden_dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, feat_proj_dropout=0.0,
            apply_spec_augment=False),
    )
