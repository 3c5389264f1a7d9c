"""Stage-1 SupCon training CLI (reference: train_stage1.py + its config).

Also covers the reference's standalone variants via flags:
  --loss_mode multiclass      <- train_multiclass_con.py
  --features_dir ...          <- train_stage1_from_emb.py (precomputed
                                 (N, F, 250) features, no audio/encoder)
  --preset supcon_temp_0.07   <- the published sweep presets (BASELINE.md)
"""

from __future__ import annotations

import argparse

from ..config import EXPERIMENT_PRESETS, Stage1Config, preset
from ..data import BatchPipeline, RawBoostParams
from ..train import Stage1Trainer
from ..utils import set_seed
from .common import add_asv_paths, add_encoder_args, asv_dataset, build_encoder, save_dir_for


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_encoder_args(p)
    add_asv_paths(p)
    p.add_argument("--save_dir", type=str, default="checkpoints_stage1/run")
    p.add_argument("--preset", type=str, default=None,
                   choices=sorted(EXPERIMENT_PRESETS))
    p.add_argument("--supcon_similarity", type=str, default=None,
                   choices=["cosine", "geodesic"])
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--uniformity_weight", type=float, default=None)
    p.add_argument("--uniformity_t", type=float, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--num_samples", type=str, default=None)
    p.add_argument("--head_lr", type=float, default=None)
    p.add_argument("--enc_lr", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--topk_neg", type=int, default=None)
    p.add_argument("--warmup_epochs", type=int, default=None)
    p.add_argument("--alpha_end", type=float, default=None)
    p.add_argument("--alpha_ramp_epochs", type=int, default=None)
    p.add_argument("--use_rawboost", type=int, default=None, choices=[0, 1])
    p.add_argument("--rawboost_prob", type=float, default=None)
    p.add_argument("--rawboost_mode", type=str, default=None,
                   choices=["device", "host", "off"])
    p.add_argument("--finetune_encoder", type=int, default=None, choices=[0, 1])
    p.add_argument("--remat_encoder", type=int, default=None, choices=[0, 1])
    p.add_argument("--freeze_feature_extractor", type=int, default=None,
                   choices=[0, 1],
                   help="freeze the conv feature extractor while finetuning "
                        "the transformer (HF freeze_feature_encoder() "
                        "practice; the reference trains it — default 0)")
    p.add_argument("--rawboost_fir_impl", type=str, default=None,
                   choices=["direct", "fft"])
    p.add_argument("--rawboost_isd_mode", type=str, default=None,
                   choices=["exact", "bernoulli"],
                   help="device ISD noise-position selection: 'exact' = "
                        "floor(T*beta/100) random positions (reference "
                        "semantics); 'bernoulli' = i.i.d. approximation")
    p.add_argument("--attention_layout", type=str, default=None,
                   choices=["bhqk", "bqhk"])
    p.add_argument("--conv_ln_impl", type=str, default=None,
                   choices=["xla", "pallas"])
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--loss_mode", type=str, default="binary",
                   choices=["binary", "multiclass"])
    p.add_argument("--features_dir", type=str, default=None,
                   help="train on precomputed features instead of audio")
    p.add_argument("--max_duration_seconds", type=int, default=None)
    p.add_argument("--hidden_dim", type=int, default=None)
    p.add_argument("--input_dim", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="continue from the 'latest' checkpoint in save_dir "
                        "(full train state incl. optimizer + PRNG)")
    p.add_argument("--cache_waveforms", type=str, default=None,
                   help="decode-once waveform cache directory: first run "
                        "decodes the corpus into a memmap, later epochs/"
                        "runs read rows instead of decoding (data/cache.py)")
    p.add_argument("--cache_dtype", type=str, default="int16",
                   choices=["int16", "float32"],
                   help="cache storage dtype (int16: exact for PCM "
                        "sources, half the disk; float32: bit-exact)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans — the functional-purity "
                        "equivalent of a sanitizer (SURVEY.md §5)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of train steps 2-5 "
                        "into this directory (TensorBoard/Perfetto xplane)")
    from ..utils.distributed import add_multihost_arg

    add_multihost_arg(p)
    p.add_argument("--param_sharding", type=str, default=None,
                   choices=["replicated", "fsdp", "pp"])
    p.add_argument("--pipeline_microbatches", type=int, default=None,
                   help="GPipe microbatches under --param_sharding pp "
                        "(parallel/pipeline.py)")
    p.add_argument("--sequence_parallel", type=int, default=None,
                   choices=[0, 1],
                   help="Megatron-style sequence parallelism: frame-shard "
                        "the encoder's residual stream over the 'model' "
                        "axis (needs --mesh_model > 1; composes with "
                        "TP/fsdp, excludes --param_sharding pp)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="mesh 'model'-axis size (devices per model group): "
                        ">1 enables tensor parallelism, or pipeline stages "
                        "under --param_sharding pp; remaining devices form "
                        "the 'data' axis")
    p.add_argument("--wire_dtype", type=str, default=None,
                   choices=["float32", "int16"],
                   help="waveform H2D wire format (int16 halves input "
                        "bandwidth; ops/wire.py)")
    p.add_argument("--grad_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="encoder weight-gradient dtype (bfloat16 halves "
                        "the dW band's HBM writes; fp32 Adam math)")
    return p


def config_from_args(args) -> Stage1Config:
    cfg = preset(args.preset) if args.preset else Stage1Config()
    overrides = {}
    for f in ("supcon_similarity", "temperature", "uniformity_weight",
              "uniformity_t", "epochs", "batch_size", "head_lr", "enc_lr",
              "weight_decay", "seed", "topk_neg", "warmup_epochs",
              "alpha_end", "alpha_ramp_epochs", "rawboost_prob",
              "rawboost_mode", "rawboost_fir_impl", "rawboost_isd_mode",
              "attention_layout",
              "conv_ln_impl", "param_sharding", "max_duration_seconds",
              "hidden_dim", "input_dim", "wire_dtype", "grad_dtype",
              "pipeline_microbatches"):
        v = getattr(args, f)
        if v is not None:
            overrides[f] = v
    for f in ("use_rawboost", "finetune_encoder", "remat_encoder",
              "freeze_feature_extractor", "sequence_parallel"):
        v = getattr(args, f)
        if v is not None:
            overrides[f] = bool(v)
    if args.num_samples is not None:
        ns = args.num_samples.strip().lower()
        # the reference accepts the literal string "None"
        # (stage1_config.py:179-183)
        overrides["num_samples"] = None if ns in ("none", "null") else int(ns)
    if args.model_name:
        overrides["model_name"] = args.model_name
    return cfg.replace(**overrides)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from ..utils.distributed import init_from_args

    init_from_args(args)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    cfg = config_from_args(args)
    set_seed(cfg.seed)
    save_dir = save_dir_for(args.save_dir, cfg.model_name)
    cfg.print_banner()

    if args.features_dir is not None:
        # precomputed-feature variant (reference: train_stage1_from_emb.py)
        import numpy as np

        trainer = Stage1Trainer(cfg, loss_mode=args.loss_mode,
                                from_features=True)
        state = trainer.init_state()
        fdir = args.features_dir
        feats = np.load(f"{fdir}/train_features.npy", mmap_mode="r")
        labels = np.load(f"{fdir}/train_feature_labels.npy")
        dev_feats = dev_labels = None
        try:
            dev_feats = np.load(f"{fdir}/dev_features.npy", mmap_mode="r")
            dev_labels = np.load(f"{fdir}/dev_feature_labels.npy")
        except FileNotFoundError:
            pass
        trainer.fit_from_features(state, feats, labels, dev_feats, dev_labels,
                                  save_dir=save_dir)
        print(f"==> Stage-1 (from features) complete. Checkpoints in {save_dir}")
        return

    enc_config, enc_params = build_encoder(cfg.model_name, args.encoder_init)
    if args.input_dim is None and cfg.input_dim != enc_config.hidden_size:
        # compression input dim follows the encoder architecture
        cfg = cfg.replace(input_dim=enc_config.hidden_size)
    mesh = None
    if getattr(args, "mesh_model", 1) > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(n_model=args.mesh_model)
    trainer = Stage1Trainer(
        cfg, enc_config=enc_config, enc_params=enc_params,
        loss_mode=args.loss_mode, mesh=mesh,
    )
    start_epoch = 1
    skip_steps = 0
    best_dev = float("inf")
    if args.resume:
        from ..train.checkpoint import (checkpoint_exists, load_sidecar,
                                        resume_cursor)

        if checkpoint_exists(save_dir, "latest"):
            state = trainer.restore(save_dir, "latest")
            m = load_sidecar(save_dir, "latest")["metrics"]
            best_dev = float(m.get("best_dev", float("inf")))
            start_epoch, skip_steps = resume_cursor(m)
            print(f"[RESUME] continuing from epoch {start_epoch}"
                  + (f" batch {skip_steps}" if skip_steps else ""))
        else:
            print("[RESUME] no 'latest' checkpoint found; starting fresh")
            state = trainer.init_state()
    else:
        state = trainer.init_state()

    rawboost = (
        RawBoostParams(sample_rate=cfg.target_sample_rate, prob=cfg.rawboost_prob)
        if cfg.use_rawboost and cfg.rawboost_mode == "host" else None
    )
    train_ds = asv_dataset(args.train_root, args.train_protocol,
                           cfg.num_samples, seconds=cfg.max_duration_seconds)
    if args.cache_waveforms:
        import os as _os

        from ..data.cache import attach_cache

        attach_cache(train_ds, _os.path.join(args.cache_waveforms, "train"),
                     dtype=args.cache_dtype, num_workers=args.num_workers)
    train_pipe = BatchPipeline(
        train_ds, cfg.batch_size, seed=cfg.seed, num_workers=args.num_workers,
        rawboost=rawboost, rawboost_prob=cfg.rawboost_prob,
    )
    dev_pipe = None
    if args.dev_protocol:
        dev_ds = asv_dataset(args.dev_root, args.dev_protocol, cfg.num_samples,
                             seconds=cfg.max_duration_seconds)
        if args.cache_waveforms:
            attach_cache(dev_ds, _os.path.join(args.cache_waveforms, "dev"),
                         dtype=args.cache_dtype,
                         num_workers=args.num_workers)
        # dev sampler seeded seed+1 like the reference (train_stage1.py)
        dev_pipe = BatchPipeline(dev_ds, cfg.batch_size, seed=cfg.seed + 1,
                                 num_workers=args.num_workers)

    from ..utils.preemption import PreemptionGuard

    # SIGTERM (scheduler/TPU-pod preemption) triggers a graceful mid-epoch
    # save instead of losing the run since the last epoch boundary
    with PreemptionGuard() as guard:
        _, history = trainer.fit(state, train_pipe, dev_pipe,
                                 save_dir=save_dir, start_epoch=start_epoch,
                                 skip_steps=skip_steps, best_dev=best_dev,
                                 preemption=guard,
                                 profile_dir=args.profile_dir)
    if history.get("preempted"):
        print(f"==> Stage-1 training PREEMPTED; state saved in {save_dir} "
              f"(rerun with --resume)")
        # EX_TEMPFAIL: distinct from success so callers (run_pipeline /
        # run_sweep / schedulers) never continue the chain — extraction,
        # stage-2 and scoring on a half-trained model — as if training
        # had finished
        raise SystemExit(75)
    print(f"==> Stage-1 training complete. Checkpoints in {save_dir}")


if __name__ == "__main__":
    main()
