"""End-to-end BCE baseline training CLI (reference: baseline_train.py)."""

from __future__ import annotations

import argparse

from ..config import BaselineConfig
from ..data import BatchPipeline, RawBoostParams
from ..losses import pos_weight_from_labels
from ..train import BaselineTrainer
from ..utils import set_seed
from .common import add_asv_paths, add_encoder_args, asv_dataset, build_encoder, save_dir_for


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_encoder_args(p)
    add_asv_paths(p)
    from ..utils.distributed import add_multihost_arg

    add_multihost_arg(p)
    p.add_argument("--save_dir", type=str, default="checkpoints_baseline/run")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--head_lr", type=float, default=5e-3)
    p.add_argument("--enc_lr", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=3e-3)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--use_rawboost", type=int, default=1, choices=[0, 1])
    p.add_argument("--rawboost_prob", type=float, default=0.7)
    p.add_argument("--rawboost_mode", type=str, default="device",
                   choices=["device", "host", "off"])
    p.add_argument("--finetune_encoder", type=int, default=1, choices=[0, 1])
    p.add_argument("--remat_encoder", type=int, default=1, choices=[0, 1])
    p.add_argument("--use_pos_weight", type=int, default=1, choices=[0, 1])
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--max_duration_seconds", type=int, default=5)
    p.add_argument("--wire_dtype", type=str, default="float32",
                   choices=["float32", "int16"],
                   help="waveform H2D wire format (int16 halves input "
                        "bandwidth; ops/wire.py)")
    p.add_argument("--resume", action="store_true",
                   help="continue from <save_dir>/baseline_latest (incl. "
                        "mid-epoch preemption saves)")
    p.add_argument("--cache_waveforms", type=str, default=None,
                   help="decode-once waveform cache directory "
                        "(data/cache.py)")
    p.add_argument("--cache_dtype", type=str, default="int16",
                   choices=["int16", "float32"])
    args = p.parse_args(argv)

    from ..utils.distributed import init_from_args

    init_from_args(args)
    set_seed(args.seed)
    enc_config, enc_params = build_encoder(args.model_name, args.encoder_init)
    cfg = BaselineConfig(
        # compression input dim follows the encoder architecture
        input_dim=enc_config.hidden_size,
        hidden_dim=args.hidden_dim,
        max_duration_seconds=args.max_duration_seconds,
        model_name=args.model_name, epochs=args.epochs,
        batch_size=args.batch_size, num_samples=args.num_samples,
        head_lr=args.head_lr, enc_lr=args.enc_lr,
        weight_decay=args.weight_decay, seed=args.seed,
        patience=args.patience, use_rawboost=bool(args.use_rawboost),
        rawboost_prob=args.rawboost_prob, rawboost_mode=args.rawboost_mode,
        finetune_encoder=bool(args.finetune_encoder),
        remat_encoder=bool(args.remat_encoder),
        use_pos_weight=bool(args.use_pos_weight),
        wire_dtype=args.wire_dtype,
    )
    save_dir = save_dir_for(args.save_dir, cfg.model_name)

    train_ds = asv_dataset(args.train_root, args.train_protocol,
                           cfg.num_samples, seconds=cfg.max_duration_seconds)
    dev_ds = asv_dataset(args.dev_root, args.dev_protocol, cfg.num_samples,
                         seconds=cfg.max_duration_seconds)
    if args.cache_waveforms:
        import os as _os

        from ..data.cache import attach_cache

        attach_cache(train_ds, _os.path.join(args.cache_waveforms, "train"),
                     dtype=args.cache_dtype, num_workers=args.num_workers)
        attach_cache(dev_ds, _os.path.join(args.cache_waveforms, "dev"),
                     dtype=args.cache_dtype, num_workers=args.num_workers)
    pos_weight = pos_weight_from_labels(train_ds.labels)
    print(f"pos_weight (neg/pos) = {pos_weight:.4f}")

    trainer = BaselineTrainer(cfg, enc_config=enc_config,
                              enc_params=enc_params, pos_weight=pos_weight)
    start_epoch = 1
    skip_steps = 0
    best_eer = float("inf")
    epochs_no_improve = 0
    if args.resume:
        from ..train.checkpoint import (checkpoint_exists, load_sidecar,
                                        resume_cursor)

        if checkpoint_exists(save_dir, "baseline_latest"):
            state = trainer.restore(save_dir, "baseline_latest")
            m = load_sidecar(save_dir, "baseline_latest")["metrics"]
            best_eer = float(m.get("best_eer", float("inf")))
            epochs_no_improve = int(m.get("epochs_no_improve", 0))
            start_epoch, skip_steps = resume_cursor(m)
            print(f"[RESUME] continuing from epoch {start_epoch}"
                  + (f" batch {skip_steps}" if skip_steps else ""))
        else:
            print("[RESUME] no 'baseline_latest' checkpoint found; "
                  "starting fresh")
            state = trainer.init_state()
    else:
        state = trainer.init_state()

    rawboost = (
        RawBoostParams(sample_rate=cfg.target_sample_rate, prob=cfg.rawboost_prob)
        if cfg.use_rawboost and cfg.rawboost_mode == "host" else None
    )
    # balanced train loader, natural-distribution dev
    # (reference: baseline_train.py:323-340)
    train_pipe = BatchPipeline(
        train_ds, cfg.batch_size, seed=cfg.seed, num_workers=args.num_workers,
        rawboost=rawboost, rawboost_prob=cfg.rawboost_prob,
    )
    dev_pipe = BatchPipeline(dev_ds, cfg.batch_size, num_workers=args.num_workers)
    from ..utils.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
        _, history = trainer.fit(
            state, train_pipe, dev_pipe, save_dir=save_dir,
            preemption=guard, start_epoch=start_epoch,
            skip_steps=skip_steps, best_eer=best_eer,
            epochs_no_improve=epochs_no_improve)
    if history.get("preempted"):
        print(f"==> Baseline training PREEMPTED; state saved in {save_dir} "
              f"(rerun with --resume)")
        raise SystemExit(75)  # EX_TEMPFAIL — callers must not continue
    print(f"==> Baseline training complete. Checkpoints in {save_dir}")


if __name__ == "__main__":
    main()
