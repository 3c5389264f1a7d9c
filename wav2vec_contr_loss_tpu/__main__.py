"""Single-entry dispatcher: `python -m wav2vec_contr_loss_tpu <command> ...`.

The reference drives every task through a separate top-level script
(train_stage1.py, extract_stage1_embeddings.py, ... — SURVEY.md §1 L6);
each has a CLI module under `cli/`. This dispatcher adds the one-binary
front door on top: `python -m wav2vec_contr_loss_tpu train_stage1 ...`
is exactly `python -m wav2vec_contr_loss_tpu.cli.train_stage1 ...`.

Commands are resolved lazily (importlib) so `--list`/no-args help never
pays the JAX/TPU registration cost.
"""

from __future__ import annotations

import importlib
import sys

# command -> (cli module, one-line help). Order is the help order.
COMMANDS = {
    "train_stage1": ("train_stage1", "stage-1 SupCon finetune/frozen training (reference train_stage1.py)"),
    "train_stage2": ("train_stage2", "stage-2 head training on extracted embeddings"),
    "train_baseline": ("train_baseline", "end-to-end BCE baseline training"),
    "extract_embeddings": ("extract_embeddings", "stage-1 clip embeddings -> .npy"),
    "extract_encoder_features": ("extract_encoder_features", "raw encoder layer-mean features -> memmap .npy"),
    "generate_scores": ("generate_scores", "stage-2 scores over saved embeddings -> CM score file"),
    "score_baseline": ("score_baseline", "baseline model scores from audio -> CM score file"),
    "score_famous_figures": ("score_famous_figures", "FamousFigures end-to-end scoring"),
    "eval_scores": ("eval_scores", "EER / min-tDCF from score files"),
    "plot_umap": ("plot_umap", "UMAP plots of stage-1 / subspace embeddings"),
    "run_pipeline": ("run_pipeline", "full experiment chain: train -> extract -> stage-2 -> score -> EER"),
    "run_sweep": ("run_sweep", "preset sweep runner"),
    "serve": ("serve", "streaming scoring daemon (paths on stdin -> scores on stdout)"),
    "export_serving": ("export_serving", "self-contained serving artifact via jax.export"),
    "convert_hf_checkpoint": ("convert_hf_checkpoint", "offline HF wav2vec2 checkpoint -> Orbax params"),
    "convert_reference_checkpoint": ("convert_reference_checkpoint", "reference-trained .pt (stage-1/stage-2/baseline) -> framework checkpoints"),
    "export_reference_checkpoint": ("export_reference_checkpoint", "trained checkpoint -> reference-format .pt (stage-1/stage-2/baseline)"),
    "export_hf_checkpoint": ("export_hf_checkpoint", "trained encoder -> HF/torch checkpoint directory"),
    "verify_parity": ("verify_parity", "acceptance harness vs the reference's committed score files"),
    "bench_components": ("bench_components", "on-chip component benchmarks (serving/extract/...)"),
    "cache_waveforms": ("cache_waveforms", "prebuild the decode-once waveform cache for a protocol"),
    "doctor": ("doctor", "environment self-check (devices, decoder, jit, checkpointing)"),
}


def _usage() -> str:
    width = max(len(c) for c in COMMANDS)
    lines = [f"  {c:<{width}}  {h}" for c, (_, h) in COMMANDS.items()]
    return (
        "usage: python -m wav2vec_contr_loss_tpu <command> [args...]\n\n"
        "commands:\n" + "\n".join(lines) + "\n\n"
        "`<command> --help` shows that command's flags. Each command is also\n"
        "directly invocable as `python -m wav2vec_contr_loss_tpu.cli.<command>`."
    )


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "--list"):
        print(_usage())
        return
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd!r}\n\n{_usage()}", file=sys.stderr)
        raise SystemExit(2)
    # every command gets the persistent compile cache: on the axon
    # remote-compile service a cold train/serve program costs 10-45 min,
    # a cached one seconds — bench.py always had this, user CLIs must too
    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    mod = importlib.import_module(f"{__package__}.cli.{COMMANDS[cmd][0]}")
    mod.main(argv[1:])


if __name__ == "__main__":
    main()
