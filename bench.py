"""Benchmark: stage-1 SupCon training throughput on the flagship config.

Measures clips/sec/chip for the reference's published sweep configuration —
XLS-R-300m (315M params), batch 32, 5 s clips, RawBoost on (fused on-device
here) — the exact workload whose A40 throughput BASELINE.md derives as
~20-30 clips/s (train_stage1.sbatch:71-80, ~13.1 h pipeline).

Modes:
  default / --mode finetune : finetune_encoder=1 (the published sweep)
  --mode frozen             : frozen encoder (the reference's config DEFAULT,
                              stage1_config.py:30) — second tracked figure
  --attention {xla,pallas}  : attention implementation under test
                              (adjudication: VERDICT r1 weak #3)

The TPU execution knobs (remat='dots', scan_unroll=24, murmur dropout) are
the Stage1Config DEFAULTS since round 2 — what bench measures is what every
preset/CLI run gets.

vs_baseline uses the A40 upper bound (30 clips/s), i.e. the strictest
comparison.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

A40_BASELINE_CLIPS_PER_SEC = 30.0  # BASELINE.md derived upper bound


def main(argv=None) -> None:
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["finetune", "frozen"], default="finetune")
    ap.add_argument("--attention", choices=["xla", "pallas"], default="xla")
    ap.add_argument("--remat", choices=["default", "off", "full", "dots",
                                        "dots_all", "dots_ffact", "dots_all_ffact"],
                    default="default")
    ap.add_argument("--fused_qkv", action="store_true")
    # None -> inherit the Stage1Config default (what every CLI run gets)
    ap.add_argument("--softmax_dtype", choices=["float32", "bfloat16"],
                    default=None)
    ap.add_argument("--layer_mean_dtype", choices=["float32", "bfloat16"],
                    default=None)
    ap.add_argument("--adam_mu_dtype", choices=["float32", "bfloat16"],
                    default=None)
    ap.add_argument("--grad_dtype", choices=["float32", "bfloat16"],
                    default=None)
    ap.add_argument("--adam_nu_dtype", choices=["float32", "bfloat16"],
                    default=None)
    ap.add_argument("--attention_layout", choices=["bhqk", "bqhk"],
                    default=None)
    ap.add_argument("--freeze_fx", action="store_true",
                    help="freeze the conv feature extractor (HF practice; "
                         "the reference trains it — non-default)")
    ap.add_argument("--fir", choices=["direct", "fft"], default=None,
                    help="device RawBoost FIR algorithm")
    ap.add_argument("--conv_ln", choices=["xla", "pallas"], default=None,
                    help="conv-extractor LayerNorm implementation")
    ap.add_argument("--scan_unroll", type=int, default=None,
                    help="encoder layer-scan unroll factor (default 24)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--remat_conv", action="store_true",
                    help="recompute conv-extractor activations in the bwd "
                         "(frees the ~2G HBM margin the bs=64 row needs)")
    ap.add_argument("--batch_size", type=int, default=32,
                    help="32 = the reference parity recipe; other values "
                         "are capability rows (e.g. 64 probes whether bs=32 "
                         "is the binding throughput constraint)")
    args = ap.parse_args(argv)

    import jax  # noqa: F401  (backend selected before any device use)

    from wav2vec_contr_loss_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    import jax.numpy as jnp

    from wav2vec_contr_loss_tpu.config import Stage1Config
    from wav2vec_contr_loss_tpu.models.wav2vec2 import XLSR_300M
    from wav2vec_contr_loss_tpu.train import Stage1Trainer

    batch_size = args.batch_size
    cfg = Stage1Config(
        batch_size=batch_size,
        finetune_encoder=(args.mode == "finetune"),
        use_rawboost=True,
        rawboost_mode="device",
        rawboost_prob=0.7,
        temperature=0.07,
        compute_dtype="bfloat16",
        attention_impl=args.attention,
        fused_qkv=args.fused_qkv,
        # remat='dots', scan_unroll=24, murmur dropout, bf16 softmax domain:
        # Stage1Config defaults
        **{k: v for k, v in
           (("softmax_dtype", args.softmax_dtype),
            ("layer_mean_dtype", args.layer_mean_dtype),
            ("adam_mu_dtype", args.adam_mu_dtype),
            ("adam_nu_dtype", args.adam_nu_dtype),
            ("grad_dtype", args.grad_dtype),
            ("attention_layout", args.attention_layout),
            ("rawboost_fir_impl", args.fir),
            ("conv_ln_impl", args.conv_ln),
            ("scan_unroll", args.scan_unroll)) if v is not None},
    )
    if args.freeze_fx:
        cfg = cfg.replace(freeze_feature_extractor=True)
    if args.remat_conv:
        cfg = cfg.replace(remat_conv=True)
    if args.remat == "off":
        cfg = cfg.replace(remat_encoder=False)
    elif args.remat != "default":
        cfg = cfg.replace(remat_encoder=True, remat_policy=args.remat)
    trainer = Stage1Trainer(cfg, enc_config=XLSR_300M)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    t = cfg.max_duration_seconds * cfg.target_sample_rate
    wave = rng.normal(0, 0.2, (batch_size, t)).astype(np.float32)
    wave[:, 60000:] = 0.0  # realistic zero-padding tail
    labels = np.array([1, 0] * (batch_size // 2), np.int32)
    batch = {
        "waveforms": jnp.asarray(wave),
        "labels": jnp.asarray(labels),
        "multi_labels": jnp.asarray(labels),
    }
    alpha = jnp.zeros((), jnp.float32)

    # warmup / compile. NOTE: force a real host fetch — on the remote axon
    # backend block_until_ready can return before execution completes, so
    # float() (a device->host value transfer) is the only reliable sync.
    # The axon remote-compile service is occasionally flaky (HTTP 500 /
    # broken pipe); retry the first compile a couple of times.
    last_err = None
    for attempt in range(3):
        try:
            state, metrics = trainer.train_step(state, dict(batch), alpha)
            warm_loss = float(metrics["loss"])
            last_err = None
            break
        except Exception as e:  # pragma: no cover - service flakiness
            last_err = e
            time.sleep(10)
    if last_err is not None:
        raise last_err
    assert np.isfinite(warm_loss), f"warmup loss {warm_loss}"

    n_steps = args.steps
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = trainer.train_step(state, dict(batch), alpha)
    final_loss = float(metrics["loss"])  # forces the whole chained sequence
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    n_chips = jax.device_count()
    clips_per_sec = n_steps * batch_size / dt
    value = clips_per_sec / n_chips
    metric = f"stage1_supcon_{args.mode}_train_throughput"
    suffix = "" if args.attention == "xla" else f"_attn_{args.attention}"
    if batch_size != 32:
        suffix += f"_bs{batch_size}"
    print(json.dumps({
        "metric": metric + suffix,
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(value / A40_BASELINE_CLIPS_PER_SEC, 3),
    }))


def _maybe_reexec_on_backend_failure(e: Exception) -> None:
    """Transient axon-service outages surface as 'Unable to initialize
    backend' / 'Unavailable' at startup and poison the whole process
    (JAX backend state is global) — a in-process retry cannot recover.
    Re-exec this script up to 2 extra times with a backoff so a brief
    service blip doesn't record a 0-valued bench row."""
    import os

    msg = str(e)
    transient = ("Unable to initialize backend" in msg
                 or "UNAVAILABLE" in msg or "Unavailable" in msg)
    attempt = int(os.environ.get("W2V_BENCH_ATTEMPT", "0"))
    if transient and attempt < 2:
        print(f"[bench] backend init failed (attempt {attempt + 1}): {e}; "
              f"re-exec in 120 s", file=sys.stderr)
        time.sleep(120)
        os.environ["W2V_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # emit a parseable failure record
        _maybe_reexec_on_backend_failure(e)  # only returns if not retrying
        print(json.dumps({
            "metric": "stage1_supcon_finetune_train_throughput",
            "value": 0.0,
            "unit": "clips/sec/chip",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }))
        sys.exit(1)
