"""Capture + summarize a device profile of the stage-1 train step.

Runs the exact bench.py recipe (bs=32 XLS-R finetune, device RawBoost,
SupCon), times it, then records a jax.profiler trace of a few steps and
prints the top HLO ops by device self-time, aggregated from the xplane
proto. Guides kernel-level optimization (VERDICT r1 weak #6 / next #4).

Usage:
    python tools/profile_step.py [--steps 12] [--profile_steps 4]
                                 [--mode finetune] [--out /tmp/w2v_profile]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_xspace(path: str, top: int = 45) -> str:
    """Aggregate XEvent self-durations by op name on device planes."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    raw = open(path, "rb").read()
    try:
        raw = gzip.decompress(raw)
    except OSError:
        pass
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(raw)

    def first_word(name: str) -> str:
        """Collapse '%fusion.123 = bf16[...]{...:T(8,128)} fusion(...), ...'
        to a stable op-kind + shape key. NB: the layout annotation itself
        contains parens (tiling, e.g. T(8,128)), so split on whitespace
        first — the shape is always the first token after ' = '."""
        head = name.split(" = ", 1)
        if len(head) == 2:
            _, rhs = head
            toks = rhs.split(None, 1)
            shape = toks[0]
            kind = toks[1].split("(", 1)[0] if len(toks) > 1 else "?"
            return f"{kind} {shape}"[:120]
        return name[:120]

    out = []
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        out.append(f"=== plane: {plane.name}")
        for line in plane.lines:
            if not line.events:
                continue
            # busy time = union of [start, start+dur) intervals
            iv = sorted((ev.offset_ps, ev.offset_ps + ev.duration_ps)
                        for ev in line.events)
            busy, cur_s, cur_e = 0, iv[0][0], iv[0][1]
            for s, e in iv[1:]:
                if s > cur_e:
                    busy += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            busy += cur_e - cur_s
            span = iv[-1][1] - iv[0][0]
            out.append(f"-- line '{line.name}' ({len(line.events)} events, "
                       f"busy {busy / 1e9:.2f} ms / span {span / 1e9:.2f} ms)")
            total_by = collections.Counter()
            count_by = collections.Counter()
            tot = 0
            for ev in line.events:
                key = first_word(ev_meta.get(ev.metadata_id, str(ev.metadata_id)))
                total_by[key] += ev.duration_ps
                count_by[key] += 1
                tot += ev.duration_ps
            for name, ps in total_by.most_common(top):
                out.append(
                    f"  {ps / 1e9:10.3f} ms  x{count_by[name]:<5d} "
                    f"{ps / max(tot, 1) * 100:5.1f}%  {name}"
                )
            if line.name == "XLA Ops":
                # second view: top individual HLO instructions (op name =
                # lhs), to split e.g. optimizer updates from scan
                # grad-accumulation that share a result shape
                by_op = collections.Counter()
                n_op = collections.Counter()
                for ev in line.events:
                    full = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    lhs = full.split(" = ", 1)[0][:90]
                    by_op[lhs] += ev.duration_ps
                    n_op[lhs] += 1
                out.append("-- top individual ops")
                for name, ps in by_op.most_common(30):
                    out.append(
                        f"  {ps / 1e9:10.3f} ms  x{n_op[name]:<5d} "
                        f"{ps / max(tot, 1) * 100:5.1f}%  {name}"
                    )
    return "\n".join(out) if out else "(no device planes found in xspace)"


def _result_type(rhs: str) -> str:
    """The result-type portion of an HLO rhs: up to the balanced close
    paren for tuple types, else the first whitespace token (layout
    annotations like T(8,128)(2,1) contain parens but no spaces)."""
    if not rhs.startswith("("):
        return rhs.split(None, 1)[0]
    depth = 0
    for i, c in enumerate(rhs):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return rhs[: i + 1]
    return rhs


_BYTES = {"f64": 8, "u64": 8, "s64": 8, "f32": 4, "s32": 4, "u32": 4,
          "bf16": 2, "f16": 2, "u16": 2, "s16": 2, "pred": 1, "u8": 1,
          "s8": 1}


def _bucket_of(full: str) -> str:
    """Classify one HLO instruction into a profile band, designed to
    DECOMPOSE THE LONG TAIL (VERDICT r3 weak #2): the main bands (matmul/
    conv/elementwise with a >=1 MB result element) are lumped together;
    async DMA (VMEM prefetch/offload, which OVERLAPS compute) is split
    out; everything small is split by what it is (PRNG bits, masks,
    LN/softmax stats, reductions, layout copies, scalars). Tuple results
    are sized by their LARGEST element."""
    import re

    head = full.split(" = ", 1)
    rhs = head[1] if len(head) == 2 else full
    result = _result_type(rhs)
    rest = rhs[len(result):].strip()
    kind = rest.split("(", 1)[0].strip() or "?"

    shapes = re.findall(r"([a-z0-9]+)\[([0-9,]*)\]", result)
    # elems_max tracks the element count of the byte-largest tuple element
    # directly (reconstructing it from nbytes / min-dtype-width overcounts
    # on mixed-dtype tuples and misclassifies small f32 stats)
    nbytes, elems_max, dtypes = 0, 0, set()
    for dtype, dims in shapes:
        sizes = [int(d) for d in dims.split(",") if d]
        elems = int(np.prod(sizes)) if sizes else 1
        b = elems * _BYTES.get(dtype, 4)
        if b > nbytes:
            nbytes, elems_max = b, elems
        dtypes.add(dtype)

    if kind in ("async-start", "async-done", "copy-start", "copy-done",
                "all-gather-start", "all-gather-done", "all-reduce-start",
                "all-reduce-done", "send", "recv", "send-done",
                "recv-done"):
        return "async DMA/collectives (overlaps compute)"
    if kind in ("copy", "transpose", "bitcast"):
        return "layout copies"
    small = nbytes < (1 << 20)
    # NB: a big fusion merely CONSUMING an %rng operand is main-band
    # compute; only small integer/rng-producing ops are PRNG tail
    if small and (dtypes and dtypes <= {"u32", "u64", "s64", "u16", "u8",
                                        "s32"} or "rng" in full):
        return "tail: PRNG/integer bit math"
    if dtypes == {"pred"}:
        return "tail: masks (pred)"
    if not small:
        return "main bands (>=1MB results: matmul/conv/elementwise)"
    if kind.startswith("reduce"):
        return "tail: small reductions"
    if "f32" in dtypes and elems_max <= 64 * 1024:
        return "tail: f32 small stats (LN/softmax/loss-land)"
    if not shapes or elems_max <= 128:
        return "tail: scalars/control"
    return "tail: other small ops"


def summarize_buckets(path: str) -> str:
    """Tail decomposition: total device ms per bucket over the profiled
    steps (divide by --profile_steps for ms/step)."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    raw = open(path, "rb").read()
    try:
        raw = gzip.decompress(raw)
    except OSError:
        pass
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(raw)

    out = []
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops" or not line.events:
                continue
            total_by = collections.Counter()
            count_by = collections.Counter()
            tot = 0
            for ev in line.events:
                b = _bucket_of(ev_meta.get(ev.metadata_id,
                                           str(ev.metadata_id)))
                total_by[b] += ev.duration_ps
                count_by[b] += 1
                tot += ev.duration_ps
            out.append(f"=== bucket decomposition: plane {plane.name} "
                       f"(device total {tot / 1e9:.2f} ms)")
            for name, ps in total_by.most_common():
                out.append(f"  {ps / 1e9:10.3f} ms  x{count_by[name]:<6d} "
                           f"{ps / max(tot, 1) * 100:5.1f}%  {name}")
    return "\n".join(out) if out else "(no device planes found in xspace)"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--profile_steps", type=int, default=4)
    ap.add_argument("--mode", choices=["finetune", "frozen"], default="finetune")
    ap.add_argument("--attention", choices=["xla", "pallas"], default="xla")
    ap.add_argument("--softmax_dtype", choices=["float32", "bfloat16"],
                    default=None,
                    help="None -> inherit the Stage1Config default")
    ap.add_argument("--freeze_fx", action="store_true")
    ap.add_argument("--remat", default="default")
    ap.add_argument("--out", default="/tmp/w2v_profile")
    ap.add_argument("--summarize_only", default=None,
                    help="skip running; summarize this .xplane.pb file")
    ap.add_argument("--buckets", action="store_true",
                    help="also print the long-tail bucket decomposition")
    ap.add_argument("--dropout0", action="store_true",
                    help="profiling probe: all dropout rates + SpecAugment "
                         "off — bounds the PRNG+mask tail share in one "
                         "throughput/profile delta")
    args = ap.parse_args()

    if args.summarize_only:
        print(summarize_xspace(args.summarize_only))
        if args.buckets:
            print(summarize_buckets(args.summarize_only))
        return

    import jax  # noqa: F401

    from wav2vec_contr_loss_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from wav2vec_contr_loss_tpu.config import Stage1Config
    from wav2vec_contr_loss_tpu.models.wav2vec2 import XLSR_300M
    from wav2vec_contr_loss_tpu.train import Stage1Trainer

    batch_size = 32
    cfg = Stage1Config(
        batch_size=batch_size,
        finetune_encoder=(args.mode == "finetune"),
        use_rawboost=True, rawboost_mode="device", rawboost_prob=0.7,
        temperature=0.07, compute_dtype="bfloat16",
        attention_impl=args.attention,
        **({"softmax_dtype": args.softmax_dtype}
           if args.softmax_dtype is not None else {}),
        **({"freeze_feature_extractor": True} if args.freeze_fx else {}),
    )
    if args.remat != "default":
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
    wave[:, 60000:] = 0.0
    labels = np.array([1, 0] * (batch_size // 2), np.int32)
    batch = {"waveforms": jnp.asarray(wave), "labels": jnp.asarray(labels),
             "multi_labels": jnp.asarray(labels)}
    alpha = jnp.zeros((), jnp.float32)

    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, dict(batch), alpha)
    print(f"[profile] warmup loss={float(metrics['loss']):.4f} "
          f"(compile+run {time.perf_counter() - t0:.1f}s)", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = trainer.train_step(state, dict(batch), alpha)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0
    print(f"[profile] {args.steps} steps: {dt:.2f}s -> "
          f"{args.steps * batch_size / dt:.1f} clips/s", flush=True)

    os.makedirs(args.out, exist_ok=True)
    jax.profiler.start_trace(args.out)
    for _ in range(args.profile_steps):
        state, metrics = trainer.train_step(state, dict(batch), alpha)
    _ = float(metrics["loss"])
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(
        args.out, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        print(json.dumps({"error": "no xplane produced", "out": args.out}))
        return
    print(f"[profile] xplane: {paths[-1]}", flush=True)
    print(summarize_xspace(paths[-1]))
    if args.buckets:
        print(summarize_buckets(paths[-1]))


if __name__ == "__main__":
    main()
