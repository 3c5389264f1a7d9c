"""Streaming scoring daemon: audio paths in, spoof scores out.

The reference's deployment story is a two-process filesystem pipeline
(extract_stage1_embeddings.py writes .npy, generate_eval_score_file.py
reads and scores). This CLI is the online counterpart of that offline
contract: it holds the fused `SpoofScorer` graph resident on the chip and
scores newline-separated audio paths from stdin (or `--list`), emitting
one `path\tlogit` line per clip, flushed per batch so it composes with
pipes. Decode runs in a thread pool overlapped with device scoring;
corrupted files follow the reference's zero-waveform fallback contract
(reference: base_audio.py:21-34 — counted, scored as silence, never
crash the stream).

Usage:
    find corpus/ -name '*.flac' | python -m wav2vec_contr_loss_tpu.cli.serve \
        --stage1_dir checkpoints_stage1/<tag> --stage2_dir scores_stage2/<tag>

    # or from a self-contained cli.export_serving artifact (no model code
    # or checkpoints on the serving host; batch/clip-length/wire are read
    # from the artifact's baked signature):
    ... | python -m wav2vec_contr_loss_tpu.cli.serve --artifact scorer.jaxexport

Higher logit == more bonafide-like (the reference's score-file
convention, generate_eval_score_file.py:214).
"""

from __future__ import annotations

import argparse
import sys
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Tuple

import numpy as np

from ..data.audio import AudioConfig, AudioLoader

__all__ = ["score_paths", "score_paths_windowed", "main"]


def _log(m: str) -> None:
    """Best-effort stderr log: a daemon whose stderr reader died (orphaned
    pipe) must keep serving and exit rc=0 — never crash over a log line."""
    try:
        print(m, file=sys.stderr)
    except OSError:
        pass


def _decoded(paths: Iterable[str], loader: AudioLoader, workers: int,
             lookahead: int) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (path, waveform) in input order, decoding with a thread pool
    up to `lookahead` clips ahead of the consumer (the generic ordered
    iterator lives in eval/server.py; here tag == path, private pool)."""
    from ..eval.server import decoded_tagged

    with ThreadPoolExecutor(max_workers=workers) as pool:
        yield from decoded_tagged(((p, p) for p in paths), loader, pool,
                                  lookahead)


def _put_fn(wire: str, scorer=None):
    """(meta, (B, T) waves) -> device buffer, optionally int16-quantized
    on the wire (ops/wire.py). Uses the scorer's mesh-aware placement
    (SpoofScorer.put_waves — dp-sharded over 'data') when it has one;
    artifact-mode scorers fall back to a plain device_put."""
    import jax

    from ..ops.wire import quantize_wire

    place = getattr(scorer, "put_waves", jax.device_put)

    def put(chunk_waves):
        _, waves = chunk_waves
        return place(quantize_wire(waves) if wire == "int16" else waves)

    return put


def _batched_waves(paths: Iterable[str], loader: AudioLoader, batch: int,
                   workers: int) -> Iterator[Tuple[list, np.ndarray]]:
    """Decode `paths` (two batches of lookahead ahead of the device) and
    group into (paths, (B, T) float32) batches; the tail batch is
    zero-padded to the static batch size (XLA graph compiles once)."""
    t = loader.config.num_samples
    done_paths, done_waves = [], []
    for p, w in _decoded(paths, loader, workers, 2 * batch):
        done_paths.append(p)
        done_waves.append(w)
        if len(done_paths) == batch:
            yield done_paths, np.stack(done_waves)
            done_paths, done_waves = [], []
    if done_paths:
        n = len(done_paths)
        waves = np.zeros((batch, t), np.float32)
        waves[:n] = np.stack(done_waves)
        yield done_paths, waves


def score_paths(scorer, paths: Iterable[str], batch: int = 8,
                audio_config: AudioConfig = AudioConfig(),
                workers: int = 8,
                wire: str = "float32") -> Iterator[Tuple[str, float]]:
    """Yield (path, logit) in input order; static-shape batches with tail
    padding. Three stages overlap (data/pipeline.stream_through_device):
    threaded decode+H2D runs ahead of the device, batch N+1 is dispatched
    while batch N's logits fetch — so the daemon's steady-state rate is
    the slowest single stage, not their sum. wire='int16' halves the H2D
    bytes (exact for unresampled PCM sources — ops/wire.py)."""
    from ..data.pipeline import stream_through_device

    loader = AudioLoader(audio_config)
    for logits, (chunk, _) in stream_through_device(
        _batched_waves(paths, loader, batch, workers), _put_fn(wire, scorer),
        scorer._score,
    ):
        for p, lg in zip(chunk, logits[: len(chunk)]):
            yield p, float(lg)


def score_paths_windowed(scorer, paths: Iterable[str], batch: int = 8,
                         audio_config: AudioConfig = AudioConfig(),
                         workers: int = 8, wire: str = "float32",
                         hop_seconds: float = 2.5, agg: str = "mean",
                         max_clip_seconds: float = 600.0,
                         ) -> Iterator[Tuple[str, float]]:
    """Yield (path, logit) in input order, scoring each clip's FULL length
    via overlapping fixed-length windows (the reference throws away
    everything past the first 5 s — base_audio.py:39-45). Windows from
    consecutive clips are packed together so every device batch keeps the
    static (batch, T) shape: one compiled graph serves any mix of clip
    lengths. Aggregation semantics: SpoofScorer.score_long_waveforms.
    `max_clip_seconds` (default 10 min) caps the windowed length per clip,
    bounding the host RAM one pathological multi-hour file can pin —
    same contract as ScoringServer's cap."""
    from ..data.pipeline import stream_through_device
    from ..eval.serving import _WINDOW_AGG, window_waveform

    t = audio_config.num_samples
    hop = max(1, int(hop_seconds * audio_config.target_sample_rate))
    cap = max(t, int(max_clip_seconds * audio_config.target_sample_rate))
    # decode at full length; corrupted files still fall back to zeros
    full_loader = AudioLoader(AudioConfig(audio_config.target_sample_rate,
                                          None))
    aggf = _WINDOW_AGG[agg]
    clips: dict = {}  # pid -> [path, n_windows, logits_so_far]

    def batches():
        # lookahead in CLIPS is bounded by the pool width, not 2*batch:
        # full-length clips can be arbitrarily long, and each yields
        # several windows anyway, so a small clip lookahead keeps the
        # device fed without holding 2*batch whole waveforms in RAM
        buf_ids, buf_rows = [], []
        for pid, (p, wave) in enumerate(
                _decoded(paths, full_loader, workers, max(2, workers))):
            wins = window_waveform(wave[:cap], t, hop)
            clips[pid] = [p, wins.shape[0], []]
            buf_ids.extend([pid] * wins.shape[0])
            buf_rows.extend(wins)
            while len(buf_ids) >= batch:
                yield buf_ids[:batch], np.stack(buf_rows[:batch])
                buf_ids, buf_rows = buf_ids[batch:], buf_rows[batch:]
        if buf_ids:
            waves = np.zeros((batch, t), np.float32)
            waves[: len(buf_rows)] = np.stack(buf_rows)
            yield buf_ids, waves

    emit_next = 0
    for logits, (ids, _) in stream_through_device(batches(),
                                                  _put_fn(wire, scorer),
                                                  scorer._score):
        for pid, lg in zip(ids, logits[: len(ids)]):
            clips[pid][2].append(float(lg))
        while emit_next in clips and (
                len(clips[emit_next][2]) == clips[emit_next][1]):
            path, _, ls = clips.pop(emit_next)
            yield path, float(aggf(ls))
            emit_next += 1


def _stdin_paths() -> Iterator[str]:
    for line in sys.stdin:
        line = line.strip()
        if line:
            yield line


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", type=str, default=None,
                   help="serve from a cli.export_serving artifact instead "
                        "of checkpoints: batch/clip-length/wire come from "
                        "the artifact's baked signature, and the host "
                        "needs no model code or checkpoint files")
    p.add_argument("--stage1_dir", type=str, default=None)
    p.add_argument("--stage1_name", type=str, default="best")
    p.add_argument("--stage2_dir", type=str, default=None)
    p.add_argument("--stage2_name", type=str,
                   default="stage2_binary_head_best")
    p.add_argument("--list", dest="list_file", type=str, default=None,
                   help="file with one audio path per line (default: stdin)")
    p.add_argument("--batch", type=int, default=None,
                   help="static serving batch, one compiled graph "
                        "(default 8; in --artifact mode it is baked into "
                        "the artifact and may not be changed here)")
    p.add_argument("--max_duration_seconds", type=int, default=None,
                   help="(default 5; baked into an artifact)")
    p.add_argument("--target_sample_rate", type=int, default=None,
                   help="(default 16000; recorded in an artifact's header)")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--wire", type=str, default=None,
                   choices=["float32", "int16"],
                   help="host->device waveform format; int16 halves H2D "
                        "bytes (exact for unresampled PCM); default "
                        "float32 (baked into an artifact)")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "w8a8", "w8"],
                   help="int8 encoder quantization: 'w8a8' rides the "
                        "2x-rate int8 MXU, 'w8' halves weight HBM "
                        "reads (ops/quant.py)")
    p.add_argument("--threshold", type=float, default=None,
                   help="optional decision threshold: adds a third column "
                        "bonafide/spoof (e.g. the dev-EER threshold printed "
                        "by cli.eval_scores)")
    p.add_argument("--socket", type=str, default=None, metavar="HOST:PORT",
                   help="serve a TCP line protocol instead of stdin/stdout "
                        "(port 0 = ephemeral, printed on stderr): N "
                        "concurrent clients send '<path>' or '<id>\\t<path>' "
                        "lines and their clips coalesce into shared device "
                        "batches (eval/server.py dynamic micro-batching)")
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="--socket: max time to hold an under-full batch "
                        "open before dispatching it tail-padded")
    p.add_argument("--windowed", type=str, default="none",
                   choices=["none", "mean", "min", "max", "median"],
                   help="score each clip's FULL length via overlapping "
                        "windows aggregated with this statistic ('min' is "
                        "spoof-sensitive); default scores only the first "
                        "max_duration_seconds like the reference")
    p.add_argument("--hop_seconds", type=float, default=2.5,
                   help="window hop for --windowed")
    p.add_argument("--max_clip_seconds", type=float, default=600.0,
                   help="--windowed (both modes): per-clip windowed-length "
                        "cap, bounding the host memory one clip/request "
                        "can pin")
    args = p.parse_args(argv)

    socket_addr = None
    if args.socket is not None:
        # validate BEFORE the (expensive) scorer build
        if args.threshold is not None:
            p.error("--threshold applies to the stream mode; socket clients "
                    "receive raw logits")
        if args.list_file is not None:
            p.error("--list applies to the stream mode; socket clients "
                    "send their own path lists over the connection")
        host, _, port = args.socket.rpartition(":")
        try:
            socket_addr = (host or "127.0.0.1", int(port))
        except ValueError:
            p.error(f"--socket expects HOST:PORT, got {args.socket!r}")

    if args.artifact is not None:
        # the serving signature is baked into the artifact; reject (not
        # silently override) any conflicting flag, like --quantize below
        if args.quantize != "none":
            p.error("--quantize is baked into the artifact at export time; "
                    "it cannot be changed at serve time")
        from types import SimpleNamespace

        from ..eval.serving import load_exported

        fn, spec = load_exported(args.artifact, with_spec=True)
        scorer = SimpleNamespace(_score=fn)
        for flag, given, baked in (("--batch", args.batch, spec.batch),
                                   ("--wire", args.wire, spec.wire)):
            if given is not None and given != baked:
                p.error(f"{flag}={given} conflicts with the artifact's "
                        f"baked {flag.lstrip('-')}={baked}")
        batch, wire = spec.batch, spec.wire
        sr = spec.sample_rate  # from the artifact's JSON header
        if sr is None:  # bare jax.export blob with no header
            sr = args.target_sample_rate or 16000
        elif (args.target_sample_rate is not None
              and args.target_sample_rate != sr):
            p.error(f"--target_sample_rate={args.target_sample_rate} "
                    f"conflicts with the artifact's recorded {sr} Hz")
        if spec.num_samples % sr:
            p.error(f"artifact expects {spec.num_samples} samples/clip, "
                    f"not a whole number of seconds at {sr} Hz — pass the "
                    f"matching --target_sample_rate")
        dur = spec.num_samples // sr
        if (args.max_duration_seconds is not None
                and args.max_duration_seconds != dur):
            p.error(f"--max_duration_seconds={args.max_duration_seconds} "
                    f"conflicts with the artifact's {dur} s clips")
        audio_cfg = AudioConfig(target_sample_rate=sr,
                                max_duration_seconds=dur)
        _log(f"[serve] artifact {args.artifact}: batch={batch}, "
             f"{spec.num_samples} samples/clip @ {sr} Hz, wire={wire}"
             + (f", quantize={spec.quantize}"
                if spec.quantize not in (None, "none") else ""))
    else:
        if args.stage1_dir is None or args.stage2_dir is None:
            p.error("either --artifact or both --stage1_dir and "
                    "--stage2_dir are required")
        batch = 8 if args.batch is None else args.batch
        wire = args.wire or "float32"
        audio_cfg = AudioConfig(
            target_sample_rate=args.target_sample_rate or 16000,
            max_duration_seconds=5 if args.max_duration_seconds is None
            else args.max_duration_seconds)
        from ..eval.serving import SpoofScorer

        scorer = SpoofScorer.from_checkpoints(
            args.stage1_dir, args.stage2_dir,
            stage1_name=args.stage1_name, stage2_name=args.stage2_name,
            quantize=args.quantize)

    if socket_addr is not None:
        import signal

        from ..eval.server import ScoringServer

        server = ScoringServer(
            scorer, socket_addr[0], socket_addr[1], batch=batch,
            audio_config=audio_cfg, workers=args.num_workers, wire=wire,
            max_wait_ms=args.max_wait_ms, windowed=args.windowed,
            hop_seconds=args.hop_seconds,
            max_clip_seconds=args.max_clip_seconds,
            log_fn=_log)
        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, lambda *_: server.request_stop())
        server.serve_forever()
        server.shutdown()
        return

    paths = _stdin_paths() if args.list_file is None else (
        line.strip() for line in open(args.list_file) if line.strip())
    if args.windowed != "none":
        scored = score_paths_windowed(
            scorer, paths, batch=batch, audio_config=audio_cfg,
            workers=args.num_workers, wire=wire,
            hop_seconds=args.hop_seconds, agg=args.windowed,
            max_clip_seconds=args.max_clip_seconds)
    else:
        scored = score_paths(scorer, paths, batch=batch,
                             audio_config=audio_cfg,
                             workers=args.num_workers, wire=wire)
    n = 0
    try:
        for path, logit in scored:
            if args.threshold is None:
                print(f"{path}\t{logit:.6f}", flush=True)
            else:
                label = "bonafide" if logit >= args.threshold else "spoof"
                print(f"{path}\t{logit:.6f}\t{label}", flush=True)
            n += 1
    except BrokenPipeError:
        # downstream consumer closed the pipe (e.g. `| head`): exit
        # cleanly; point stdout at devnull so interpreter shutdown
        # doesn't raise again while flushing
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        _log(f"[serve] downstream pipe closed after {n} clips")
        return
    _log(f"[serve] scored {n} clips "
         f"(decode ok={AudioLoader.loaded_count} "
         f"failed={AudioLoader.failed_count})")


if __name__ == "__main__":
    main()
