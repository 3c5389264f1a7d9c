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
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Tuple

import numpy as np

from ..data.audio import AudioConfig, AudioLoader

__all__ = ["score_paths", "score_paths_windowed", "main"]


def _batched_waves(paths: Iterable[str], loader: AudioLoader, batch: int,
                   workers: int) -> Iterator[Tuple[list, np.ndarray]]:
    """Decode `paths` with a bounded-lookahead thread pool and group into
    (paths, (B, T) float32) batches; the tail batch is zero-padded to the
    static batch size (XLA graph compiles once)."""
    t = loader.config.num_samples
    with ThreadPoolExecutor(max_workers=workers) as pool:
        pending: deque = deque()  # (path, future)
        done_paths, done_waves = [], []
        it = iter(paths)
        exhausted = False
        while True:
            # keep up to 2 batches of decode in flight ahead of the device
            while not exhausted and len(pending) < 2 * batch:
                try:
                    p = next(it)
                except StopIteration:
                    exhausted = True
                    break
                pending.append((p, pool.submit(loader.load, p)))
            if not pending:
                break
            p, fut = pending.popleft()
            done_paths.append(p)
            done_waves.append(fut.result())
            if len(done_paths) == batch or (exhausted and not pending):
                n = len(done_paths)
                waves = np.zeros((batch, t), np.float32)
                waves[:n] = np.stack(done_waves)
                yield done_paths, waves
                done_paths, done_waves = [], []


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
    import jax

    from ..data.pipeline import stream_through_device
    from ..ops.wire import quantize_wire

    loader = AudioLoader(audio_config)

    def put(chunk_waves):
        _, waves = chunk_waves
        return jax.device_put(quantize_wire(waves) if wire == "int16"
                              else waves)

    for logits, (chunk, _) in stream_through_device(
        _batched_waves(paths, loader, batch, workers), put, scorer._score,
    ):
        for p, lg in zip(chunk, logits[: len(chunk)]):
            yield p, float(lg)


def score_paths_windowed(scorer, paths: Iterable[str], batch: int = 8,
                         audio_config: AudioConfig = AudioConfig(),
                         workers: int = 8, wire: str = "float32",
                         hop_seconds: float = 2.5,
                         agg: str = "mean") -> Iterator[Tuple[str, float]]:
    """Yield (path, logit) in input order, scoring each clip's FULL length
    via overlapping fixed-length windows (the reference throws away
    everything past the first 5 s — base_audio.py:39-45). Windows from
    consecutive clips are packed together so every device batch keeps the
    static (batch, T) shape: one compiled graph serves any mix of clip
    lengths. Aggregation semantics: SpoofScorer.score_long_waveforms."""
    import jax

    from ..data.pipeline import stream_through_device
    from ..eval.serving import _WINDOW_AGG, window_waveform
    from ..ops.wire import quantize_wire

    t = audio_config.num_samples
    hop = max(1, int(hop_seconds * audio_config.target_sample_rate))
    # decode at full length; corrupted files still fall back to zeros
    full_loader = AudioLoader(AudioConfig(audio_config.target_sample_rate,
                                          None))
    aggf = _WINDOW_AGG[agg]
    clips: dict = {}  # pid -> [path, n_windows, logits_so_far]

    def batches():
        buf_ids, buf_rows = [], []
        with ThreadPoolExecutor(max_workers=workers) as pool:
            pending: deque = deque()
            it = iter(paths)
            exhausted = False
            pid = 0
            while True:
                while not exhausted and len(pending) < 2 * batch:
                    try:
                        p = next(it)
                    except StopIteration:
                        exhausted = True
                        break
                    pending.append((p, pool.submit(full_loader.load, p)))
                if pending:
                    p, fut = pending.popleft()
                    wins = window_waveform(fut.result(), t, hop)
                    clips[pid] = [p, wins.shape[0], []]
                    buf_ids.extend([pid] * wins.shape[0])
                    buf_rows.extend(wins)
                    pid += 1
                while len(buf_ids) >= batch:
                    yield buf_ids[:batch], np.stack(buf_rows[:batch])
                    buf_ids, buf_rows = buf_ids[batch:], buf_rows[batch:]
                if exhausted and not pending:
                    if buf_ids:
                        waves = np.zeros((batch, t), np.float32)
                        waves[: len(buf_rows)] = np.stack(buf_rows)
                        yield buf_ids, waves
                    break

    def put(chunk_waves):
        _, waves = chunk_waves
        return jax.device_put(quantize_wire(waves) if wire == "int16"
                              else waves)

    emit_next = 0
    for logits, (ids, _) in stream_through_device(batches(), put,
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
    p.add_argument("--batch", type=int, default=8,
                   help="static serving batch (one compiled graph)")
    p.add_argument("--max_duration_seconds", type=int, default=5)
    p.add_argument("--target_sample_rate", type=int, default=16000)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--wire", type=str, default="float32",
                   choices=["float32", "int16"],
                   help="host->device waveform format; int16 halves H2D "
                        "bytes (exact for unresampled PCM)")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "w8a8", "w8"],
                   help="int8 encoder quantization: 'w8a8' rides the "
                        "2x-rate int8 MXU, 'w8' halves weight HBM "
                        "reads (ops/quant.py)")
    p.add_argument("--threshold", type=float, default=None,
                   help="optional decision threshold: adds a third column "
                        "bonafide/spoof (e.g. the dev-EER threshold printed "
                        "by cli.eval_scores)")
    p.add_argument("--windowed", type=str, default="none",
                   choices=["none", "mean", "min", "max", "median"],
                   help="score each clip's FULL length via overlapping "
                        "windows aggregated with this statistic ('min' is "
                        "spoof-sensitive); default scores only the first "
                        "max_duration_seconds like the reference")
    p.add_argument("--hop_seconds", type=float, default=2.5,
                   help="window hop for --windowed")
    args = p.parse_args(argv)

    batch, wire = args.batch, args.wire
    audio_cfg = AudioConfig(target_sample_rate=args.target_sample_rate,
                            max_duration_seconds=args.max_duration_seconds)
    if args.artifact is not None:
        if args.quantize != "none":
            p.error("--quantize is baked into the artifact at export time; "
                    "it cannot be changed at serve time")
        from types import SimpleNamespace

        from ..eval.serving import load_exported

        fn, spec = load_exported(args.artifact, with_spec=True)
        scorer = SimpleNamespace(_score=fn)
        batch, wire = spec.batch, spec.wire  # the signature is baked in
        if spec.num_samples != audio_cfg.num_samples:
            if spec.num_samples % args.target_sample_rate:
                p.error(f"artifact expects {spec.num_samples} samples/clip, "
                        f"not a whole number of seconds at "
                        f"{args.target_sample_rate} Hz — pass the matching "
                        f"--target_sample_rate")
            audio_cfg = AudioConfig(
                target_sample_rate=args.target_sample_rate,
                max_duration_seconds=spec.num_samples
                // args.target_sample_rate)
        print(f"[serve] artifact {args.artifact}: batch={batch}, "
              f"{spec.num_samples} samples/clip, wire={wire}",
              file=sys.stderr)
    else:
        if args.stage1_dir is None or args.stage2_dir is None:
            p.error("either --artifact or both --stage1_dir and "
                    "--stage2_dir are required")
        from ..eval.serving import SpoofScorer

        scorer = SpoofScorer.from_checkpoints(
            args.stage1_dir, args.stage2_dir,
            stage1_name=args.stage1_name, stage2_name=args.stage2_name,
            quantize=args.quantize)

    paths = _stdin_paths() if args.list_file is None else (
        line.strip() for line in open(args.list_file) if line.strip())
    if args.windowed != "none":
        scored = score_paths_windowed(
            scorer, paths, batch=batch, audio_config=audio_cfg,
            workers=args.num_workers, wire=wire,
            hop_seconds=args.hop_seconds, agg=args.windowed)
    else:
        scored = score_paths(scorer, paths, batch=batch,
                             audio_config=audio_cfg,
                             workers=args.num_workers, wire=wire)
    n = 0
    for path, logit in scored:
        if args.threshold is None:
            print(f"{path}\t{logit:.6f}", flush=True)
        else:
            label = "bonafide" if logit >= args.threshold else "spoof"
            print(f"{path}\t{logit:.6f}\t{label}", flush=True)
        n += 1
    print(f"[serve] scored {n} clips "
          f"(decode ok={AudioLoader.loaded_count} "
          f"failed={AudioLoader.failed_count})", file=sys.stderr)


if __name__ == "__main__":
    main()
