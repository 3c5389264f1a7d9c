"""Multi-client scoring server: dynamic micro-batching over one resident
compiled graph.

The reference's deployment story is an offline, single-tenant filesystem
pipeline (extract_stage1_embeddings.py writes .npy, then
generate_eval_score_file.py:97-295 scores them). `cli.serve` already
turned that into an online single-stream daemon; this module is the
multi-tenant step: N concurrent clients submit single clips, and a
`DynamicBatcher` coalesces them into the scorer's static (batch, T)
shape — one compiled program, tail-padded — so throughput comes from
batch occupancy while per-clip latency is bounded by `max_wait_ms`.

Design notes (TPU-shaped):
  * The compiled graph's batch is STATIC. The batcher always dispatches
    (batch, T); under-full batches zero-pad (scoring silence costs the
    same step, never a recompile).
  * One collector thread owns dispatch order; device compute overlaps
    request coalescing through a depth-2 resolver queue (dispatch is
    async in JAX, the resolver thread pays the host fetch) — the same
    double-buffer discipline as data/pipeline.stream_through_device.
  * Clients never share state: the server is reader/writer threads per
    connection over a line protocol, and every request resolves to a
    concurrent.futures result.

Line protocol (newline-delimited UTF-8, one request per line):
    <path>            -> response "<path>\t<logit>"
    <id>\t<path>      -> response "<id>\t<logit>"
The FIRST tab splits id from path, so a bare-path request must not
contain a tab — a path that might is sent tagged (`<id>\t<path>`),
which is unambiguous because only the first tab splits.
Higher logit == more bonafide-like (the reference's score-file
convention, generate_eval_score_file.py:214). A corrupted/missing file
follows the zero-waveform fallback contract (base_audio.py:21-34): it
scores as silence and the stream stays alive.
"""

from __future__ import annotations

import queue
import socket
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, Dict, Iterable, Iterator, Optional, Tuple

import numpy as np

from ..data.audio import AudioConfig, AudioLoader

__all__ = ["DynamicBatcher", "ScoringServer", "decoded_tagged"]

_STOP = object()

# Per-request line cap (tag + tab + filesystem path fits in a fraction of
# this). A line that hits the cap without a newline is a protocol
# violation; the connection is dropped instead of buffering it unbounded.
_MAX_LINE = 64 * 1024


class DynamicBatcher:
    """Coalesce concurrent single-clip requests into static device batches.

    `submit(wave)` returns a Future resolving to the clip's float logit.
    A collector thread blocks for the first pending request, drains up to
    `batch - 1` more for at most `max_wait_ms`, zero-pads the tail, and
    dispatches `score_fn(put_fn(waves))`. Resolution (the host fetch) runs
    on a separate thread behind a depth-2 queue, so the device computes
    batch N while batch N+1 coalesces.
    """

    def __init__(self, score_fn: Callable, batch: int, num_samples: int,
                 max_wait_ms: float = 5.0,
                 put_fn: Optional[Callable] = None):
        if batch < 1:
            raise ValueError(f"batch must be >= 1, got {batch}")
        self._score = score_fn
        self._put = put_fn if put_fn is not None else (lambda x: x)
        self.batch = batch
        self.num_samples = num_samples
        self.max_wait = max_wait_ms / 1000.0
        # bounded: submit() blocks when decode outruns the device, so a
        # streamed file list can never pile unbounded waveforms in RAM
        # (the single-tenant path bounds its lookahead the same way)
        self._q: queue.Queue = queue.Queue(maxsize=max(4 * batch, 16))
        self._resolve_q: queue.Queue = queue.Queue(maxsize=2)
        self.n_clips = 0
        self.n_batches = 0
        self._closed = False
        self._submit_lock = threading.Lock()
        self._collector = threading.Thread(target=self._collect,
                                           name="batcher-collect",
                                           daemon=True)
        self._resolver = threading.Thread(target=self._resolve,
                                          name="batcher-resolve",
                                          daemon=True)
        self._collector.start()
        self._resolver.start()

    # -- client side ------------------------------------------------------
    def submit(self, wave: np.ndarray) -> Future:
        """Queue one (T,) float32 clip; -> Future[float] logit. Blocks
        when the request queue is full (backpressure on the submitter)."""
        fut: Future = Future()
        # check+enqueue under one lock so a request can never land AFTER
        # close()'s _STOP (which would strand its Future unresolved); a
        # full-queue block holds the lock, but the collector keeps
        # draining until it sees _STOP — which close() can only enqueue
        # once this put completes and releases the lock — so it resolves
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("DynamicBatcher is closed")
            self._q.put((np.asarray(wave, np.float32), fut))
        return fut

    def close(self) -> Dict[str, float]:
        """Drain pending requests, stop the threads, return stats."""
        with self._submit_lock:
            already = self._closed
            self._closed = True
        if not already:
            self._q.put(_STOP)
            self._collector.join()
            self._resolver.join()
        occ = self.n_clips / max(1, self.n_batches * self.batch)
        return {"clips": self.n_clips, "batches": self.n_batches,
                "occupancy": round(occ, 3)}

    # -- worker side ------------------------------------------------------
    def _collect(self) -> None:
        while True:
            item = self._q.get()
            if item is _STOP:
                self._resolve_q.put(_STOP)
                return
            entries = [item]
            deadline = time.monotonic() + self.max_wait
            stop_after = False
            while len(entries) < self.batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is _STOP:
                    stop_after = True
                    break
                entries.append(nxt)
            waves = np.zeros((self.batch, self.num_samples), np.float32)
            for i, (w, _) in enumerate(entries):
                n = min(w.shape[-1], self.num_samples)
                waves[i, :n] = w[..., :n]
            futs = [f for _, f in entries]
            try:
                # async dispatch: the device starts now; the fetch happens
                # on the resolver thread (depth-2 queue == double buffer)
                logits = self._score(self._put(waves))
            except Exception as e:  # compile/dispatch failure
                for f in futs:
                    f.set_exception(e)
            else:
                # counters BEFORE the hand-off: the resolver can wake a
                # client the instant this put lands, and that client may
                # read the stats
                self.n_batches += 1
                self.n_clips += len(futs)
                self._resolve_q.put((logits, futs))
            if stop_after:
                self._resolve_q.put(_STOP)
                return

    def _resolve(self) -> None:
        while True:
            item = self._resolve_q.get()
            if item is _STOP:
                return
            logits, futs = item
            try:
                host = np.asarray(logits)  # the reliable sync (CLAUDE.md)
            except Exception as e:
                for f in futs:
                    f.set_exception(e)
                continue
            for i, f in enumerate(futs):
                f.set_result(float(host[i]))


def decoded_tagged(items: Iterable[Tuple[str, str]], loader: AudioLoader,
                   pool: ThreadPoolExecutor,
                   lookahead: int) -> Iterator[Tuple[str, np.ndarray]]:
    """(tag, path) stream -> (tag, waveform) in order, decoding up to
    `lookahead` ahead on the caller's pool. cli.serve's stream mode
    wraps this with tag == path and a private pool. PULL semantics: the
    fill loop blocks on the input iterator, so the first wave is not
    yielded until `lookahead` items (or EOF) arrived — right for a
    piped file list, head-of-line-blocking for an interactive client,
    which is why ScoringServer._handle uses push-style stages instead."""
    from collections import deque

    pending: deque = deque()
    it = iter(items)
    exhausted = False
    while True:
        while not exhausted and len(pending) < lookahead:
            try:
                tag, path = next(it)
            except StopIteration:
                exhausted = True
                break
            pending.append((tag, pool.submit(loader.load, path)))
        if not pending:
            return
        tag, fut = pending.popleft()
        yield tag, fut.result()


class ScoringServer:
    """Threaded TCP front end over a shared DynamicBatcher.

    One resident scorer serves any number of concurrent connections; each
    connection gets a reader thread (decode lookahead -> batcher.submit)
    and a writer thread (resolve futures in request order), so responses
    per connection are ordered while clips from ALL connections coalesce
    into shared device batches.
    """

    def __init__(self, scorer, host: str = "127.0.0.1", port: int = 0,
                 batch: int = 8,
                 audio_config: AudioConfig = AudioConfig(),
                 workers: int = 8, wire: str = "float32",
                 max_wait_ms: float = 5.0,
                 windowed: str = "none", hop_seconds: float = 2.5,
                 max_clip_seconds: float = 600.0,
                 log_fn: Callable[[str], None] = print):
        """windowed: 'none' scores the first max_duration seconds (the
        reference's pad-or-trim contract); 'mean'|'min'|'max'|'median'
        scores each request's FULL clip as overlapping fixed-length
        windows — every window is just one more batcher submit, so
        windows from all clips and clients coalesce into the same static
        device batches — aggregated per request on the host
        (SpoofScorer.score_long_waveforms semantics).

        max_clip_seconds caps the windowed length per request (default
        10 min): clients name the files, so without a cap one request
        for a multi-hour recording would hold its full waveform and all
        its windows in host RAM. The cap truncates after decode —
        bounding window count, batcher work, and retained buffers — but
        the decode itself still reads the whole file once (decoder-level
        early-exit would need a native-decoder cap)."""
        from ..cli.serve import _put_fn
        from .serving import _WINDOW_AGG

        if windowed == "none":
            self.loader = AudioLoader(audio_config)
            self._agg = None
        else:
            # full-length decode; the window length stays the scorer's
            # static num_samples
            self.loader = AudioLoader(AudioConfig(
                audio_config.target_sample_rate, None))
            self._agg = _WINDOW_AGG[windowed]
        self._win_samples = audio_config.num_samples
        self._hop = max(1, int(hop_seconds
                               * audio_config.target_sample_rate))
        self._cap_samples = max(
            self._win_samples,
            int(max_clip_seconds * audio_config.target_sample_rate))
        put = _put_fn(wire, scorer)
        self.batcher = DynamicBatcher(
            scorer._score, batch, audio_config.num_samples,
            max_wait_ms=max_wait_ms, put_fn=lambda w: put((None, w)))
        self.pool = ThreadPoolExecutor(max_workers=workers,
                                       thread_name_prefix="decode")
        self.log = log_fn
        self._lookahead = max(2, workers)
        self._sock = socket.create_server((host, port))
        self.address: Tuple[str, int] = self._sock.getsockname()[:2]
        self._shutdown = threading.Event()
        self._conn_lock = threading.Lock()
        self._conns: dict = {}  # thread -> socket, live connections only

    # -- lifecycle --------------------------------------------------------
    def serve_forever(self) -> None:
        """Accept loop; returns after shutdown(). Call from any thread."""
        self.log(f"[serve] listening on {self.address[0]}:{self.address[1]}")
        while not self._shutdown.is_set():
            try:
                conn, peer = self._sock.accept()
            except OSError:  # socket closed by shutdown()
                break
            t = threading.Thread(target=self._handle, args=(conn, peer),
                                 daemon=True)
            with self._conn_lock:
                # a connection accepted in the instant shutdown() runs
                # must not start a handler against the closing batcher:
                # either we register before shutdown's snapshot (it gets
                # drained+joined) or we see the flag here and refuse it
                if self._shutdown.is_set():
                    try:
                        conn.close()
                    except OSError:
                        pass
                    continue
                self._conns[t] = conn  # _handle removes itself when done
            t.start()

    def request_stop(self) -> None:
        """Signal-handler-safe: stop the accept loop without joining
        anything; `serve_forever` returns and the caller runs
        `shutdown()` in normal context."""
        self._shutdown.set()
        try:
            self._sock.close()
        except OSError:
            pass

    def shutdown(self) -> Dict[str, float]:
        """Stop accepting, DRAIN live connections, close the batcher.

        Each live connection's read side is shut down so its reader sees
        EOF and stops submitting (an idle client can otherwise block a
        reader in readline forever), while its writer keeps delivering
        every already-submitted reply — drain, not abort. Only after all
        connection threads exit does the batcher close, so no reader can
        race a submit against the batcher's _STOP."""
        self.request_stop()
        with self._conn_lock:
            live = dict(self._conns)
        for t, conn in live.items():
            try:
                conn.shutdown(socket.SHUT_RD)
            except OSError:
                pass  # already closed/reset
        for t in live:
            try:
                t.join(timeout=60)
            except RuntimeError:
                pass  # registered but not yet started (accept-time race)
        stats = self.batcher.close()
        self.pool.shutdown(wait=False)
        self.log(f"[serve] done: {stats['clips']} clips in "
                 f"{stats['batches']} batches "
                 f"(occupancy {stats['occupancy']:.0%})")
        return stats

    # -- per-connection ---------------------------------------------------
    def _handle(self, conn: socket.socket, peer) -> None:
        """Three pipelined stages per connection, so an INTERACTIVE client
        (send one request, wait for its reply, send the next) is answered
        immediately while a STREAMING client still overlaps decode,
        scoring, and reply:

          reader    — parse lines, launch decode on the shared pool,
                      hand (tag, decode_future) on; never blocks on a
                      decode or a score, so request K is in flight the
                      moment its line arrives (a pull-lookahead here
                      would head-of-line-block: it would wait for line
                      K+1 before releasing clip K's decoded wave);
          submitter — in request order: wait the decode, submit to the
                      shared batcher;
          writer    — in request order: wait the logit, write the reply.

        mid_q is bounded (decode-ahead memory); out_q holds only
        (tag, Future) pairs.
        """
        mid_q: queue.Queue = queue.Queue(maxsize=self._lookahead)
        # bounded: a client that streams requests but never reads replies
        # would otherwise grow (tag, futs) entries without bound; the full
        # queue backpressures submitter -> mid_q -> reader -> the client's
        # own TCP send buffer
        out_q: queue.Queue = queue.Queue(maxsize=max(16, 4 * self._lookahead))

        def submitter():
            from .serving import window_waveform

            while True:
                entry = mid_q.get()
                if entry is _STOP:
                    out_q.put(_STOP)
                    return
                tag, dec_fut = entry
                try:
                    wave = dec_fut.result()
                    if self._agg is None:
                        futs = [self.batcher.submit(wave)]
                    else:  # one submit per window; shared-batch coalescing
                        wins = window_waveform(
                            np.asarray(wave[: self._cap_samples],
                                       np.float32),
                            self._win_samples, self._hop)
                        futs = [self.batcher.submit(w) for w in wins]
                except Exception as e:  # batcher closed / pool torn down
                    f = Future()
                    f.set_exception(e)
                    futs = [f]
                out_q.put((tag, futs))

        def writer():
            wfile = conn.makefile("w", encoding="utf-8", newline="\n")
            # When the client goes away mid-stream the writer must KEEP
            # consuming out_q until _STOP: exiting early would leave the
            # submitter blocked on a full out_q and the reader blocked on
            # a full mid_q — a permanent deadlock that also wedges
            # shutdown()'s join. After a write failure the futures are
            # still resolved (their batcher slots drain) but nothing is
            # written.
            broken = False
            while True:
                entry = out_q.get()
                if entry is _STOP:
                    break
                tag, futs = entry
                try:
                    vals = [f.result() for f in futs]
                    logit = (vals[0] if self._agg is None
                             else float(self._agg(vals)))
                    line = f"{tag}\t{logit:.6f}\n"
                except Exception as e:
                    line = f"{tag}\tERROR {type(e).__name__}\n"
                if broken:
                    continue
                try:
                    wfile.write(line)
                    wfile.flush()
                except (BrokenPipeError, ConnectionResetError, OSError):
                    broken = True  # client went away; drain silently
            try:
                wfile.close()
            except OSError:
                pass

        st = threading.Thread(target=submitter, daemon=True)
        wt = threading.Thread(target=writer, daemon=True)
        st.start()
        wt.start()
        n = 0
        try:
            # Binary reads so the line cap is enforced in BYTES (a text
            # wrapper's readline(size) counts decoded characters — 4-byte
            # UTF-8 would stretch the cap 4x). decode(errors='replace'):
            # a client shoving non-UTF-8 bytes gets its garbage treated as
            # an unloadable path (scored as silence per the fallback
            # contract) instead of killing the reader with
            # UnicodeDecodeError. readline(cap): an endless line with no
            # newline is a protocol violation — drop the connection rather
            # than buffer it without bound.
            rfile = conn.makefile("rb")
            while True:
                raw = rfile.readline(_MAX_LINE)
                if not raw:
                    break
                if len(raw) >= _MAX_LINE and not raw.endswith(b"\n"):
                    self.log(f"[serve] {peer[0]}:{peer[1]}: request line "
                             f"exceeds {_MAX_LINE} bytes; closing")
                    break
                line = raw.decode("utf-8", errors="replace")
                line = line.rstrip("\n").rstrip("\r")
                if not line:
                    continue
                tag, _, path = line.partition("\t")
                if not path:
                    tag = path = line
                mid_q.put((tag, self.pool.submit(self.loader.load, path)))
                n += 1
        except (ConnectionResetError, OSError):
            pass
        except RuntimeError:
            pass  # decode pool torn down mid-read (shutdown abort path)
        finally:
            mid_q.put(_STOP)
            st.join()
            wt.join()
            try:
                conn.close()
            except OSError:
                pass
            with self._conn_lock:
                self._conns.pop(threading.current_thread(), None)
            self.log(f"[serve] {peer[0]}:{peer[1]} disconnected "
                     f"after {n} clips")
