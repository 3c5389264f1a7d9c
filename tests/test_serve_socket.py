"""Multi-client socket serving: dynamic micro-batching (eval/server.py).

The reference's deployment is offline and single-tenant
(generate_eval_score_file.py:97-295); the socket server is the
multi-tenant online counterpart. Contracts under test: requests from
concurrent clients coalesce into the scorer's static batch, every future
resolves to ITS clip's logit (no cross-wiring), per-connection response
order is request order, under-full batches dispatch after max_wait_ms
tail-padded, and a corrupted path follows the zero-waveform fallback
(base_audio.py:21-34) instead of killing the stream.
"""

import socket
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2vec_contr_loss_tpu.config import Stage1Config, Stage2Config
from wav2vec_contr_loss_tpu.data.audio import AudioConfig, AudioLoader, write_wav
from wav2vec_contr_loss_tpu.eval.server import DynamicBatcher, ScoringServer
from wav2vec_contr_loss_tpu.eval.serving import SpoofScorer
from wav2vec_contr_loss_tpu.models.heads import build_head
from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
from wav2vec_contr_loss_tpu.train import Stage1Trainer

SR = 16000
TINY_ENC = Wav2Vec2Config(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    # stride product 80 -> T=200 frames on 1 s audio: (5,2) downsampling
    # left T=1599, so every (B,H,T,T) attention pass cost ~10 s of real
    # CPU compute and the shutdown-latency bound below raced it (flaky)
    conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(10, 8),
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    dtype=jnp.float32, apply_spec_augment=False,
)


# ---------------------------------------------------------------- batcher

def test_batcher_coalesces_and_maps_results():
    calls = []

    def score_fn(waves):
        calls.append(np.array(waves))
        return waves.sum(axis=1)

    b = DynamicBatcher(score_fn, batch=4, num_samples=8, max_wait_ms=250)
    futs = [b.submit(np.full(8, i + 1, np.float32)) for i in range(4)]
    # each future resolves to ITS clip's sum — no cross-wiring
    assert [f.result(timeout=10) for f in futs] == [8.0, 16.0, 24.0, 32.0]
    stats_mid = (b.n_clips, b.n_batches)
    assert stats_mid == (4, 1)  # full batch: one dispatch, no wait
    assert calls[0].shape == (4, 8)

    # under-full: dispatches alone after max_wait, tail zero-padded
    t0 = time.monotonic()
    f = b.submit(np.ones(8, np.float32))
    assert f.result(timeout=10) == 8.0
    assert time.monotonic() - t0 < 5.0
    assert calls[-1].shape == (4, 8)
    assert not calls[-1][1:].any()  # padding rows are zeros

    stats = b.close()
    assert stats["clips"] == 5 and stats["batches"] == 2
    assert stats["occupancy"] == pytest.approx(5 / 8)


def test_batcher_trims_overlong_clips():
    def score_fn(waves):
        return waves.sum(axis=1)

    b = DynamicBatcher(score_fn, batch=2, num_samples=4, max_wait_ms=1)
    f = b.submit(np.ones(10, np.float32))  # longer than the static T
    assert f.result(timeout=10) == 4.0
    b.close()


def test_batcher_error_propagates_and_survives():
    boom = {"n": 0}

    def score_fn(waves):
        boom["n"] += 1
        if boom["n"] == 1:
            raise RuntimeError("transient")
        return waves.sum(axis=1)

    b = DynamicBatcher(score_fn, batch=2, num_samples=4, max_wait_ms=1)
    f1 = b.submit(np.ones(4, np.float32))
    with pytest.raises(RuntimeError, match="transient"):
        f1.result(timeout=10)
    # the batcher keeps serving after a failed dispatch
    f2 = b.submit(np.ones(4, np.float32))
    assert f2.result(timeout=10) == 4.0
    b.close()


def test_batcher_queue_is_bounded():
    """Decode-ahead backpressure: the request queue must be bounded so a
    streamed corpus can't pile unbounded waveforms in RAM (review r3)."""
    b = DynamicBatcher(lambda w: w.sum(axis=1), batch=8, num_samples=4)
    assert b._q.maxsize == 32  # max(4*batch, 16)
    # functional: a fast producer against a batch-1 consumer still gets
    # every result (submit blocks instead of growing the queue)
    b2 = DynamicBatcher(lambda w: w.sum(axis=1), batch=1, num_samples=4,
                        max_wait_ms=0.1)
    futs = [b2.submit(np.full(4, i, np.float32)) for i in range(64)]
    assert [f.result(timeout=30) for f in futs] == [4.0 * i
                                                    for i in range(64)]
    b.close()
    b2.close()


def test_batcher_close_rejects_new_work():
    b = DynamicBatcher(lambda w: w.sum(axis=1), batch=2, num_samples=4)
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(np.ones(4, np.float32))


# ----------------------------------------------------------------- server

@pytest.fixture(scope="module")
def tiny_scorer():
    cfg = Stage1Config(batch_size=4, finetune_encoder=False,
                       use_rawboost=False, input_dim=32, hidden_dim=16,
                       max_duration_seconds=1, compute_dtype="float32")
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC)
    state = trainer.init_state(jax.random.PRNGKey(0))
    cfg2 = Stage2Config(hidden_dim=16)
    head = build_head(cfg2.head_type, cfg2.hidden_dim, cfg2.dropout)
    head_params = head.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, cfg.hidden_dim)))["params"]
    return SpoofScorer(trainer, state, cfg2, head_params)


def expected_logit(scorer, wave):
    waves = np.zeros((1, SR), np.float32)
    n = min(len(wave), SR)
    waves[0, :n] = wave[:n]
    return float(np.asarray(scorer._score(scorer.put_waves(waves)))[0])


def _client(addr, lines):
    """Send all lines, then read one reply per line (ordered)."""
    with socket.create_connection(addr, timeout=300) as s:
        f = s.makefile("rw", encoding="utf-8", newline="\n")
        for line in lines:
            f.write(line + "\n")
        f.flush()
        s.shutdown(socket.SHUT_WR)
        return [f.readline().rstrip("\n") for _ in lines]


def test_socket_server_two_concurrent_clients(tiny_scorer, tmp_path):
    rng = np.random.default_rng(7)
    loader = AudioLoader(AudioConfig(SR, 1))
    waves = {}
    for i in range(12):
        name = f"c{i:02d}.wav"
        x = (0.3 * np.sin(2 * np.pi * (220 + 30 * i) * np.arange(SR) / SR)
             if i % 2 == 0 else 0.2 * rng.standard_normal(SR))
        write_wav(tmp_path / name, x.astype(np.float32), SR)
        # expected logits go through the SAME decode path the server uses
        waves[str(tmp_path / name)] = loader.load(str(tmp_path / name))

    logs = []
    server = ScoringServer(tiny_scorer, port=0, batch=4,
                           audio_config=AudioConfig(SR, 1), workers=4,
                           max_wait_ms=30, log_fn=logs.append)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    paths = sorted(waves)
    lines_a = [f"req{i}\t{p}" for i, p in enumerate(paths[:6])]
    lines_b = paths[6:]  # untagged: path echoes back
    out = {}
    ths = [threading.Thread(
        target=lambda k, ls: out.__setitem__(k, _client(server.address, ls)),
        args=(k, ls)) for k, ls in (("a", lines_a), ("b", lines_b))]
    for th in ths:
        th.start()
    for th in ths:
        th.join(timeout=120)
    stats = server.shutdown()
    t.join(timeout=30)

    assert stats["clips"] == 12
    # per-connection response order == request order, tags echoed
    tags_a = [line.split("\t")[0] for line in out["a"]]
    assert tags_a == [f"req{i}" for i in range(6)]
    assert [line.split("\t")[0] for line in out["b"]] == lines_b

    # every reply carries ITS clip's logit
    for line, p in zip(out["a"], paths[:6]):
        got = float(line.split("\t")[1])
        assert got == pytest.approx(expected_logit(tiny_scorer, waves[p]),
                                    abs=2e-4)
    for line, p in zip(out["b"], paths[6:]):
        got = float(line.split("\t")[1])
        assert got == pytest.approx(expected_logit(tiny_scorer, waves[p]),
                                    abs=2e-4)


def test_socket_server_interactive_client(tiny_scorer, tmp_path):
    """Closed-loop (request -> wait for reply -> next request) clients
    must be answered per request. Regression: a pull-lookahead decode
    iterator in the connection handler head-of-line-blocked — it waited
    for request K+1 before releasing clip K's wave, so an interactive
    client hung forever on its first reply (caught by the socket bench's
    closed-loop legs, r3)."""
    name = str(tmp_path / "i.wav")
    write_wav(name, 0.2 * np.ones(SR, np.float32), SR)
    want = expected_logit(tiny_scorer,
                          AudioLoader(AudioConfig(SR, 1)).load(name))
    server = ScoringServer(tiny_scorer, port=0, batch=4,
                           audio_config=AudioConfig(SR, 1), workers=4,
                           max_wait_ms=5, log_fn=lambda m: None)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with socket.create_connection(server.address, timeout=300) as s:
            # socket timeout (60 s) is the hang guard: readline raises
            # instead of blocking the suite forever
            f = s.makefile("rw", encoding="utf-8", newline="\n")
            for k in range(3):  # never close the write side between them
                f.write(f"k{k}\t{name}\n")
                f.flush()
                reply = f.readline().rstrip()
                assert reply.split("\t")[0] == f"k{k}"
                assert float(reply.split("\t")[1]) == pytest.approx(
                    want, abs=2e-4)
    finally:
        server.shutdown()
        t.join(timeout=30)


def test_socket_server_shutdown_drains_idle_client(tiny_scorer, tmp_path):
    """Shutdown with a connected-but-idle client must (a) return promptly
    — the reader used to block shutdown ~30 s per idle connection — and
    (b) deliver every already-submitted reply first (drain, not abort)."""
    name = str(tmp_path / "w.wav")
    write_wav(name, 0.1 * np.ones(SR, np.float32), SR)
    server = ScoringServer(tiny_scorer, port=0, batch=4,
                           audio_config=AudioConfig(SR, 1), workers=2,
                           max_wait_ms=5, log_fn=lambda m: None)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    # computed OUTSIDE the timed window: this scores on the host and can
    # trigger a fresh B=1 jit compile (many seconds on a loaded box)
    want = expected_logit(tiny_scorer, AudioLoader(AudioConfig(SR, 1)).load(name))
    with socket.create_connection(server.address, timeout=300) as s:
        f = s.makefile("rw", encoding="utf-8", newline="\n")
        f.write(f"q\t{name}\n")
        f.flush()
        # wait until the request is INGESTED (decoded, submitted, counted
        # by the batcher's collector) — a fixed sleep flakes on a loaded
        # box where the reader thread may not have run yet; stay idle
        deadline = time.monotonic() + 60
        while server.batcher.n_clips < 1 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert server.batcher.n_clips >= 1, "request never reached batcher"
        t0 = time.monotonic()
        done = {}
        st = threading.Thread(
            target=lambda: done.__setitem__("stats", server.shutdown()))
        st.start()
        # the in-flight reply arrives even though shutdown started
        reply = f.readline().rstrip()
        assert reply.split("\t")[0] == "q"
        assert float(reply.split("\t")[1]) == pytest.approx(want, abs=2e-4)
        assert f.readline() == ""  # then EOF: connection drained closed
        st.join(timeout=30)
        assert "stats" in done and done["stats"]["clips"] == 1
        assert time.monotonic() - t0 < 15.0  # no 30 s/idle-client stall
    t.join(timeout=30)


def test_cli_socket_flag_conflicts():
    """--socket conflicts fail fast, BEFORE any scorer/checkpoint work."""
    from wav2vec_contr_loss_tpu.cli import serve as serve_cli

    for argv in (["--socket", "127.0.0.1:0", "--list", "x.txt"],
                 ["--socket", "127.0.0.1:0", "--threshold", "0.5"],
                 ["--socket", "no-port-here"]):
        with pytest.raises(SystemExit):
            serve_cli.main(argv)


def test_socket_server_windowed_matches_score_long(tiny_scorer, tmp_path):
    """--windowed over the socket: a long clip's overlapping windows ride
    the shared batcher and the per-request aggregate equals
    SpoofScorer.score_long_waveforms; short clips degenerate to plain."""
    rng = np.random.default_rng(3)
    short = (0.2 * rng.standard_normal(12000)).astype(np.float32)
    long1 = (0.2 * rng.standard_normal(int(2.6 * SR))).astype(np.float32)
    write_wav(tmp_path / "short.wav", short, SR)
    write_wav(tmp_path / "long.wav", long1, SR)
    loader = AudioLoader(AudioConfig(SR, None))  # full-length decode
    dshort = loader.load(str(tmp_path / "short.wav"))
    dlong = loader.load(str(tmp_path / "long.wav"))
    want = tiny_scorer.score_long_waveforms([dshort, dlong],
                                            hop_seconds=0.5, agg="min",
                                            batch=4)

    server = ScoringServer(tiny_scorer, port=0, batch=4,
                           audio_config=AudioConfig(SR, 1), workers=2,
                           max_wait_ms=10, windowed="min", hop_seconds=0.5,
                           log_fn=lambda m: None)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        out = _client(server.address,
                      [f"s\t{tmp_path / 'short.wav'}",
                       f"l\t{tmp_path / 'long.wav'}"])
        got = {line.split("\t")[0]: float(line.split("\t")[1])
               for line in out}
        assert got["s"] == pytest.approx(float(want[0]), abs=2e-4)
        assert got["l"] == pytest.approx(float(want[1]), abs=2e-4)
    finally:
        server.shutdown()
        t.join(timeout=30)

    # max_clip_seconds caps a request's windowed length (clients name the
    # files, so the cap bounds host memory per request): capped at the
    # 1 s window length, the 2.6 s clip degenerates to plain first-window
    # scoring
    capped = ScoringServer(tiny_scorer, port=0, batch=4,
                           audio_config=AudioConfig(SR, 1), workers=2,
                           max_wait_ms=10, windowed="min", hop_seconds=0.5,
                           max_clip_seconds=1.0, log_fn=lambda m: None)
    t2 = threading.Thread(target=capped.serve_forever, daemon=True)
    t2.start()
    try:
        (line,) = _client(capped.address, [f"l\t{tmp_path / 'long.wav'}"])
        assert float(line.split("\t")[1]) == pytest.approx(
            expected_logit(tiny_scorer, dlong[:SR]), abs=2e-4)
    finally:
        capped.shutdown()
        t2.join(timeout=30)


def test_socket_server_corrupt_path_zero_fallback(tiny_scorer, tmp_path):
    server = ScoringServer(tiny_scorer, port=0, batch=2,
                           audio_config=AudioConfig(SR, 1), workers=2,
                           max_wait_ms=5, log_fn=lambda m: None)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        (out,) = [_client(server.address,
                          [f"x\t{tmp_path / 'missing.wav'}"])]
        tag, val = out[0].split("\t")
        assert tag == "x"
        # missing file -> zero waveform -> the silence logit, not ERROR
        assert float(val) == pytest.approx(
            expected_logit(tiny_scorer, np.zeros(SR, np.float32)), abs=2e-4)
    finally:
        server.shutdown()
        t.join(timeout=30)


def test_socket_server_hostile_input(tiny_scorer, tmp_path):
    """Protocol hardening: non-UTF-8 bytes score as silence (unloadable
    path -> zero fallback), a newline-less line past the 64 KiB cap drops
    that connection instead of buffering unbounded, and a client that
    disconnects without reading its reply poisons nothing — a legit
    client is served correctly afterwards."""
    server = ScoringServer(tiny_scorer, port=0, batch=2,
                           audio_config=AudioConfig(SR, 1), workers=2,
                           max_wait_ms=5, log_fn=lambda m: None)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        zero_logit = expected_logit(tiny_scorer, np.zeros(SR, np.float32))
        # (1) binary junk on the wire: errors='replace' turns it into an
        # unloadable path, scored as silence — no UnicodeDecodeError
        with socket.create_connection(server.address, timeout=300) as s:
            s.sendall(b"junk\t\xff\xfe\x80bad\n")
            s.shutdown(socket.SHUT_WR)
            reply = s.makefile("r", encoding="utf-8",
                               errors="replace").readline()
        assert reply.startswith("junk\t")
        assert float(reply.split("\t")[1]) == pytest.approx(zero_logit,
                                                            abs=2e-4)
        # (2) an endless line (no newline) is a protocol violation: the
        # server closes the connection instead of buffering it unbounded.
        # Second payload: multibyte UTF-8 — the cap is enforced in BYTES
        # (80 KiB of 4-byte chars is only 20k characters; a text-mode
        # readline(size) would keep buffering it)
        for flood in (b"a" * (80 * 1024),
                      "\N{ROCKET}".encode() * (20 * 1024)):
            with socket.create_connection(server.address, timeout=300) as s:
                try:
                    s.sendall(flood)
                except (BrokenPipeError, ConnectionResetError):
                    pass  # server already dropped us mid-send
                try:
                    got = s.recv(1)
                except (ConnectionResetError, OSError):
                    got = b""
                assert got == b""  # EOF, no reply
        # (3) disconnect without reading the pending reply
        with socket.create_connection(server.address, timeout=300) as s:
            s.sendall(b"gone\t/nonexistent.wav\n")
        # (4) the server still serves a legit client correctly
        w = (0.3 * np.random.default_rng(3).standard_normal(SR)).astype(
            np.float32)
        p = tmp_path / "ok.wav"
        write_wav(p, w, SR)
        dec = AudioLoader(AudioConfig(SR, 1)).load(str(p))
        (line,) = _client(server.address, [f"ok\t{p}"])
        assert float(line.split("\t")[1]) == pytest.approx(
            expected_logit(tiny_scorer, dec), abs=2e-4)
    finally:
        server.shutdown()
        t.join(timeout=30)


def test_socket_client_reset_mid_stream_never_wedges_shutdown(tiny_scorer,
                                                              tmp_path):
    """Review r4 deadlock fix: a client that floods requests and then
    RESETS the connection without reading replies must not wedge the
    connection's writer/submitter/reader pipeline — the writer keeps
    draining out_q after the write error, so the handler threads exit and
    shutdown() returns promptly instead of hanging its 60 s joins."""
    server = ScoringServer(tiny_scorer, port=0, batch=4, max_wait_ms=30,
                           workers=2, log_fn=lambda *_: None)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        s = socket.create_connection(server.address, timeout=60)
        # nonexistent paths score as silence (zero fallback) — cheap, and
        # more lines than out_q's capacity (16 here) so the deadlock
        # would arm: with the bug, the writer exits on the RST, out_q
        # fills, and the submitter/reader block forever
        payload = "".join(f"{tmp_path}/missing_{i:03d}.wav\n"
                          for i in range(24)).encode()
        s.sendall(payload)
        # SO_LINGER(1, 0): close sends RST — subsequent server writes
        # fail while many replies are still queued
        s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                     __import__("struct").pack("ii", 1, 0))
        s.close()

        server.shutdown()
        # the crisp discriminator (wall time is not: the deadlocked
        # handler also 'returns' after shutdown's 60 s join timeout):
        # the handler must have ACTUALLY exited and deregistered itself,
        # which the wedged pipeline never does
        deadline = time.monotonic() + 30
        while server._conns and time.monotonic() < deadline:
            time.sleep(0.2)
        assert not server._conns, (
            "handler threads still blocked after shutdown — the "
            "reset-client drain deadlock is back")
    finally:
        server.request_stop()
        t.join(timeout=10)
