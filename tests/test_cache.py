"""Decode-once waveform cache (data/cache.py): cached batches match
decoded batches, stale fingerprints rebuild, corruption keeps the
zero-fallback contract, and unknown paths fall through to real decode.
"""

import json
import os

import numpy as np
import pytest

from wav2vec_contr_loss_tpu.data import AudioConfig, BatchPipeline, parse_asvspoof2019
from wav2vec_contr_loss_tpu.data.audio import write_wav
from wav2vec_contr_loss_tpu.data.cache import attach_cache, build_cache

SR = 16000


@pytest.fixture()
def corpus(tmp_path):
    root = tmp_path / "corpus"
    root.mkdir()
    rng = np.random.default_rng(5)
    lines = []
    for i in range(12):
        name = f"c{i:03d}.wav"
        if i % 2 == 0:
            x = 0.3 * np.sin(2 * np.pi * 300 * np.arange(SR) / SR)
        else:
            x = 0.1 * rng.standard_normal(SR)
        write_wav(root / name, x.astype(np.float32), SR)
        label = "bonafide" if i % 2 == 0 else "spoof"
        attack = "-" if i % 2 == 0 else "A01"
        lines.append(f"x/{name} {attack} {label} - SPK{i % 2}")
    # one corrupted file exercising the zero-fallback contract
    (root / "bad.wav").write_bytes(b"not a wav")
    lines.append("x/bad.wav A02 spoof - SPK0")
    (root / "protocol.txt").write_text("\n".join(lines) + "\n")
    return root


def make_ds(root):
    return parse_asvspoof2019(str(root / "protocol.txt"), str(root),
                              num_samples=None, audio=AudioConfig(SR, 1))


def test_cached_batches_match_decoded(corpus, tmp_path):
    """PCM-sourced, unresampled audio round-trips the int16 cache EXACTLY,
    so cached pipelines produce bit-identical batches."""
    plain = make_ds(corpus)
    cached = make_ds(corpus)
    built = attach_cache(cached, str(tmp_path / "cache"))
    assert built
    a = list(BatchPipeline(plain, 4, seed=3, num_workers=2).train_epoch(1))
    b = list(BatchPipeline(cached, 4, seed=3, num_workers=2).train_epoch(1))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x.waveforms, y.waveforms)
        assert np.array_equal(x.labels, y.labels)


def test_float32_cache_bit_exact(corpus, tmp_path):
    ds = make_ds(corpus)
    ref = [ds.loader.load(u.path) for u in ds.utterances]
    attach_cache(ds, str(tmp_path / "c32"), dtype="float32")
    for u, r in zip(ds.utterances, ref):
        assert np.array_equal(ds.loader.load(u.path), r)


def test_corrupted_rows_are_zero(corpus, tmp_path):
    ds = make_ds(corpus)
    attach_cache(ds, str(tmp_path / "cache"))
    bad = [u for u in ds.utterances if "bad" in str(u.path)][0]
    assert not ds.loader.load(bad.path).any()


def test_reuse_and_stale_rebuild(corpus, tmp_path):
    cdir = str(tmp_path / "cache")
    ds = make_ds(corpus)
    assert attach_cache(ds, cdir) is True
    # identical corpus/config: reuse, no rebuild
    ds2 = make_ds(corpus)
    assert attach_cache(ds2, cdir) is False
    # different clip length: fingerprint mismatch -> rebuild
    ds3 = parse_asvspoof2019(str(corpus / "protocol.txt"), str(corpus),
                             num_samples=4, audio=AudioConfig(SR, 2))
    assert attach_cache(ds3, cdir) is True
    assert ds3.loader.load(ds3.utterances[0].path).shape == (2 * SR,)
    # manifest survives as valid json
    with open(os.path.join(cdir, "cache_manifest.json")) as f:
        m = json.load(f)
    assert m["num_samples"] == 2 * SR


def test_unknown_path_falls_back_to_decode(corpus, tmp_path):
    ds = make_ds(corpus)
    attach_cache(ds, str(tmp_path / "cache"))
    extra = corpus / "extra.wav"
    x = 0.2 * np.sin(2 * np.pi * 440 * np.arange(SR) / SR)
    write_wav(extra, x.astype(np.float32), SR)
    w = ds.loader.load(extra)
    assert w.shape == (SR,) and w.any()


def test_rebuild_crash_between_replaces_invalidates(corpus, tmp_path,
                                                    monkeypatch):
    """A rebuild killed between the data swap and the manifest write must
    leave NO valid manifest: the old manifest paired with the new rows
    would silently serve the wrong audio (review r3 finding)."""
    from wav2vec_contr_loss_tpu.data import cache as cache_mod

    cdir = str(tmp_path / "cache")
    ds = make_ds(corpus)
    attach_cache(ds, cdir)  # initial build: valid manifest on disk

    ds3 = parse_asvspoof2019(str(corpus / "protocol.txt"), str(corpus),
                             num_samples=4, audio=AudioConfig(SR, 2))
    real_replace = os.replace

    def crash_after_data_swap(src, dst):
        real_replace(src, dst)
        if dst.endswith("waveforms.npy"):
            raise RuntimeError("simulated crash after data swap")

    monkeypatch.setattr(cache_mod.os, "replace", crash_after_data_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_cache(ds3, cdir, dtype="int16")
    monkeypatch.undo()
    # the stale manifest must be GONE, so the original corpus rebuilds
    # instead of reading ds3's rows through its old manifest
    assert not os.path.exists(os.path.join(cdir, "cache_manifest.json"))
    ds4 = make_ds(corpus)
    assert attach_cache(ds4, cdir) is True
    ref = make_ds(corpus)
    for u in ds4.utterances:
        assert np.array_equal(ds4.loader.load(u.path), ref.loader.load(u.path))


def test_cache_hits_keep_loader_accounting(corpus, tmp_path):
    """Cache-row reads count as successful loads (print_summary /
    cli.serve's 'decode ok=' line must not read 0 under a cache)."""
    from wav2vec_contr_loss_tpu.data.audio import AudioLoader

    ds = make_ds(corpus)
    attach_cache(ds, str(tmp_path / "cache"))
    AudioLoader.reset_counters()
    for u in ds.utterances:
        ds.loader.load(u.path)
    assert AudioLoader.loaded_count == len(ds.utterances)


def test_variable_length_rejected(corpus):
    ds = parse_asvspoof2019(str(corpus / "protocol.txt"), str(corpus),
                            num_samples=None, audio=AudioConfig(SR, None))
    with pytest.raises(ValueError, match="fixed-length"):
        build_cache(ds, "/tmp/never_used_cache")
