"""RawBoost parity tests.

Host (numpy) implementation: exact-draw parity against the reference
RawBoost.py (imported at test time, never copied) using a shim that routes
our explicit-Generator calls through numpy's legacy global RandomState in
the reference's draw order.

Device (JAX) implementation: deterministic pieces (firwin design, centered
FIR, normalization) checked against scipy/host exactly; the stochastic
pipeline checked for shape/determinism/masking invariants.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from wav2vec_contr_loss_tpu.data import rawboost as rb

T = 16000  # 1 s clips keep these tests fast


class LegacyShim:
    """np.random.Generator-compatible facade over the legacy global
    RandomState, so our implementation consumes the exact same draws as the
    reference's np.random.* calls."""

    def uniform(self, low=0.0, high=1.0, size=None):
        out = np.random.uniform(low, high, size=(1,) if size is None else size)
        return float(out[0]) if size is None else out

    def random(self, size=None):
        return np.random.rand(*((size,) if np.isscalar(size) else (size or ())))

    def permutation(self, n):
        return np.random.permutation(n)

    def standard_normal(self, size=None):
        return np.random.normal(0, 1, size)


@pytest.fixture(scope="module")
def ref_rawboost():
    path = "/root/reference/RawBoost.py"
    if not os.path.exists(path):
        pytest.skip("reference repo not mounted")
    spec = importlib.util.spec_from_file_location("ref_rawboost", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_rawboost"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def clip(rng):
    x = 0.4 * np.sin(2 * np.pi * 220 * np.arange(T) / 16000)
    x += 0.05 * rng.standard_normal(T)
    return x.astype(np.float64)


PARAMS = rb.RawBoostParams()


def test_notch_chain_matches_reference(ref_rawboost):
    np.random.seed(7)
    b_ref = ref_rawboost.genNotchCoeffs(
        nBands=5, minF=20.0, maxF=8000.0, minBW=100.0, maxBW=1000.0,
        minCoeff=10, maxCoeff=100, minG=0.0, maxG=0.0, fs=16000,
    )
    np.random.seed(7)
    b_ours = rb.gen_notch_coeffs(LegacyShim(), PARAMS, 0.0, 0.0)
    np.testing.assert_allclose(b_ours, b_ref, rtol=1e-12, atol=1e-15)


def test_filter_and_norm_match_reference(ref_rawboost, clip):
    np.random.seed(3)
    b = rb.gen_notch_coeffs(LegacyShim(), PARAMS, 0.0, 0.0)
    np.testing.assert_allclose(
        rb.filter_fir(clip, b), ref_rawboost.filterFIR(clip, b), atol=1e-12
    )
    loud = clip * 5
    np.testing.assert_allclose(rb.norm_wav(loud.copy(), False),
                               ref_rawboost.normWav(loud.copy(), 0))
    np.testing.assert_allclose(rb.norm_wav(clip.copy(), True),
                               ref_rawboost.normWav(clip.copy(), 1))
    # quiet signal, always=False -> untouched
    np.testing.assert_array_equal(rb.norm_wav(clip.copy(), False), clip)


def test_lnl_matches_reference(ref_rawboost, clip):
    np.random.seed(11)
    y_ref = ref_rawboost.LnL_convolutive_noise(
        clip, N_f=5, nBands=5, minF=20.0, maxF=8000.0, minBW=100.0,
        maxBW=1000.0, minCoeff=10, maxCoeff=100, minG=0.0, maxG=0.0,
        minBiasLinNonLin=5.0, maxBiasLinNonLin=20.0, fs=16000,
    )
    np.random.seed(11)
    y_ours = rb.lnl_convolutive_noise(clip, LegacyShim(), PARAMS)
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-12)


def test_isd_matches_reference(ref_rawboost, clip):
    np.random.seed(13)
    y_ref = ref_rawboost.ISD_additive_noise(clip.copy(), P=10.0, g_sd=2.0)
    np.random.seed(13)
    y_ours = rb.isd_additive_noise(clip, LegacyShim(), PARAMS)
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-12)


def test_ssi_matches_reference(ref_rawboost, clip):
    np.random.seed(17)
    y_ref = ref_rawboost.SSI_additive_noise(
        clip, SNRmin=10.0, SNRmax=40.0, nBands=5, minF=20.0, maxF=8000.0,
        minBW=100.0, maxBW=1000.0, minCoeff=10, maxCoeff=100,
        minG=0.0, maxG=0.0, fs=16000,
    )
    np.random.seed(17)
    y_ours = rb.ssi_additive_noise(clip, LegacyShim(), PARAMS)
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-12)


def test_batch_masking_and_determinism(clip):
    batch = np.stack([clip, np.zeros(T)]).astype(np.float32)
    batch[0, -4000:] = 0.0  # simulated zero padding
    g1 = np.random.default_rng(5)
    g2 = np.random.default_rng(5)
    out1 = rb.apply_rawboost_batch(batch, g1, PARAMS, prob=1.0)
    out2 = rb.apply_rawboost_batch(batch, g2, PARAMS, prob=1.0)
    np.testing.assert_array_equal(out1, out2)
    assert np.all(out1[0, -4000:] == 0.0)  # pad mask preserved
    assert np.all(out1[1] == 0.0)          # all-zero clip stays zero
    assert not np.allclose(out1[0, :1000], batch[0, :1000])  # actually augmented
    # prob=0 -> identity
    out3 = rb.apply_rawboost_batch(batch, np.random.default_rng(5), PARAMS, prob=0.0)
    np.testing.assert_array_equal(out3, batch)


# ------------------------------------------------------------- device path
def test_device_firwin_matches_scipy():
    import jax.numpy as jnp
    from scipy import signal as sp
    from wav2vec_contr_loss_tpu.ops import rawboost as rbd

    for c, f1, f2 in [(11, 300.0, 900.0), (51, 20.0, 1200.0), (99, 4000.0, 7999.999)]:
        ours = np.asarray(
            rbd._firwin_bandstop(jnp.asarray(c), jnp.asarray(f1), jnp.asarray(f2), 16000.0)
        )
        want = sp.firwin(c, [f1, f2], window="hamming", fs=16000)
        np.testing.assert_allclose(ours[:c], want, atol=1e-5)  # fp32 design
        assert np.all(ours[c:] == 0.0)


def test_device_filter_centered_matches_host(clip):
    import jax.numpy as jnp
    from wav2vec_contr_loss_tpu.ops import rawboost as rbd

    np.random.seed(23)
    b = rb.gen_notch_coeffs(LegacyShim(), PARAMS, 0.0, 0.0)
    want = rb.filter_fir(clip, b)
    buf = np.zeros(rbd.CHAIN)
    buf[: b.size] = b
    got = np.asarray(
        rbd._filter_centered(
            jnp.asarray(clip, jnp.float32), jnp.asarray(buf, jnp.float32),
            jnp.asarray(b.size, jnp.int32),
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_device_lnl_gain_schedule_matches_host(clip, monkeypatch):
    """The lin/non-lin gain bias kicks in at pass i==1 and PERSISTS for all
    later passes (reference: RawBoost.py:62-65). Round-1 device code reset
    it for i>=2, leaving the x^3..x^5 distortion 5-20 dB louder than the
    reference (ADVICE.md high). The (min_g, max_g) arguments are trace-time
    Python floats, so we can capture the exact schedule on both paths."""
    import jax
    import jax.numpy as jnp
    from wav2vec_contr_loss_tpu.ops import rawboost as rbd

    dev_calls = []
    real_chain = rbd._notch_chain

    def spy_chain(key, p, min_g, max_g):
        dev_calls.append((float(min_g), float(max_g)))
        return real_chain(key, p, min_g, max_g)

    monkeypatch.setattr(rbd, "_notch_chain", spy_chain)
    rbd._lnl(jnp.asarray(clip, jnp.float32), jax.random.PRNGKey(0), PARAMS)

    host_calls = []
    real_gen = rb.gen_notch_coeffs

    def spy_gen(rng, p, min_g, max_g):
        host_calls.append((float(min_g), float(max_g)))
        return real_gen(rng, p, min_g, max_g)

    monkeypatch.setattr(rb, "gen_notch_coeffs", spy_gen)
    rb.lnl_convolutive_noise(clip, np.random.default_rng(0), PARAMS)

    assert len(dev_calls) == len(host_calls) == PARAMS.n_f
    assert dev_calls == host_calls
    # and the schedule is the reference's: unbiased once, then biased forever
    assert host_calls == [(0.0, 0.0)] + [(-5.0, -20.0)] * (PARAMS.n_f - 1)


def test_device_batch_invariants(clip):
    import jax
    from wav2vec_contr_loss_tpu.ops import rawboost as rbd

    batch = np.stack([clip, clip, np.zeros(T)]).astype(np.float32)
    batch[0, -4000:] = 0.0
    key = jax.random.PRNGKey(0)
    out = np.asarray(rbd.rawboost_batch_device(batch, key, 1.0, PARAMS))
    assert out.shape == batch.shape
    assert np.all(np.isfinite(out))
    assert np.all(out[0, -4000:] == 0.0)
    assert np.all(out[2] == 0.0)
    assert not np.allclose(out[0, :1000], batch[0, :1000])
    # clips 0 and 1 share input but use different per-clip keys
    assert not np.allclose(out[0, :79000], out[1, :79000] * (batch[0,:79000]!=0))
    # deterministic given the key
    out2 = np.asarray(rbd.rawboost_batch_device(batch, key, 1.0, PARAMS))
    np.testing.assert_array_equal(out, out2)
    # prob=0 -> identity (masked)
    out3 = np.asarray(rbd.rawboost_batch_device(batch, key, 0.0, PARAMS))
    np.testing.assert_allclose(out3, batch * (batch != 0), atol=0)


def test_fft_fir_matches_direct(clip):
    """fir_impl='fft' computes the same linear convolution as the direct
    path: (a) the centered filter itself to fp32-FFT rounding, (b) the full
    stochastic device pipeline under identical keys."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from wav2vec_contr_loss_tpu.ops import rawboost as rbd

    np.random.seed(31)
    b = rb.gen_notch_coeffs(LegacyShim(), PARAMS, 0.0, 0.0)
    buf = np.zeros(rbd.CHAIN, np.float32)
    buf[: b.size] = b
    x = jnp.asarray(clip, jnp.float32)
    direct = np.asarray(rbd._filter_centered(
        x, jnp.asarray(buf), jnp.asarray(b.size, np.int32), "direct"))
    fft = np.asarray(rbd._filter_centered(
        x, jnp.asarray(buf), jnp.asarray(b.size, np.int32), "fft"))
    scale = np.abs(direct).max() + 1e-12
    assert np.abs(fft - direct).max() / scale < 1e-4, \
        np.abs(fft - direct).max() / scale

    batch = jnp.asarray(
        np.stack([clip, np.roll(clip, 777)]).astype(np.float32))
    key = jax.random.PRNGKey(5)
    p_fft = dataclasses.replace(PARAMS, fir_impl="fft")
    out_d = np.asarray(rbd.rawboost_batch_device(batch, key, 1.0, PARAMS))
    out_f = np.asarray(rbd.rawboost_batch_device(batch, key, 1.0, p_fft))
    scale = np.abs(out_d).max() + 1e-12
    assert np.abs(out_f - out_d).max() / scale < 5e-4, \
        np.abs(out_f - out_d).max() / scale


def test_isd_exact_mask_count_and_uniformity():
    """isd_mode='exact' (the default) must reproduce the reference's ISD
    position semantics (reference: RawBoost.py:78-79): exactly
    n = floor(T*beta/100) positions, a uniformly random subset. Checks the
    exact count over randomized beta (incl. edge betas) and that positions
    are not structurally biased (mean position near T/2)."""
    import jax
    import jax.numpy as jnp
    from wav2vec_contr_loss_tpu.ops import rawboost as rbd

    t = 8000
    mask_fn = jax.jit(
        lambda k, beta, mode: rbd._isd_hit_mask(k, t, beta, mode),
        static_argnames=("mode",))
    rng = np.random.default_rng(7)
    centers = []
    for i, beta in enumerate(
            list(rng.uniform(0.0, 10.0, size=12)) + [0.0, 10.0, 0.009]):
        key = jax.random.PRNGKey(i)
        m = np.asarray(mask_fn(key, jnp.float32(beta), "exact"))
        n_expect = int(t * (beta / 100.0))  # the reference's int() truncation
        assert m.sum() == n_expect, (beta, m.sum(), n_expect)
        if n_expect > 50:
            centers.append(np.mean(np.nonzero(m)[0]))
    assert centers, "no informative beta draws — widen the range"
    # uniform subset -> mean position concentrates near t/2
    assert abs(np.mean(centers) - t / 2) < 0.05 * t, np.mean(centers)

    # the bernoulli fallback flag still works and is key-deterministic
    mb = np.asarray(mask_fn(jax.random.PRNGKey(3), jnp.float32(5.0),
                            "bernoulli"))
    mb2 = np.asarray(mask_fn(jax.random.PRNGKey(3), jnp.float32(5.0),
                             "bernoulli"))
    np.testing.assert_array_equal(mb, mb2)
    assert abs(mb.sum() - t * 0.05) < 4 * np.sqrt(t * 0.05)


def test_isd_exact_changes_exactly_n_samples(clip):
    """End-to-end through _isd: with a zero-free clip and |y|<1 (so
    norm_wav is the identity), exactly n samples may differ from the
    input (a measure-zero f_r==0 draw could reduce the count; the seeds
    here produce none)."""
    import jax
    import jax.numpy as jnp
    from wav2vec_contr_loss_tpu.ops import rawboost as rbd

    x = jnp.asarray(0.2 + 0.1 * np.sin(np.arange(T) / 50.0), jnp.float32)
    isd = jax.jit(lambda k: rbd._isd(x, k, PARAMS))
    for seed in range(3):
        y = np.asarray(isd(jax.random.PRNGKey(seed)))
        changed = int((y != np.asarray(x)).sum())
        # recover n from the same key schedule the op uses
        k_beta = jax.random.split(jax.random.PRNGKey(seed), 4)[0]
        beta = float(jax.random.uniform(k_beta)) * PARAMS.isd_p
        assert changed == int(T * beta / 100.0), (seed, changed)
