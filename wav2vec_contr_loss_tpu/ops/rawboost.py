"""RawBoost fused on-device (JAX/XLA, jittable, static shapes).

The reference applies RawBoost per clip on the host with scipy inside the
training loop — a device->host->device round trip per step
(reference: stage1_utils.py:53-81), flagged in SURVEY.md §3.1 as a top
fusion target. This module runs the whole augmentation *inside the jitted
train step*: batched FIR design, grouped convolutions on the MXU, per-clip
randomness from split PRNG keys.

Static-shape formulation of the data-dependent pieces
(reference: RawBoost.py:28-56):
  * firwin tap counts c ~ U[10,100] odd-forced are drawn at trace-safe
    runtime; filters live in fixed MAX_TAPS=101 buffers with tail masking,
  * the 5-band notch chain lives in a fixed CHAIN=512 buffer (true max
    length 5*99-4 = 491),
  * the group-delay centering slice becomes a per-clip
    `lax.dynamic_slice` with static size.

ISD noise positions use the reference's exact-subset semantics by default
(`isd_mode='exact'`): exactly floor(T*beta/100) uniformly random positions,
formulated static-shape as argsort of per-position uniforms (a uniform
random permutation) + a scatter of `rank < n` (reference:
RawBoost.py:73-84's `np.random.permutation(x_len)[:n]`).
`isd_mode='bernoulli'` keeps the earlier i.i.d. Bernoulli(beta/100)
approximation (same expected count, no per-clip sort). Everything else
matches the host implementation bit-for-bit given the same uniforms (see
tests/test_rawboost.py).

All filtering runs in fp32 at HIGHEST precision: bf16's 8-bit mantissa
would raise the notch filter's noise floor to ~-48 dB, near the SSI SNR
range, i.e. it would change the augmentation distribution. Measured on a
v5e chip (r2): inside the train step XLA lowers each HIGHEST (32, 80000)
x 511-tap pass to a ~2.3 ms VPU fusion (~14 ms/step for all 6 passes);
a bf16-input MXU conv would save only ~half of that while adding 2.2e-3
(-53 dB) relative rounding error per pass — rejected.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..data.rawboost import RawBoostParams

__all__ = ["rawboost_batch_device", "MAX_TAPS", "CHAIN"]

MAX_TAPS = 101   # c <= 100 odd-forced -> 99; headroom to 101
CHAIN = 512      # >= 5 * 99 - 4 = 491
_FREQZ_N = 1024  # rfft length reproducing scipy.signal.freqz's 512-pt grid


def _firwin_bandstop(c: jnp.ndarray, f1: jnp.ndarray, f2: jnp.ndarray,
                     fs: float) -> jnp.ndarray:
    """scipy.signal.firwin(c, [f1, f2], window='hamming', fs=fs) with
    pass_zero=True (band-stop), for traced odd c <= MAX_TAPS.

    Window-method design: ideal response summed over the passbands
    (0, f1) and (f2, Nyquist), Hamming-windowed, DC-gain normalized.
    Returns a (MAX_TAPS,) buffer, zero beyond c taps.
    """
    nyq = fs / 2.0
    left = f1 / nyq
    right = f2 / nyq
    idx = jnp.arange(MAX_TAPS, dtype=jnp.float32)
    cf = c.astype(jnp.float32)
    m = idx - (cf - 1.0) / 2.0
    live = idx < cf

    # sum over passbands (a, b): h += b*sinc(b*m) - a*sinc(a*m)
    h = left * jnp.sinc(left * m) + jnp.sinc(m) - right * jnp.sinc(right * m)
    window = 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * idx / jnp.maximum(cf - 1.0, 1.0))
    h = jnp.where(live, h * window, 0.0)
    # scale=True: unit response at the first passband's reference freq (DC)
    return h / jnp.sum(h)


def _odd_tap_count(u: jnp.ndarray, p: RawBoostParams) -> jnp.ndarray:
    """c = int(U[min,max]); even -> c+1 (reference: RawBoost.py:33-36)."""
    c = jnp.floor(p.min_coeff + u * (p.max_coeff - p.min_coeff)).astype(jnp.int32)
    return jnp.where(c % 2 == 0, c + 1, c)


def _notch_chain(key: jax.Array, p: RawBoostParams, min_g: float,
                 max_g: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Random nBands-filter notch chain in a (CHAIN,) buffer plus its true
    length (reference: RawBoost.py:28-48)."""
    fs = float(p.sample_rate)
    keys = jax.random.split(key, p.n_bands + 1)

    b = jnp.zeros(CHAIN, jnp.float32).at[0].set(1.0)
    length = jnp.ones((), jnp.int32)
    for i in range(p.n_bands):  # static unroll: n_bands = 5
        u = jax.random.uniform(keys[i], (3,))
        fc = p.min_f + u[0] * (p.max_f - p.min_f)
        bw = p.min_bw + u[1] * (p.max_bw - p.min_bw)
        c = _odd_tap_count(u[2], p)
        f1 = jnp.maximum(fc - bw / 2.0, 1e-3)
        f2 = jnp.minimum(fc + bw / 2.0, fs / 2.0 - 1e-3)
        h = _firwin_bandstop(c, f1, f2, fs)
        # chain = chain (*) h, kept in the fixed buffer
        full = jnp.convolve(b, h, mode="full", precision=jax.lax.Precision.HIGHEST)
        b = full[:CHAIN]
        length = length + c - 1

    g = min_g + jax.random.uniform(keys[-1]) * (max_g - min_g)
    # freqz peak-gain normalization on scipy's 512-point half-band grid
    spec = jnp.abs(jnp.fft.rfft(b, n=_FREQZ_N))[:512]
    b = (10.0 ** (g / 20.0)) * b / jnp.max(spec)
    return b, length


def _fft_size(m: int) -> int:
    """Smallest 2^a * b (b in {1,3,5}) >= m — radices the TPU FFT handles
    without Bluestein."""
    best = None
    for b in (1, 3, 5):
        p = 1
        while b * p < m:
            p <<= 1
        n = b * p
        best = n if best is None or n < best else best
    return best


def _filter_centered(x: jnp.ndarray, b: jnp.ndarray, length: jnp.ndarray,
                     impl: str = "direct") -> jnp.ndarray:
    """Group-delay-centered FIR filtering, output length == input length
    (reference: RawBoost.py:51-56: pad by N=len(b)+1, lfilter, slice
    [N//2 : -N//2]).

    impl='fft': the same linear convolution via zero-padded rfft/irfft
    (n >= t+CHAIN-1, so the circular wrap never reaches the live range) —
    ~6x fewer FLOPs than the direct form at fp32 precision (~1e-6 relative
    rounding, vs the -53 dB that disqualified a bf16 direct conv)."""
    t = x.shape[0]
    if impl == "fft":
        n = _fft_size(t + CHAIN - 1)
        full = jnp.fft.irfft(jnp.fft.rfft(x, n=n) * jnp.fft.rfft(b, n=n),
                             n=n)[: t + CHAIN - 1]
    else:
        full = jnp.convolve(x, b, mode="full",
                            precision=jax.lax.Precision.HIGHEST)
    start = (length + 1) // 2
    return jax.lax.dynamic_slice(full, (start,), (t,))


def _norm_wav(x: jnp.ndarray, always: bool) -> jnp.ndarray:
    peak = jnp.max(jnp.abs(x))
    safe = jnp.maximum(peak, 1e-30)
    if always:
        return x / safe
    return jnp.where(peak > 1.0, x / safe, x)


def _lnl(x: jnp.ndarray, key: jax.Array, p: RawBoostParams) -> jnp.ndarray:
    """Convolutive noise over signal powers (reference: RawBoost.py:59-69)."""
    keys = jax.random.split(key, p.n_f)
    y = jnp.zeros_like(x)
    # the lin/non-lin gain bias kicks in at pass i == 1 and PERSISTS for all
    # later passes (reference: RawBoost.py:62-65 reassigns minG/maxG without
    # restoring them) — the x^3..x^5 terms stay at the biased [-20,-5] dB
    min_g, max_g = p.min_g, p.max_g
    for i in range(p.n_f):  # static unroll: n_f = 5
        if i == 1:
            min_g = p.min_g - p.min_bias_lin_nonlin
            max_g = p.max_g - p.max_bias_lin_nonlin
        b, length = _notch_chain(keys[i], p, min_g, max_g)
        y = y + _filter_centered(jnp.power(x, i + 1), b, length, p.fir_impl)
    y = y - jnp.mean(y)
    return _norm_wav(y, always=False)


def _ssi(x: jnp.ndarray, key: jax.Array, p: RawBoostParams) -> jnp.ndarray:
    """Stationary signal-independent additive noise
    (reference: RawBoost.py:89-97)."""
    k_noise, k_chain, k_snr = jax.random.split(key, 3)
    noise = jax.random.normal(k_noise, x.shape, jnp.float32)
    b, length = _notch_chain(k_chain, p, p.min_g, p.max_g)
    noise = _norm_wav(_filter_centered(noise, b, length, p.fir_impl),
                      always=True)
    snr = p.snr_min + jax.random.uniform(k_snr) * (p.snr_max - p.snr_min)
    scale = (
        jnp.linalg.norm(x) / jnp.maximum(jnp.linalg.norm(noise), 1e-30)
        / 10.0 ** (0.05 * snr)
    )
    return x + noise * scale


def _isd_hit_mask(key: jax.Array, t: int, beta: jnp.ndarray,
                  mode: str) -> jnp.ndarray:
    """(t,) bool noise-position mask. 'exact' (default): a uniformly
    random subset of exactly n = floor(t*beta/100) positions, the
    reference semantics (RawBoost.py:78-79: np.random.permutation(t)[:n])
    in static shape — per-position uniforms, argsort (= uniform random
    permutation), scatter of `position-in-permutation < n`. 'bernoulli':
    the i.i.d. approximation (same expected count, no sort)."""
    if mode == "bernoulli":
        return jax.random.uniform(key, (t,)) < beta / 100.0
    n = jnp.floor(t * beta / 100.0).astype(jnp.int32)
    # Select the n smallest of t random u16 keys — equivalent to taking
    # the first n slots of a uniform random permutation, without a sort:
    # a 16-step bitwise threshold search (each step one compare+reduce
    # pass, ~16x5 MB of traffic at t=80k) finds the maximal thr with
    # count(keys < thr) < n, then a cumsum breaks the threshold-bucket
    # ties by position so the count is EXACTLY n (~1.2 keys/level at
    # 80k draws over 2^16 levels; the first-index tie-break only touches
    # the boundary bucket — bias immeasurable). Measured alternatives at
    # the bs=32 finetune recipe, all exact: argsort+scatter -9.0%
    # (random-index scatters serialize on TPU), double key-value sort
    # -3.3%, f32 sort+cumsum -1.7% (~150 bitonic passes of HBM traffic).
    bits = jax.random.bits(key, (t,), dtype=jnp.uint16)
    pows = (2 ** (15 - jnp.arange(16))).astype(jnp.uint16)

    def step(i, thr):
        cand = thr | pows[i]
        cnt = jnp.sum((bits < cand).astype(jnp.int32))
        return jnp.where(cnt < n, cand, thr)

    thr = jax.lax.fori_loop(0, 16, step, jnp.uint16(0))
    less = bits < thr
    eq = bits == thr
    need = n - jnp.sum(less.astype(jnp.int32))
    eq_rank = jnp.cumsum(eq.astype(jnp.int32))  # inclusive rank among ties
    mask = less | (eq & (eq_rank <= need))
    return jnp.where(n > 0, mask, False)


def _isd(x: jnp.ndarray, key: jax.Array, p: RawBoostParams) -> jnp.ndarray:
    """Impulsive signal-dependent noise (reference: RawBoost.py:73-84);
    position selection per p.isd_mode — see module docstring."""
    k_beta, k_pos, k_f1, k_f2 = jax.random.split(key, 4)
    beta = jax.random.uniform(k_beta) * p.isd_p
    hit = _isd_hit_mask(k_pos, x.shape[0], beta, p.isd_mode)
    f_r = (2.0 * jax.random.uniform(k_f1, x.shape) - 1.0) * (
        2.0 * jax.random.uniform(k_f2, x.shape) - 1.0
    )
    y = jnp.where(hit, x + p.isd_g_sd * x * f_r, x)
    return _norm_wav(y, always=False)


def _augment_one(x: jnp.ndarray, key: jax.Array, p: RawBoostParams,
                 prob: jnp.ndarray) -> jnp.ndarray:
    """Per-utterance policy (reference: stage1_utils.py:60-78): with
    probability `prob` apply LnL, then SSI w.p. 1/2, then ISD w.p. 1/2."""
    k_gate, k_lnl, k_cssi, k_ssi, k_cisd, k_isd = jax.random.split(key, 6)
    y = _lnl(x, k_lnl, p)
    y = jnp.where(jax.random.uniform(k_cssi) < p.ssi_prob, _ssi(y, k_ssi, p), y)
    y = jnp.where(jax.random.uniform(k_cisd) < p.isd_prob, _isd(y, k_isd, p), y)
    return jnp.where(jax.random.uniform(k_gate) < prob, y, x)


@partial(jax.jit, static_argnames=("params",))
def rawboost_batch_device(
    batch: jnp.ndarray,          # (B, T) float32 waveforms, zero-padded
    key: jax.Array,
    prob: jnp.ndarray | float,   # traced scalar: per-utterance apply prob
    params: RawBoostParams = RawBoostParams(),
) -> jnp.ndarray:
    """Batched on-device RawBoost; augmented clips are re-masked by their
    original zero-pad mask (reference: stage1_utils.py:57, 80-81)."""
    batch = batch.astype(jnp.float32)
    pad_mask = (batch != 0.0).astype(jnp.float32)
    keys = jax.random.split(key, batch.shape[0])
    prob = jnp.asarray(prob, jnp.float32)
    out = jax.vmap(lambda x, k: _augment_one(x, k, params, prob))(batch, keys)
    return out * pad_mask
