"""Wav2Vec2 encoder, TPU-native (flax.linen, static shapes, bf16 compute).

Functionally equivalent to HuggingFace's Wav2Vec2Model as used by the
reference (reference: encoder.py:11-70): strided-conv feature extractor ->
feature projection -> convolutional positional embedding -> transformer
stack, exposing all K = num_layers + 1 hidden states.

TPU-first deviations from the HF/torch structure (outputs match numerically;
see tests/test_wav2vec2_parity.py):

  * The transformer stack runs as one `lax.scan` over stacked per-layer
    parameters (one trace, fast compiles, `jax.checkpoint`-friendly).
  * Downstream consumers only ever use the *mean* over the K hidden states
    (reference: compression_module.py:48, extract_encoder_embeddings.py,
    plot_subspace_umap_asv.py:145-151), so the encoder accumulates a
    running layer-sum inside the scan and never materializes the
    (B, K, F, T) stack — a ~K x activation-memory saving. The full stack
    is still available via `return_all_hidden_states=True` for API parity.
  * Attention-mask semantics copied exactly: the waveform mask (inferred as
    `wave != 0` when absent, reference: encoder.py:50-51) is reduced to a
    length, pushed through the conv stride chain, and becomes both a
    zeroing mask on the projected features and a -inf key bias.
  * SpecAugment time-masking (active only while finetuning, as in HF train
    mode) reproduces HF `_compute_mask_indices` semantics in a static-shape
    formulation: per clip, `max(int(p*len/L + u), min_masks)` spans (capped
    to fit), starts sampled without replacement from the valid range —
    distribution-tested against HF's own implementation in
    tests/test_wav2vec2_parity.py; numbers in PARITY.md.

Compute dtype is configurable (bf16 default for training, fp32 for parity
tests); params are always fp32. LayerNorms and softmax run in fp32.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

__all__ = ["Wav2Vec2Config", "Wav2Vec2Encoder", "feature_frame_length",
           "XLSR_300M", "LARGE_960H", "config_to_dict", "config_from_dict"]


@dataclass(frozen=True)
class Wav2Vec2Config:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"     # 'layer' (lv60/XLS-R) | 'group'
    do_stable_layer_norm: bool = True    # pre-LN (lv60/XLS-R) vs post-LN
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    feat_proj_dropout: float = 0.1
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.075
    mask_time_length: int = 10
    mask_time_min_masks: int = 2         # HF floor: >= 2 spans per clip
    dtype: jnp.dtype = jnp.bfloat16      # compute dtype; params stay fp32
    remat: bool = False                  # rematerialize encoder layers
    # 'full' recomputes everything in the bwd pass; 'dots' keeps non-batch
    # matmul outputs resident (dots_with_no_batch_dims_saveable);
    # 'dots_all' additionally keeps the (B,H,T,T) attention matmul outputs
    # (dots_saveable) — cheapest recompute, most memory
    remat_policy: str = "full"
    # rematerialize the conv feature-extractor tower (its ~2 GB of saved
    # bs=64 activations are the HBM margin for large-batch finetuning;
    # no-op when the extractor is frozen)
    remat_conv: bool = False
    # lax.scan unroll factor for the layer stack: >1 trades compile time for
    # removing per-iteration dynamic-slice/update overhead on the stacked
    # params (profiling showed ~10% of step time there at unroll=1)
    scan_unroll: int = 1
    # fuse q/k/v projections into one (D, 3D) matmul (fewer, larger MXU
    # launches); hf_convert concatenates the torch weights to match
    fused_qkv: bool = False
    # 'xla' (einsum attention) | 'pallas' (fused VMEM-resident kernel with
    # hardware-PRNG dropout — removes the (B,H,T,T) HBM round trips that
    # cost ~40% of the finetune step; see ops/attention_pallas.py)
    attention_impl: str = "xla"
    # 'threefry' (jax.random, ~100 int-ops/word) | 'murmur' (counter-based
    # hash, ~10 ops, XLA-fused — measured ~45 ms/step cheaper at the
    # finetune recipe; see ops/fast_dropout.py)
    dropout_impl: str = "threefry"
    # attention score/softmax domain: 'float32' (parity with the reference's
    # fp32 stage-1 math) | 'bfloat16' (halves the (B,H,T,T) HBM traffic in
    # fwd AND in the remat recompute; T<=250 keys keeps bf16 logsumexp error
    # ~1e-3 relative — see tests/test_wav2vec2_parity.py)
    softmax_dtype: str = "float32"
    # running layer-sum accumulator domain: 'float32' (exact K=25 mean) |
    # 'bfloat16' (halves the (B,T,D) carry traffic through all 24 scan
    # iterations and its remat residents)
    layer_mean_dtype: str = "float32"
    # attention score tensor layout: 'bhqk' (head-major, the classic
    # formulation) | 'bqhk' (time-major — q/k/v stay (B,T,H,d) so XLA
    # needn't relayout activations around the score matmuls). Identical
    # values (same contractions/softmax axis); only the XLA layout
    # assignment differs.
    attention_layout: str = "bhqk"
    # Stop gradients at the conv feature extractor during finetuning (the
    # standard HF practice — freeze_feature_encoder()). The reference's
    # freeze is all-or-nothing (encoder.py:24-26), so parity default is
    # False; True skips the conv dW/dX backward entirely.
    freeze_feature_extractor: bool = False
    # conv-extractor LayerNorm implementation: 'xla' (flax) | 'pallas'
    # (fused VMEM LN+GELU fwd/bwd — one HBM pass each way instead of
    # XLA's several over the huge early activations)
    conv_ln_impl: str = "xla"
    # Pipeline parallelism over the layer stack (parallel/pipeline.py):
    # >1 splits the num_layers stack into that many contiguous stages over
    # the mesh 'model' axis (GPipe microbatch schedule via shard_map +
    # ppermute). Requires Wav2Vec2Encoder(mesh=...), num_layers divisible
    # by stages, stages == mesh 'model' size, and is mutually exclusive
    # with tensor parallelism (both consume the 'model' axis). Completes
    # the scaling surface for encoders too large to replicate per chip;
    # the reference has no pipeline story (stage1_utils.py:156-172 is a
    # dead DDP scaffold).
    pipeline_stages: int = 1
    # GPipe microbatches per step (batch must divide): more microbatches
    # shrink the pipeline bubble (stages-1)/(micro+stages-1)
    pipeline_microbatches: int = 2
    # Megatron-style sequence parallelism, expressed purely as GSPMD
    # sharding constraints: the residual stream (B, T', D) between
    # transformer blocks is sharded over ('data', 'model') — frames split
    # across the tensor-parallel axis — so LayerNorm / dropout / residual
    # adds / the layer-mean accumulator run on T/n_model frames per chip
    # and XLA turns each block's Megatron all-reduce into a
    # reduce-scatter + all-gather pair (same bytes, but the elementwise
    # regions' compute and activation residency shrink by n_model).
    # Requires Wav2Vec2Encoder(mesh=...) with a 'model' axis; composes
    # with tensor parallelism (it shards what TP leaves replicated) and
    # is mutually exclusive with pipeline_stages > 1 ('model' carries
    # stages there). No-op on a 'model'=1 mesh. The reference has no
    # sequence story at all (5 s clips, T<=250 — SURVEY.md §2.7).
    sequence_parallel: bool = False
    # int8 quantization of the transformer's Dense matmuls — SERVING ONLY
    # (round() has zero gradient; trainers keep 'none'). 'w8a8' runs the
    # contractions int8 x int8 -> int32 on the MXU (2x bf16 peak on v5e)
    # with dynamic per-token activation scales; 'w8' is weight-only int8
    # (half the weight HBM reads, bf16 accumulation). Param trees come
    # from ops/quant.quantize_encoder_params.
    quant: str = "none"

    def with_(self, **kw) -> "Wav2Vec2Config":
        return dataclasses.replace(self, **kw)

    @property
    def num_hidden_states(self) -> int:
        return self.num_layers + 1


def config_to_dict(cfg: Wav2Vec2Config) -> dict:
    """JSON-serializable architecture dict (checkpoint sidecar)."""
    d = dataclasses.asdict(cfg)
    d["dtype"] = jnp.dtype(cfg.dtype).name
    return d


def config_from_dict(d: dict) -> Wav2Vec2Config:
    d = dict(d)
    d["dtype"] = jnp.dtype(d.get("dtype", "bfloat16"))
    for k in ("conv_dim", "conv_kernel", "conv_stride"):
        if k in d:
            d[k] = tuple(d[k])
    return Wav2Vec2Config(**d)


# facebook/wav2vec2-xls-r-300m — the reference's flagship encoder
XLSR_300M = Wav2Vec2Config()
# facebook/wav2vec2-large-960h — the older post-LN variant
LARGE_960H = Wav2Vec2Config(
    conv_bias=False, feat_extract_norm="group", do_stable_layer_norm=False,
    mask_time_prob=0.05,
)


def feature_frame_length(num_samples: int, config: Wav2Vec2Config) -> int:
    """Waveform samples -> encoder frames through the conv stride chain
    (80,000 samples -> 249 frames for the default config)."""
    n = num_samples
    for k, s in zip(config.conv_kernel, config.conv_stride):
        n = (n - k) // s + 1
    return n


def _frame_lengths(sample_lengths: jnp.ndarray, config: Wav2Vec2Config) -> jnp.ndarray:
    n = sample_lengths
    for k, s in zip(config.conv_kernel, config.conv_stride):
        n = (n - k) // s + 1
    return n


def _time_mask_spans(rng: jax.Array, lengths: jnp.ndarray, t_frames: int,
                     cfg: "Wav2Vec2Config") -> jnp.ndarray:
    """SpecAugment time-mask (B, T') bool, HF `_compute_mask_indices` count
    semantics in static shapes (the reference finetunes through HF's train
    path via encoder.py:21):

      num_spans = max(int(p * len / L + u), min_masks),  u ~ U[0,1)
      capped so num_spans * L <= len and starts fit in [0, len - L];
      starts sampled uniformly WITHOUT replacement from [0, len - L]
      (exact, via sequential insertion — max_spans is tiny and static).
    """
    L = cfg.mask_time_length
    p = cfg.mask_time_prob
    b = lengths.shape[0]
    # static upper bound: floor(p*len/L + u) <= int(p*T/L) + 1
    max_spans = max(cfg.mask_time_min_masks, int(p * t_frames / L) + 1)

    k_eps, k_start = jax.random.split(rng)
    flen = lengths.astype(jnp.float32)
    eps = jax.random.uniform(k_eps, (b,))
    num = jnp.floor(p * flen / L + eps).astype(jnp.int32)
    num = jnp.maximum(num, cfg.mask_time_min_masks)
    num = jnp.minimum(num, lengths // L)                       # spans fit
    num = jnp.minimum(num, jnp.maximum(lengths - (L - 1), 0))  # starts fit

    hi = jnp.maximum(lengths - L + 1, 1).astype(jnp.float32)   # (B,)
    u = jax.random.uniform(k_start, (b, max_spans))
    # without-replacement sampling by sequential insertion: draw the i-th
    # value from a range shrunk by i, then shift it up past every earlier
    # pick — uniform over distinct subsets, like HF's permutation pick.
    # (Ranges clamp to 1 when hi < max_spans; those indices exceed `num`
    # and are masked inactive below, since num <= hi.)
    chosen = []
    for i in range(max_spans):
        x = jnp.floor(u[:, i] * jnp.maximum(hi - i, 1.0)).astype(jnp.int32)
        if chosen:
            prev = jnp.sort(jnp.stack(chosen, axis=1), axis=1)  # (B, i)
            for j in range(i):
                x = x + (x >= prev[:, j]).astype(jnp.int32)
        chosen.append(x)
    starts = jnp.stack(chosen, axis=1)                         # (B, S)
    active = jnp.arange(max_spans)[None, :] < num[:, None]     # (B, S)
    fr = jnp.arange(t_frames)[None, None, :]                   # (1, 1, T')
    spans = (fr >= starts[:, :, None]) & (fr < (starts + L)[:, :, None])
    return jnp.any(spans & active[:, :, None], axis=1)


def _dropout(mod: nn.Module, cfg: "Wav2Vec2Config", x: jnp.ndarray,
             rate: float, deterministic: bool) -> jnp.ndarray:
    """Dropout dispatch: flax/threefry or the fused counter-hash variant."""
    if deterministic or rate <= 0.0:
        return x
    if cfg.dropout_impl == "murmur":
        from ..ops.fast_dropout import murmur_dropout

        return murmur_dropout(x, mod.make_rng("dropout"), rate)
    return nn.Dropout(rate)(x, deterministic=False)


def _linear(cfg: "Wav2Vec2Config", features: int, name: str) -> nn.Module:
    """Transformer Dense factory: fp32-param bf16-matmul Dense, or the
    int8 QuantDense when cfg.quant != 'none' (serving only — ops/quant.py).
    Same param names either way; quantized trees come from
    quantize_encoder_params, so checkpoints always store fp32."""
    if cfg.quant != "none":
        from ..ops.quant import QuantDense

        return QuantDense(features, dtype=cfg.dtype, mode=cfg.quant,
                          name=name)
    return nn.Dense(features, dtype=cfg.dtype, param_dtype=jnp.float32,
                    name=name)


class _LNParams(nn.Module):
    """Bare scale/bias holder reproducing flax LayerNorm's param tree
    (norm{i}/LayerNorm_0/{scale,bias}) for the fused pallas path, so
    checkpoints and HF conversion are impl-agnostic."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones,
                       (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return s, b


class _ConvLayerNorm(nn.Module):
    """LayerNorm over the channel dim of (B, T, C).

    IO follows the compute dtype — the early conv activations are huge
    (bf16[32,15999,512]) and fp32 materialization doubles their HBM
    traffic; flax still computes mean/var in fp32 internally. Matches the
    reference baseline's AMP behavior (torch LayerNorm under autocast).

    impl='pallas' runs the fused VMEM kernel (ops/conv_ln_pallas.py),
    optionally with the following exact GELU folded in (fuse_gelu)."""

    eps: float
    dtype: jnp.dtype
    impl: str = "xla"
    fuse_gelu: bool = False

    @nn.compact
    def __call__(self, x):
        if self.impl == "pallas":
            from ..ops.conv_ln_pallas import fused_ln_gelu

            s, b = _LNParams(x.shape[-1], name="LayerNorm_0")()
            return fused_ln_gelu(x, s, b, self.eps, self.fuse_gelu)
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                            param_dtype=jnp.float32)(x)


class FeatureExtractor(nn.Module):
    """7 strided 1-D convolutions: (B, T_samples) -> (B, T_frames, 512).

    norm variants (reference encoder uses HF configs):
      'layer': LayerNorm after every conv (lv60/XLS-R),
      'group': GroupNorm(C groups) after the first conv only.
    """

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, waveforms: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = waveforms[:, :, None].astype(cfg.dtype)  # (B, T, 1)
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            x = nn.Conv(
                features=dim, kernel_size=(k,), strides=(s,), padding="VALID",
                use_bias=cfg.conv_bias, dtype=cfg.dtype, param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            if cfg.feat_extract_norm == "layer":
                fuse = cfg.conv_ln_impl == "pallas"
                x = _ConvLayerNorm(cfg.layer_norm_eps, cfg.dtype,
                                   impl=cfg.conv_ln_impl, fuse_gelu=fuse,
                                   name=f"norm{i}")(x)
                if fuse:
                    continue  # GELU folded into the kernel
            elif cfg.feat_extract_norm == "group" and i == 0:
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=cfg.layer_norm_eps,
                    dtype=jnp.float32, param_dtype=jnp.float32, name="group_norm",
                )(x.astype(jnp.float32)).astype(cfg.dtype)
            x = jax.nn.gelu(x, approximate=False)
        return x


class FeatureProjection(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        cfg = self.config
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="layer_norm")(x)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, param_dtype=jnp.float32,
                     name="projection")(x.astype(cfg.dtype))
        return _dropout(self, cfg, x, cfg.feat_proj_dropout, deterministic)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding (kernel 128, 16 groups, 'same'-ish
    padding with one-frame trim for even kernels), GELU."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        pad = k // 2
        y = nn.Conv(
            features=cfg.hidden_size, kernel_size=(k,), strides=(1,),
            padding=[(pad, pad)], feature_group_count=cfg.num_conv_pos_embedding_groups,
            use_bias=True, dtype=cfg.dtype, param_dtype=jnp.float32, name="conv",
        )(x.astype(cfg.dtype))
        if k % 2 == 0:
            y = y[:, :-1, :]
        return jax.nn.gelu(y, approximate=False)


class SelfAttention(nn.Module):
    """Multi-head self-attention; bf16 matmuls, fp32 logits + softmax."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_bias: Optional[jnp.ndarray],
                 deterministic: bool) -> jnp.ndarray:
        cfg = self.config
        d, h = cfg.hidden_size, cfg.num_heads
        hd = d // h
        dense = lambda name, feat=d: _linear(cfg, feat, name)
        if cfg.fused_qkv:
            qkv = dense("qkv_proj", 3 * d)(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q * (hd ** -0.5)
        else:
            q = dense("q_proj")(x) * (hd ** -0.5)
            k = dense("k_proj")(x)
            v = dense("v_proj")(x)
        b, t = x.shape[0], x.shape[1]
        q = q.reshape(b, t, h, hd)
        k = k.reshape(b, t, h, hd)
        v = v.reshape(b, t, h, hd)

        if cfg.attention_impl == "pallas":
            from ..ops.attention_pallas import fused_attention

            rate = 0.0 if deterministic else cfg.attention_dropout
            if rate > 0.0:
                rng = self.make_rng("dropout")
                seed = jax.random.randint(rng, (), 0, 2 ** 31 - 1,
                                          dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            to_bhtd = lambda a: a.transpose(0, 2, 1, 3)  # (B, H, T, hd)
            bias2d = (
                key_bias[:, 0, 0, :] if key_bias is not None
                else jnp.zeros((b, t), jnp.float32)
            )
            out = fused_attention(to_bhtd(q), to_bhtd(k), to_bhtd(v), bias2d,
                                  seed, rate, h)
            out = out.transpose(0, 2, 1, 3)
            return dense("out_proj")(out.reshape(b, t, d).astype(cfg.dtype))

        sm_dtype = (cfg.dtype if cfg.softmax_dtype == "bfloat16"
                    else jnp.float32)
        # score layout: 'bqhk' keeps q/k/v time-major so no (B,H,..)
        # relayout copies; values identical — keys are axis -1 either way
        score = ("bqhd,bkhd->bqhk" if cfg.attention_layout == "bqhk"
                 else "bqhd,bkhd->bhqk")
        logits = jnp.einsum(score, q, k, preferred_element_type=sm_dtype)
        if key_bias is not None:
            # (B, 1, 1, T) additive -inf mask (-1e30 is representable in
            # bf16 — same exponent range as fp32); broadcasts over both
            # (B,H,Tq,Tk) and (B,Tq,H,Tk)
            logits = logits + key_bias.astype(sm_dtype)
        probs = jax.nn.softmax(logits, axis=-1)
        # dropout in the compute dtype (the torch-AMP behavior): halves the
        # (B,H,T,T) traffic vs dropping out the fp32 probabilities
        probs = _dropout(self, cfg, probs.astype(cfg.dtype),
                         cfg.attention_dropout, deterministic)
        out = jnp.einsum(score.split("->")[1] + ",bkhd->bqhd", probs, v)
        return dense("out_proj")(out.reshape(b, t, d))


class FeedForward(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        cfg = self.config
        x = _linear(cfg, cfg.intermediate_size, "intermediate_dense")(x)
        # named so remat_policy='dots_ffact' can keep the (B,T,4I) GELU
        # output resident instead of re-running erf in the bwd recompute
        x = checkpoint_name(jax.nn.gelu(x, approximate=False), "ffn_act")
        x = _dropout(self, cfg, x, cfg.activation_dropout, deterministic)
        x = _linear(cfg, cfg.hidden_size, "output_dense")(x)
        return _dropout(self, cfg, x, cfg.hidden_dropout, deterministic)


def _remat_policy(name: str):
    """Checkpoint policy for rematerialized encoder layers.

    'full': recompute everything in bwd (max memory saving);
    'dots': keep non-batch matmul outputs (qkv/out/ff) resident,
      recompute attention scores + softmax + elementwise;
    'dots_all': keep ALL matmul outputs incl. the (B,H,T,T) attention
      products — cheapest recompute, ~60 MB/layer more;
    '*_ffact' variants additionally keep the named FF GELU outputs
      (~65 MB/layer) so bwd skips the erf recompute."""
    return {
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "dots_all": jax.checkpoint_policies.dots_saveable,
        "dots_ffact": jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names("ffn_act"),
        ),
        "dots_all_ffact": jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_saveable,
            jax.checkpoint_policies.save_only_these_names("ffn_act"),
        ),
        "full": None,
    }[name]


class EncoderLayer(nn.Module):
    """One transformer block; `do_stable_layer_norm` picks pre-LN (XLS-R)
    vs post-LN (large-960h) residual placement."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_bias: Optional[jnp.ndarray],
                 deterministic: bool) -> jnp.ndarray:
        cfg = self.config
        # LN IO in compute dtype (stats still fp32 inside flax) — fp32
        # materialization of every (B,T,D) normed activation is pure HBM
        # traffic; params stay fp32
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=cfg.dtype,
                                       param_dtype=jnp.float32, name=name)
        attn = SelfAttention(cfg, name="attention")
        ff = FeedForward(cfg, name="feed_forward")
        drop = lambda y: _dropout(self, cfg, y, cfg.hidden_dropout,
                                  deterministic)
        if cfg.do_stable_layer_norm:
            y = ln("layer_norm")(x)
            x = x + drop(attn(y, key_bias, deterministic))
            y = ln("final_layer_norm")(x)
            return x + ff(y, deterministic)
        x = x + drop(attn(x, key_bias, deterministic))
        x = ln("layer_norm")(x)
        x = x + ff(x, deterministic)
        return ln("final_layer_norm")(x)


class Wav2Vec2Encoder(nn.Module):
    """Full encoder. Returns a dict:

      layer_mean:  (B, T', D) mean of all K = num_layers+1 hidden states —
                   the only quantity downstream consumers use,
      last_hidden: (B, T', D) final hidden state (post final-LN for XLS-R),
      frame_mask:  (B, T') bool validity mask in frame space,
      all_hidden:  (K, B, T', D), only when return_all_hidden_states=True
                   (API parity with the reference's (B,K,F,T) contract,
                   reference: encoder.py:65-68).

    `mesh` is only required (and only consulted) when
    config.pipeline_stages > 1: the GPipe executor shard_maps over the
    mesh's 'model' axis. Everything else is placement-agnostic GSPMD.
    """

    config: Wav2Vec2Config
    mesh: Optional[object] = None  # jax.sharding.Mesh when pipelining

    @nn.compact
    def __call__(
        self,
        waveforms: jnp.ndarray,                      # (B, T_samples)
        attention_mask: Optional[jnp.ndarray] = None,  # (B, T_samples) 0/1
        deterministic: bool = True,
        return_all_hidden_states: bool = False,
    ):
        cfg = self.config
        if attention_mask is None:
            # the reference infers the mask from exact zero samples
            # (reference: encoder.py:50-51)
            attention_mask = (waveforms != 0.0).astype(jnp.int32)

        fx_cls = FeatureExtractor
        if cfg.remat_conv and not cfg.freeze_feature_extractor:
            # the 7-conv tower over 80k samples saves ~2 GB of activations
            # at bs=64 (bf16[B,15999,512] + downstream) — recompute them in
            # the backward instead; that tower is the measured OOM margin
            # for the bs=64 capability row (docs/ARCHITECTURE.md r3).
            # Pointless when the extractor is frozen (stop_gradient already
            # kills its backward).
            fx_cls = nn.remat(
                FeatureExtractor,
                policy=jax.checkpoint_policies.nothing_saveable,
            )
        features = fx_cls(cfg, name="feature_extractor")(waveforms)
        if cfg.freeze_feature_extractor:
            # structural-zero grads for the conv stack: XLA dead-code
            # eliminates its whole backward (dW + dX convs)
            features = jax.lax.stop_gradient(features)
        t_frames = features.shape[1]

        lengths = _frame_lengths(attention_mask.sum(-1).astype(jnp.int32), cfg)
        frame_idx = jnp.arange(t_frames)[None, :]
        frame_mask = frame_idx < lengths[:, None]    # (B, T')

        hidden = FeatureProjection(cfg, name="feature_projection")(
            features, deterministic
        )

        # SpecAugment time masking — active only in train mode, as in HF.
        # The param is created unconditionally so init() in eval mode still
        # produces a complete tree (checkpoint/convert stability).
        masked_embed = self.param(
            "masked_spec_embed", nn.initializers.uniform(scale=1.0),
            (cfg.hidden_size,), jnp.float32,
        ) if cfg.apply_spec_augment else None
        if masked_embed is not None and not deterministic and cfg.mask_time_prob > 0:
            rng = self.make_rng("dropout")
            span = _time_mask_spans(rng, lengths, t_frames, cfg) & frame_mask
            hidden = jnp.where(span[:, :, None],
                               masked_embed.astype(hidden.dtype), hidden)

        # zero padded positions, then the -inf key bias (HF semantics)
        hidden = hidden * frame_mask[:, :, None].astype(hidden.dtype)
        key_bias = jnp.where(frame_mask, 0.0, -1e30).astype(jnp.float32)
        key_bias = key_bias[:, None, None, :]        # (B, 1, 1, T')

        hidden = hidden + PositionalConvEmbedding(cfg, name="pos_conv_embed")(hidden)
        if not cfg.do_stable_layer_norm:
            hidden = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                param_dtype=jnp.float32, name="encoder_layer_norm",
            )(hidden).astype(cfg.dtype)
        hidden = _dropout(self, cfg, hidden, cfg.hidden_dropout, deterministic)

        # ---- sequence parallelism (GSPMD constraints on the residual
        # stream; see the config-field comment) ----
        if cfg.sequence_parallel and cfg.pipeline_stages > 1:
            raise ValueError(
                "sequence_parallel shards frames over the 'model' axis, "
                "which pipeline_stages > 1 uses for GPipe stages — pick one")
        if cfg.sequence_parallel and not self.is_initializing():
            if self.mesh is None:
                raise ValueError(
                    "sequence_parallel requires Wav2Vec2Encoder(mesh=...) "
                    "so the (B, T', D) residual stream can be constrained "
                    "over the mesh ('data', 'model') axes")
            from jax.sharding import NamedSharding, PartitionSpec

            _sp_sharding = NamedSharding(
                self.mesh, PartitionSpec("data", "model"))

            def sp_constrain(y):
                return jax.lax.with_sharding_constraint(y, _sp_sharding)
        else:
            def sp_constrain(y):
                return y
        hidden = sp_constrain(hidden)

        # ---- transformer stack as one scan over stacked layer params ----
        collect_all = return_all_hidden_states

        class _Body(nn.Module):
            """Scan body: one encoder layer + running hidden-state sum.
            key_bias / deterministic are closure-captured so the remat
            wrapper only ever sees array arguments."""

            cfg_inner: Wav2Vec2Config

            @nn.compact
            def __call__(self, carry, _):
                h, acc = carry
                # sp: re-pin the carry to the frame-sharded layout each
                # layer so the LN/dropout/residual regions stay local and
                # XLA closes each block with reduce-scatter, not all-reduce
                h_out = sp_constrain(EncoderLayer(self.cfg_inner, name="layer")(
                    h, key_bias, deterministic
                ))
                acc = acc + h_out.astype(acc.dtype)
                ys = h_out if collect_all else 0
                return (h_out, acc), ys

        if cfg.remat:
            body_cls = nn.remat(_Body, prevent_cse=False,
                                policy=_remat_policy(cfg.remat_policy))
        else:
            body_cls = _Body
        ScanBody = nn.scan(
            body_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_layers,
            unroll=max(1, min(cfg.scan_unroll, cfg.num_layers)),
        )
        acc_dtype = (cfg.dtype if cfg.layer_mean_dtype == "bfloat16"
                     else jnp.float32)
        acc0 = hidden.astype(acc_dtype)
        if cfg.pipeline_stages > 1 and not self.is_initializing():
            # GPipe pipeline over the 'model' mesh axis. Init always takes
            # the scan path (creates the identical stacked param tree);
            # apply reads that tree and drives the layers functionally.
            if return_all_hidden_states:
                raise ValueError(
                    "return_all_hidden_states is unsupported with "
                    "pipeline_stages > 1 (the full (K,B,T,D) stack would "
                    "have to ride the pipe)")
            h_last, layer_sum = self._pipelined_stack(
                hidden, key_bias, deterministic, acc_dtype)
            acc, ys = acc0 + layer_sum, None
        else:
            (h_last, acc), ys = ScanBody(cfg, name="layers")(
                (hidden, acc0), jnp.arange(cfg.num_layers)
            )

        if cfg.do_stable_layer_norm:
            final = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                param_dtype=jnp.float32, name="encoder_layer_norm",
            )(h_last)
            # hidden-state list = [h0, out_0..out_22, LN(out_23)]:
            # swap the raw last layer output for its post-LN version
            acc = acc - h_last.astype(acc.dtype) + final.astype(acc.dtype)
            last_hidden = final.astype(cfg.dtype)
        else:
            last_hidden = h_last

        out = {
            # always fp32 to downstream consumers; accumulation precision
            # is cfg.layer_mean_dtype
            "layer_mean": (acc / cfg.num_hidden_states).astype(jnp.float32),
            "last_hidden": last_hidden,
            "frame_mask": frame_mask,
        }
        if return_all_hidden_states:
            first = hidden.astype(jnp.float32)[None]
            stack = ys.astype(jnp.float32)
            if cfg.do_stable_layer_norm:
                stack = stack.at[-1].set(last_hidden.astype(jnp.float32))
            out["all_hidden"] = jnp.concatenate([first, stack], axis=0)
        return out

    def _pipelined_stack(self, hidden, key_bias, deterministic, acc_dtype):
        """Run the transformer stack as a GPipe pipeline (apply-time only).

        Reads the scan-created stacked params via `self.variables` and
        drives EncoderLayer functionally per stage — the param tree, and
        therefore checkpoints and HF conversion, are identical to the scan
        path. Dropout masks decorrelate across (layer, microbatch) via
        per-pair derived keys (they do NOT reproduce the scan path's
        split_rngs stream — pipeline training is its own rng schedule, like
        any resharding of a stochastic program)."""
        cfg = self.config
        if self.mesh is None:
            raise ValueError(
                "pipeline_stages > 1 requires Wav2Vec2Encoder(mesh=...) "
                "with a mesh whose 'model' axis has exactly "
                f"{cfg.pipeline_stages} devices")
        n_model = dict(self.mesh.shape).get("model", 1)
        if n_model != cfg.pipeline_stages:
            raise ValueError(
                f"pipeline_stages={cfg.pipeline_stages} != mesh 'model' "
                f"axis size {n_model}")
        stacked = self.variables["params"]["layers"]["layer"]

        L, M = cfg.num_layers, cfg.pipeline_microbatches
        needs_rng = (not deterministic) and (
            cfg.hidden_dropout > 0 or cfg.attention_dropout > 0
            or cfg.activation_dropout > 0)
        if needs_rng:
            keys = jax.random.split(self.make_rng("dropout"), L * M)
            if jax.dtypes.issubdtype(keys.dtype, jax.dtypes.prng_key):
                keys = jax.random.key_data(keys)  # raw uint32 rides the pipe
            layer_rngs = keys.reshape(L, M, *keys.shape[1:])
        else:
            layer_rngs = None

        def layer_fn(p_l, h, kb, rng_l):
            rngs = None if rng_l is None else {"dropout": rng_l}
            return EncoderLayer(cfg).apply(
                {"params": p_l}, h, kb, deterministic, rngs=rngs)

        if cfg.remat:
            layer_fn = jax.checkpoint(
                layer_fn, policy=_remat_policy(cfg.remat_policy),
                prevent_cse=False)

        from ..parallel.pipeline import gpipe_stack

        return gpipe_stack(
            layer_fn, stacked, hidden, key_bias, layer_rngs,
            mesh=self.mesh, n_micro=M, sum_dtype=acc_dtype)
