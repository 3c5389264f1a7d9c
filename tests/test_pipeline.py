"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-CPU mesh.

The GPipe executor must be a pure re-scheduling: forward values and
gradients match the single-program `lax.scan` stack to float tolerance
(only the layer-sum association order differs), for any microbatch count,
with and without remat, composed with data parallelism, and end-to-end
through a Stage1Trainer train step (`param_sharding='pp'`).

The reference has no pipeline story (its parallelism is the dead NCCL DDP
scaffold, reference: stage1_utils.py:156-172) — this is framework-side
scaling surface beyond the reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from wav2vec_contr_loss_tpu.config import Stage1Config
from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from wav2vec_contr_loss_tpu.parallel import batch_sharding, make_mesh
from wav2vec_contr_loss_tpu.parallel.pipeline import gpipe_stack
from wav2vec_contr_loss_tpu.train import Stage1Trainer

ENC4 = Wav2Vec2Config(
    hidden_size=32, num_layers=4, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    dtype=jnp.float32, apply_spec_augment=False,
    hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
)


def _wave(b=4, t=4000, seed=0):
    return np.random.default_rng(seed).normal(0, 0.2, (b, t)).astype(np.float32)


# --------------------------------------------------------- bare executor

def test_gpipe_stack_toy_linear():
    """Executor semantics in isolation: elementwise 'layers' h -> h*w give
    prod(w) through the pipe, the layer-sum matches the running-sum, and
    the gradient agrees with the dense formula."""
    mesh = make_mesh(n_model=2)  # 4 x 2
    L, D, B = 4, 3, 8
    W = jnp.arange(1, L * D + 1, dtype=jnp.float32).reshape(L, D) / (L * D)
    x = jnp.asarray(np.random.default_rng(0).normal(1, 0.1, (B, D)),
                    jnp.float32)

    def layer_fn(w, h, _consts, _rng):
        return h * w

    def run(W):
        h, s = gpipe_stack(layer_fn, W, x, jnp.zeros((B, 1)), None,
                           mesh=mesh, n_micro=2)
        return h, s

    h, s = run(W)
    ref_h = x * jnp.prod(W, axis=0)
    ref_s = sum(x * jnp.prod(W[: i + 1], axis=0) for i in range(L))
    np.testing.assert_allclose(h, ref_h, rtol=1e-6)
    np.testing.assert_allclose(s, ref_s, rtol=1e-6)

    g = jax.grad(lambda W: run(W)[0].sum())(W)
    g_ref = jax.grad(lambda W: (x * jnp.prod(W, axis=0)).sum())(W)
    np.testing.assert_allclose(g, g_ref, rtol=1e-6)


def test_gpipe_stack_validation():
    mesh = make_mesh(n_model=2)
    x = jnp.ones((4, 3))
    W3 = jnp.ones((3, 3))  # 3 layers don't divide 2 stages
    fn = lambda w, h, c, r: h * w
    with pytest.raises(ValueError, match="not divisible"):
        gpipe_stack(fn, W3, x, 0.0, None, mesh=mesh, n_micro=2)
    W4 = jnp.ones((4, 3))
    with pytest.raises(ValueError, match="batch 4 not divisible"):
        gpipe_stack(fn, W4, x, 0.0, None, mesh=mesh, n_micro=3)
    with pytest.raises(ValueError, match="no 'pipe' axis"):
        gpipe_stack(fn, W4, x, 0.0, None, mesh=mesh, n_micro=2, axis="pipe")


# ------------------------------------------------------- encoder parity

@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pp_encoder_forward_matches_scan(n_micro):
    """Same params, same input: the pipelined encoder must reproduce the
    scanned encoder (deterministic, fp32)."""
    mesh = make_mesh(n_model=2)
    wave = jnp.asarray(_wave())
    base = Wav2Vec2Encoder(ENC4)
    params = base.init(jax.random.PRNGKey(0), wave)["params"]
    ref = base.apply({"params": params}, wave)

    pp_cfg = ENC4.with_(pipeline_stages=2, pipeline_microbatches=n_micro)
    pp = Wav2Vec2Encoder(pp_cfg, mesh=mesh)
    out = jax.jit(lambda p, w: pp.apply({"params": p}, w))(params, wave)

    np.testing.assert_allclose(out["layer_mean"], ref["layer_mean"],
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(out["last_hidden"], ref["last_hidden"],
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_array_equal(out["frame_mask"], ref["frame_mask"])


def test_pp_encoder_forward_matches_scan_with_remat():
    mesh = make_mesh(n_model=2)
    wave = jnp.asarray(_wave())
    base = Wav2Vec2Encoder(ENC4)
    params = base.init(jax.random.PRNGKey(0), wave)["params"]
    ref = base.apply({"params": params}, wave)

    pp_cfg = ENC4.with_(pipeline_stages=2, pipeline_microbatches=2,
                        remat=True, remat_policy="dots")
    pp = Wav2Vec2Encoder(pp_cfg, mesh=mesh)

    def loss(p):
        return (pp.apply({"params": p}, wave)["layer_mean"] ** 2).mean()

    out = pp.apply({"params": params}, wave)
    np.testing.assert_allclose(out["layer_mean"], ref["layer_mean"],
                               rtol=2e-5, atol=2e-6)
    g = jax.jit(jax.grad(loss))(params)  # remat path must differentiate
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), g, 0.0)))


def test_pp_encoder_grad_matches_scan():
    """d(loss)/d(params) through the pipeline == through the scan, both for
    stacked layer params and for params outside the pipe (conv tower)."""
    mesh = make_mesh(n_model=2)
    wave = jnp.asarray(_wave())
    base = Wav2Vec2Encoder(ENC4)
    params = base.init(jax.random.PRNGKey(0), wave)["params"]

    pp_cfg = ENC4.with_(pipeline_stages=2, pipeline_microbatches=2)
    pp = Wav2Vec2Encoder(pp_cfg, mesh=mesh)

    def loss(enc, p):
        out = enc.apply({"params": p}, wave)
        return (out["layer_mean"] ** 2).mean() + (out["last_hidden"] ** 2).mean()

    g_ref = jax.grad(lambda p: loss(base, p))(params)
    g_pp = jax.jit(jax.grad(lambda p: loss(pp, p)))(params)

    qk_ref = g_ref["layers"]["layer"]["attention"]["q_proj"]["kernel"]
    qk_pp = g_pp["layers"]["layer"]["attention"]["q_proj"]["kernel"]
    np.testing.assert_allclose(qk_pp, qk_ref, rtol=5e-5, atol=1e-7)
    ff_ref = g_ref["layers"]["layer"]["feed_forward"]["intermediate_dense"]["kernel"]
    ff_pp = g_pp["layers"]["layer"]["feed_forward"]["intermediate_dense"]["kernel"]
    np.testing.assert_allclose(ff_pp, ff_ref, rtol=5e-5, atol=1e-7)
    conv_ref = g_ref["feature_extractor"]["conv0"]["kernel"]
    conv_pp = g_pp["feature_extractor"]["conv0"]["kernel"]
    np.testing.assert_allclose(conv_pp, conv_ref, rtol=5e-5, atol=1e-7)


def test_pp_encoder_validation():
    wave = jnp.asarray(_wave())
    base = Wav2Vec2Encoder(ENC4)
    params = base.init(jax.random.PRNGKey(0), wave)["params"]
    # no mesh
    pp = Wav2Vec2Encoder(ENC4.with_(pipeline_stages=2))
    with pytest.raises(ValueError, match="requires Wav2Vec2Encoder"):
        pp.apply({"params": params}, wave)
    # mesh 'model' size != stages
    mesh1 = make_mesh(n_model=1)
    pp = Wav2Vec2Encoder(ENC4.with_(pipeline_stages=2), mesh=mesh1)
    with pytest.raises(ValueError, match="mesh 'model'"):
        pp.apply({"params": params}, wave)
    # all_hidden cannot ride the pipe
    mesh2 = make_mesh(n_model=2)
    pp = Wav2Vec2Encoder(ENC4.with_(pipeline_stages=2), mesh=mesh2)
    with pytest.raises(ValueError, match="return_all_hidden_states"):
        pp.apply({"params": params}, wave, return_all_hidden_states=True)


def test_pp_dropout_smoke():
    """Stochastic mode: per-(layer, microbatch) keys flow through the pipe;
    outputs are finite and differ from the deterministic pass."""
    mesh = make_mesh(n_model=2)
    cfg = ENC4.with_(pipeline_stages=2, pipeline_microbatches=2,
                     hidden_dropout=0.3, attention_dropout=0.2)
    wave = jnp.asarray(_wave())
    pp = Wav2Vec2Encoder(cfg, mesh=mesh)
    params = pp.init(jax.random.PRNGKey(0), wave)["params"]
    det = pp.apply({"params": params}, wave)
    sto = pp.apply({"params": params}, wave, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(7)})
    lm = np.asarray(sto["layer_mean"])
    assert np.isfinite(lm).all()
    assert not np.allclose(lm, np.asarray(det["layer_mean"]))


# --------------------------------------------------- trainer integration

def _stage1_cfg(**kw):
    base = dict(
        batch_size=4, max_duration_seconds=1, target_sample_rate=4000,
        input_dim=32, hidden_dim=16, use_rawboost=False,
        finetune_encoder=True, compute_dtype="float32", seed=0, dropout=0.0,
    )
    base.update(kw)
    return Stage1Config(**base)


def test_pp_train_step_matches_replicated():
    """One full stage-1 train step under param_sharding='pp' (4x2 mesh,
    2 stages x 2 microbatches) must agree with the replicated single-mesh
    step: same loss, same updated params."""
    wave, labels = _wave(), np.array([1, 0, 1, 0], np.int32)

    def run(mesh, cfg):
        trainer = Stage1Trainer(cfg, enc_config=ENC4, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        sh = batch_sharding(mesh)
        batch = {
            "waveforms": jax.device_put(wave, sh),
            "labels": jax.device_put(labels, sh),
            "multi_labels": jax.device_put(labels, sh),
        }
        state, metrics = trainer.train_step(
            state, batch, jnp.zeros((), jnp.float32))
        qk = np.asarray(
            state.params["encoder"]["layers"]["layer"]["attention"]
            ["q_proj"]["kernel"])
        return float(metrics["loss"]), qk

    # replicated run on a 4-device dp mesh so the B=4 batch tiles 'data'
    loss_ref, qk_ref = run(
        make_mesh(n_model=1, devices=np.array(jax.devices()[:4])),
        _stage1_cfg())
    loss_pp, qk_pp = run(make_mesh(n_model=2),
                         _stage1_cfg(param_sharding="pp",
                                     pipeline_microbatches=2))
    assert np.isclose(loss_pp, loss_ref, rtol=1e-5), (loss_pp, loss_ref)
    np.testing.assert_allclose(qk_pp, qk_ref, rtol=1e-4, atol=1e-7)


def test_pp_bf16_frozen_train_step_runs():
    """Regression: the CLI-default recipe (bf16 compute, frozen encoder,
    device RawBoost) through pp. The original executor psum'd bf16 values,
    which hard-crashes XLA CPU under partial-manual shard_map ('Invalid
    binary instruction opcode copy', jax 0.9.0) — the executor now rides
    psum through f32."""
    cfg = _stage1_cfg(param_sharding="pp", pipeline_microbatches=2,
                      compute_dtype="bfloat16", finetune_encoder=False,
                      use_rawboost=True, rawboost_mode="device",
                      rawboost_prob=1.0)
    mesh = make_mesh(n_model=2)
    trainer = Stage1Trainer(cfg, enc_config=ENC4, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    wave, labels = _wave(), np.array([1, 0, 1, 0], np.int32)
    sh = batch_sharding(mesh)
    batch = {
        "waveforms": jax.device_put(wave, sh),
        "labels": jax.device_put(labels, sh),
        "multi_labels": jax.device_put(labels, sh),
    }
    state, metrics = trainer.train_step(
        state, batch, jnp.zeros((), jnp.float32))
    assert np.isfinite(float(metrics["loss"]))


def test_pp_bf16_forward_drift_bounded():
    """bf16 pp output drifts from bf16 scan only by program-reassociation
    noise (1-2 bf16 ulp per layer, compounding) — the same class of
    difference any XLA refusion produces. fp32 parity (above) pins the
    semantics; this bounds the bf16 drift so a real numerics bug (wrong
    layer order, dropped residual) cannot hide behind 'it's just bf16'."""
    mesh = make_mesh(n_model=2)
    cfgb = ENC4.with_(dtype=jnp.bfloat16)
    wave = jnp.asarray(_wave())
    base = Wav2Vec2Encoder(cfgb)
    params = base.init(jax.random.PRNGKey(0), wave)["params"]
    ref = base.apply({"params": params}, wave)["layer_mean"]
    pp = Wav2Vec2Encoder(cfgb.with_(pipeline_stages=2,
                                    pipeline_microbatches=2), mesh=mesh)
    out = jax.jit(lambda p, w: pp.apply({"params": p}, w))(
        params, wave)["layer_mean"]
    drift = float(jnp.abs(out - ref).max())
    scale = float(jnp.abs(ref).max())
    assert drift < 0.05 * scale, (drift, scale)  # observed ~0.01x


def test_pp_param_and_opt_layout():
    """param_sharding='pp' must put the stacked layer params (and their
    Adam moments) on the 'model' axis, stage-major."""
    mesh = make_mesh(n_model=2)
    trainer = Stage1Trainer(
        _stage1_cfg(param_sharding="pp", pipeline_microbatches=2),
        enc_config=ENC4, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    qk = state.params["encoder"]["layers"]["layer"]["attention"]["q_proj"]["kernel"]
    assert tuple(qk.sharding.spec)[:1] == ("model",), qk.sharding.spec
    # conv params stay replicated (they are outside the pipe)
    conv = state.params["encoder"]["feature_extractor"]["conv0"]["kernel"]
    assert all(s is None for s in tuple(conv.sharding.spec)), conv.sharding.spec
