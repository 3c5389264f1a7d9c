"""Multi-device SPMD tests on the virtual 8-device CPU mesh.

Validates the reference-parity claims of SURVEY.md §2.7: data parallelism
over the mesh 'data' axis with XLA-inserted collectives (replacing the
reference's dead NCCL scaffolding, stage1_utils.py:91-99/156-172), plus the
optional tensor-parallel layout on the transformer kernels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from wav2vec_contr_loss_tpu.config import Stage1Config
from wav2vec_contr_loss_tpu.losses import SupConConfig, supcon_binary_loss
from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
from wav2vec_contr_loss_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    shard_params,
)
from wav2vec_contr_loss_tpu.train import Stage1Trainer

TINY_ENC = Wav2Vec2Config(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    dtype=jnp.float32, apply_spec_augment=False,
)


def test_eight_cpu_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(n_data=3, n_model=2)


def test_param_sharding_rules():
    assert param_sharding_rules(
        "layers/layer/attention/q_proj/kernel", 3, True
    ) == P(None, None, "model")
    assert param_sharding_rules(
        "layers/layer/feed_forward/output_dense/kernel", 3, True
    ) == P(None, "model", None)
    assert param_sharding_rules(
        "layers/layer/attention/q_proj/kernel", 3, False
    ) == P()
    assert param_sharding_rules("compression/proj/kernel", 2, True) == P()


def _batch(b=16, t=2000, seed=0):
    rng = np.random.default_rng(seed)
    wave = rng.normal(0, 0.2, (b, t)).astype(np.float32)
    labels = np.array([1, 0] * (b // 2), np.int32)
    return wave, labels


@pytest.mark.parametrize("n_model", [1, 2])
def test_dp_tp_train_step(n_model):
    """One full stage-1 train step, jitted over a (data, model) mesh, must
    compile, run, and agree with the single-device result."""
    cfg = Stage1Config(
        batch_size=16, max_duration_seconds=1, target_sample_rate=2000,
        input_dim=32, hidden_dim=16, use_rawboost=False,
        finetune_encoder=True, compute_dtype="float32", seed=0,
    )
    wave, labels = _batch()
    batch = {
        "waveforms": wave,
        "labels": labels,
        "multi_labels": labels,
    }

    def run(mesh):
        trainer = Stage1Trainer(cfg, enc_config=TINY_ENC, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        sh = batch_sharding(mesh)
        dev_batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
        state, metrics = trainer.train_step(
            state, dev_batch, jnp.zeros((), jnp.float32)
        )
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_multi, params_multi = run(make_mesh(n_model=n_model))
    loss_single, params_single = run(
        make_mesh(devices=np.array(jax.devices()[:1]))
    )
    assert np.isfinite(loss_multi)
    assert loss_multi == pytest.approx(loss_single, rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(params_multi),
                    jax.tree_util.tree_leaves(params_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_tp_layout_applied():
    mesh = make_mesh(n_model=2)
    cfg = Stage1Config(
        batch_size=8, max_duration_seconds=1, target_sample_rate=2000,
        input_dim=32, hidden_dim=16, finetune_encoder=True,
        use_rawboost=False, compute_dtype="float32",
    )
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    qk = state.params["encoder"]["layers"]["layer"]["attention"]["q_proj"]["kernel"]
    spec = qk.sharding.spec
    assert tuple(spec) == (None, None, "model")


def test_global_batch_from_local_single_process():
    from wav2vec_contr_loss_tpu.parallel import global_batch_from_local

    mesh = make_mesh()
    batch = {"waveforms": np.zeros((16, 100), np.float32),
             "labels": np.arange(16, dtype=np.int32)}
    out = global_batch_from_local(mesh, batch)
    assert out["waveforms"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(out["labels"]), batch["labels"])


def test_global_loss_equals_replica_average():
    """Data-sharded loss == the reference's _reduce_avg semantics: the
    global-batch mean is identical whether computed sharded or locally."""
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    z = rng.normal(size=(32, 8)).astype(np.float32)
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    labels = np.array([1, 0] * 16, np.int32)
    cfg = SupConConfig()

    local = float(supcon_binary_loss(z, labels, 0.0, cfg))
    zs = jax.device_put(z, batch_sharding(mesh))
    ls = jax.device_put(labels, batch_sharding(mesh))
    sharded = float(supcon_binary_loss(zs, ls, 0.0, cfg))
    assert sharded == pytest.approx(local, rel=1e-5)


def test_fsdp_param_sharding_numerics():
    """param_sharding='fsdp' (ZeRO-3 over the stacked layer axis): the
    train step matches single-device numerics, the stacked layer params
    AND their Adam state are actually sharded along 'data', and the
    non-stacked params stay replicated."""
    cfg = Stage1Config(
        batch_size=16, max_duration_seconds=1, target_sample_rate=2000,
        input_dim=32, hidden_dim=16, use_rawboost=False,
        finetune_encoder=True, compute_dtype="float32", seed=0,
        param_sharding="fsdp",
    )
    wave, labels = _batch()
    batch = {"waveforms": wave, "labels": labels, "multi_labels": labels}

    def run(mesh, c):
        trainer = Stage1Trainer(cfg.replace(**c), enc_config=TINY_ENC,
                                mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        sh = batch_sharding(mesh)
        dev_batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
        state, metrics = trainer.train_step(
            state, dev_batch, jnp.zeros((), jnp.float32))
        return float(metrics["loss"]), state

    # TINY_ENC stacks 2 layers -> use a 2-wide data axis so it divides
    mesh2 = make_mesh(devices=np.array(jax.devices()[:2]))
    loss_f, state_f = run(mesh2, {})
    loss_s, state_s = run(make_mesh(devices=np.array(jax.devices()[:1])),
                          {"param_sharding": "replicated"})

    assert np.isfinite(loss_f)
    assert loss_f == pytest.approx(loss_s, rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state_f.params)),
                    jax.tree_util.tree_leaves(jax.device_get(state_s.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    enc = state_f.params["encoder"]["layers"]["layer"]
    qk = enc["attention"]["q_proj"]["kernel"]
    assert tuple(qk.sharding.spec)[:1] == ("data",), qk.sharding.spec
    # conv extractor (non-stacked) stays replicated
    fx_leaf = jax.tree_util.tree_leaves(
        state_f.params["encoder"]["feature_extractor"])[0]
    assert all(s is None for s in tuple(fx_leaf.sharding.spec))

    # Adam state shards with the params (the ZeRO memory win)
    mu_sharded = [
        x for x in jax.tree_util.tree_leaves(
            state_f.opt_state,
            is_leaf=lambda x: hasattr(x, "sharding"))
        if hasattr(x, "sharding") and hasattr(x, "ndim") and x.ndim == 3
        and "data" in (x.sharding.spec or ())
    ]
    assert mu_sharded, "no 3-D optimizer leaf carries the 'data' axis"


def test_fsdp_warns_when_nothing_shards():
    """fsdp with a data axis that doesn't divide the layer stack must warn
    loudly instead of silently replicating (review finding r2)."""
    import warnings

    from wav2vec_contr_loss_tpu.parallel.mesh import shard_params

    mesh = make_mesh()  # 8x1 — TINY_ENC stacks 2 layers, 2 % 8 != 0
    params = {"layers": {"layer": {"kernel": np.zeros((2, 8, 8), np.float32)}}}
    with pytest.warns(RuntimeWarning, match="sharded 0/1"):
        shard_params(params, mesh, fsdp=True)


def test_fsdp_shard_state_preserves_opt_values():
    """_shard_state must only re-layout a restored optimizer state, never
    re-initialize it (review finding r2: fsdp resume zeroed Adam mu/nu)."""
    cfg = Stage1Config(
        batch_size=8, max_duration_seconds=1, target_sample_rate=2000,
        input_dim=32, hidden_dim=16, use_rawboost=False,
        finetune_encoder=True, compute_dtype="float32", seed=0,
        param_sharding="fsdp",
    )
    mesh = make_mesh(devices=np.array(jax.devices()[:2]))
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    wave, labels = _batch()
    sh = batch_sharding(mesh)
    batch = {k: jax.device_put(v[:8], sh)
             for k, v in {"waveforms": wave, "labels": labels,
                          "multi_labels": labels}.items()}
    state, _ = trainer.train_step(state, batch,
                                  jnp.zeros((), jnp.float32))
    before = jax.device_get(state.opt_state)
    resharded = trainer._shard_state(state)
    after = jax.device_get(resharded.opt_state)
    leaves_b = jax.tree_util.tree_leaves(before)
    leaves_a = jax.tree_util.tree_leaves(after)
    assert any(np.abs(np.asarray(x, np.float32)).max() > 0
               for x in leaves_b if hasattr(x, "dtype")), "mu should be warm"
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_baseline_fsdp_layout():
    """The baseline trainer shares the stage-1 layout policy: fsdp shards
    its stacked layer params + opt state; one step runs finite."""
    from wav2vec_contr_loss_tpu.config import BaselineConfig
    from wav2vec_contr_loss_tpu.train.baseline import BaselineTrainer

    cfg = BaselineConfig(
        batch_size=8, max_duration_seconds=1, target_sample_rate=2000,
        input_dim=32, hidden_dim=16, use_rawboost=False,
        finetune_encoder=True, compute_dtype="float32", seed=0,
        param_sharding="fsdp",
    )
    mesh = make_mesh(devices=np.array(jax.devices()[:2]))
    tr = BaselineTrainer(cfg, enc_config=TINY_ENC, mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    qk = state.params["encoder"]["layers"]["layer"]["attention"]["q_proj"]["kernel"]
    assert tuple(qk.sharding.spec)[:1] == ("data",), qk.sharding.spec

    wave, labels = _batch()
    sh = batch_sharding(mesh)
    state, metrics = tr.train_step(
        state,
        {"waveforms": jax.device_put(wave[:8], sh),
         "labels": jax.device_put(labels[:8], sh)},
    )
    assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------- sp
# Megatron-style sequence parallelism (models/wav2vec2.py
# `sequence_parallel`): the (B, T', D) residual stream is frame-sharded
# over the mesh 'model' axis via GSPMD constraints. Placement-only — every
# test below pins that numerics are untouched. Beyond the reference, whose
# sequence story is 'none, by construction' (SURVEY.md §2.7).


def test_sequence_parallel_train_step_numerics():
    """One dp x tp train step with sequence_parallel=True must agree with
    the single-device, sp-off run (pure placement change)."""
    cfg = Stage1Config(
        batch_size=16, max_duration_seconds=1, target_sample_rate=2000,
        input_dim=32, hidden_dim=16, use_rawboost=False,
        finetune_encoder=True, compute_dtype="float32", seed=0,
    )
    wave, labels = _batch()
    batch = {"waveforms": wave, "labels": labels, "multi_labels": labels}

    def run(mesh, sp):
        trainer = Stage1Trainer(cfg.replace(sequence_parallel=sp),
                                enc_config=TINY_ENC, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        sh = batch_sharding(mesh)
        dev_batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
        state, metrics = trainer.train_step(
            state, dev_batch, jnp.zeros((), jnp.float32))
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_sp, params_sp = run(make_mesh(n_model=2), True)
    loss_single, params_single = run(
        make_mesh(devices=np.array(jax.devices()[:1])), False)
    assert np.isfinite(loss_sp)
    assert loss_sp == pytest.approx(loss_single, rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(params_sp),
                    jax.tree_util.tree_leaves(params_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sequence_parallel_composes_with_fsdp():
    """sp shards activations over 'model' while fsdp shards the layer
    stack over 'data' — orthogonal axes, must compose in one step."""
    cfg = Stage1Config(
        batch_size=16, max_duration_seconds=1, target_sample_rate=2000,
        input_dim=32, hidden_dim=16, use_rawboost=False,
        finetune_encoder=True, compute_dtype="float32", seed=0,
        param_sharding="fsdp", sequence_parallel=True,
    )
    wave, labels = _batch()
    batch = {"waveforms": wave, "labels": labels, "multi_labels": labels}
    # (2, 2): data=2 divides the 2-layer stack (fsdp), model=2 carries sp
    mesh = make_mesh(n_model=2, devices=np.array(jax.devices()[:4]))
    trainer = Stage1Trainer(cfg, enc_config=TINY_ENC, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    sh = batch_sharding(mesh)
    dev_batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
    state, metrics = trainer.train_step(
        state, dev_batch, jnp.zeros((), jnp.float32))
    loss = float(metrics["loss"])

    ref = Stage1Trainer(
        cfg.replace(param_sharding="replicated", sequence_parallel=False),
        enc_config=TINY_ENC,
        mesh=make_mesh(devices=np.array(jax.devices()[:1])))
    rstate = ref.init_state(jax.random.PRNGKey(0))
    rbatch = {k: jax.device_put(v, batch_sharding(ref.mesh))
              for k, v in batch.items()}
    _, rmetrics = ref.train_step(rstate, rbatch, jnp.zeros((), jnp.float32))
    assert loss == pytest.approx(float(rmetrics["loss"]), rel=1e-4)


def test_sequence_parallel_constraints_in_lowering():
    """The knob must actually emit sharding constraints (one pre-stack +
    one per scan body), not silently no-op."""
    from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Encoder

    mesh = make_mesh(n_model=2)
    wave = jnp.zeros((2, 2000), jnp.float32)

    def lowered_text(sp):
        enc = Wav2Vec2Encoder(TINY_ENC.with_(sequence_parallel=sp),
                              mesh=mesh if sp else None)
        params = enc.init(jax.random.PRNGKey(0), wave)

        def fwd(p, w):
            return enc.apply(p, w)["layer_mean"]

        return jax.jit(fwd).lower(params, wave).as_text()

    # shardy lowers with_sharding_constraint to sdy.sharding_constraint;
    # pre-shardy jax used a `Sharding` custom-call — accept either
    def n_constraints(text):
        return max(text.count("sharding_constraint"), text.count("@Sharding"))

    n_on = n_constraints(lowered_text(True))
    n_off = n_constraints(lowered_text(False))
    assert n_on >= 2, f"expected >=2 sharding constraints, found {n_on}"
    assert n_on > n_off


def test_sequence_parallel_validation():
    from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Encoder

    wave = jnp.zeros((2, 2000), jnp.float32)
    # pp + sp both claim the 'model' axis — refuse at trace time
    enc = Wav2Vec2Encoder(
        TINY_ENC.with_(sequence_parallel=True, pipeline_stages=2),
        mesh=make_mesh(n_model=2))
    with pytest.raises(ValueError, match="sequence_parallel"):
        enc.init(jax.random.PRNGKey(0), wave)
    # sp without a mesh cannot build the NamedSharding
    enc2 = Wav2Vec2Encoder(TINY_ENC.with_(sequence_parallel=True))
    params = enc2.init(jax.random.PRNGKey(0), wave)  # init skips constraints
    with pytest.raises(ValueError, match="mesh"):
        enc2.apply(params, wave)


def test_checkpoint_restores_across_mesh_shapes(tmp_path):
    """Topology-elastic restore: a checkpoint written by an fsdp+tp run on
    the 4x2 mesh restores onto ONE device (and back onto 4x2), values
    bit-equal, and training continues on the new topology. Production
    claim: a pod job's checkpoint can be resumed/debugged/served on any
    device count."""
    from wav2vec_contr_loss_tpu.train import checkpoint as ckpt

    enc4 = Wav2Vec2Config(   # 4 layers so fsdp actually shards over data=4
        hidden_size=32, num_layers=4, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        dtype=jnp.float32, apply_spec_augment=False,
    )
    cfg = Stage1Config(
        batch_size=8, max_duration_seconds=1, target_sample_rate=2000,
        input_dim=32, hidden_dim=16, use_rawboost=False,
        finetune_encoder=True, compute_dtype="float32", seed=0,
        param_sharding="fsdp",
    )
    wave, labels = _batch()
    save = str(tmp_path / "elastic")

    mesh8 = make_mesh(n_model=2)
    trainer = Stage1Trainer(cfg, enc_config=enc4, mesh=mesh8)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch8 = {k: jax.device_put(v[:8], batch_sharding(mesh8))
              for k, v in {"waveforms": wave, "labels": labels,
                           "multi_labels": labels}.items()}
    state, _ = trainer.train_step(state, batch8, jnp.zeros((), jnp.float32))
    ckpt.save_checkpoint(save, "best", state, cfg.ckpt_config(),
                         {"epoch": 1}, trainer._sidecar_extra())
    want = jax.device_get(state.params)

    # restore on ONE device and continue training there
    mesh1 = make_mesh(devices=np.array(jax.devices()[:1]))
    tr1, st1 = Stage1Trainer.from_checkpoint(save, "best", mesh=mesh1)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(st1.params)),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    batch1 = {k: jax.device_put(v[:8], batch_sharding(mesh1))
              for k, v in {"waveforms": wave, "labels": labels,
                           "multi_labels": labels}.items()}
    st1, m1 = tr1.train_step(st1, batch1, jnp.zeros((), jnp.float32))
    assert np.isfinite(float(m1["loss"]))

    # and back onto the 4x2 fsdp mesh
    tr8, st8 = Stage1Trainer.from_checkpoint(save, "best",
                                             mesh=make_mesh(n_model=2))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(st8.params)),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    st8, m8 = tr8.train_step(st8, batch8, jnp.zeros((), jnp.float32))
    # same restored state, same batch -> same step loss on both shapes
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=2e-5)
