"""bf16 weight-gradient knob (`grad_dtype`, r3 capability knob).

Contract: with grad_dtype='bfloat16' the FORWARD is bit-identical (the
stacked encoder kernels are cast to the bf16 compute dtype at use anyway —
the knob only moves where the cast happens), the dW leaves for those
kernels come out bf16 (halving the dW band's HBM writes,
docs/PROFILE_r3.md), the optimizer math stays fp32, and the parameter
trajectory stays within a tight envelope of the f32-gradient run.
Reference: stage-1 is pure fp32 torch (train_stage1.py:93-96). Adopted
r3 (+3.0% measured): the default 'auto' resolves to bf16 dW under bf16
compute; `grad_dtype='float32'` is the reference-exact path in one flag.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from wav2vec_contr_loss_tpu.config import Stage1Config
from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
from wav2vec_contr_loss_tpu.ops.adam_bf16nu import adamw_storage_dtypes
from wav2vec_contr_loss_tpu.train import Stage1Trainer
from wav2vec_contr_loss_tpu.train.stage1 import cast_stacked_kernels_bf16

TINY_ENC = Wav2Vec2Config(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    dtype=jnp.bfloat16, apply_spec_augment=False)


def _tiny_cfg(**kw):
    kw.setdefault("compute_dtype", "bfloat16")
    return Stage1Config(
        batch_size=4, max_duration_seconds=1, target_sample_rate=4000,
        input_dim=32, hidden_dim=16, finetune_encoder=True,
        use_rawboost=False, **kw)


def _batch():
    rng = np.random.default_rng(0)
    return {
        "waveforms": jnp.asarray(
            rng.normal(0, 0.2, (4, 4000)).astype(np.float32)),
        "labels": jnp.asarray([1, 0, 1, 0]),
        "multi_labels": jnp.asarray([1, 0, 1, 0]),
    }


def test_cast_targets_only_stacked_kernels():
    tr = Stage1Trainer(_tiny_cfg(), enc_config=TINY_ENC)
    params = tr.init_state(jax.random.PRNGKey(0)).params
    cast = cast_stacked_kernels_bf16(params)
    # same structure
    assert (jax.tree_util.tree_structure(cast)
            == jax.tree_util.tree_structure(params))
    n_bf16 = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(cast):
        keys = [getattr(k, "key", k) for k in path]
        if "layers" in keys and keys[-1] == "kernel":
            assert leaf.dtype == jnp.bfloat16, keys
            n_bf16 += 1
        else:
            # LN scales/biases, conv tower, compression head: untouched
            assert leaf.dtype == jnp.float32, keys
    assert n_bf16 == 6  # 4 attention + 2 FF kernels (stacked over layers)
    # no-op when there is no finetuned encoder in the tree
    head_only = {"compression": params["compression"]}
    assert cast_stacked_kernels_bf16(head_only) is head_only


def test_requires_bf16_compute():
    with pytest.raises(ValueError, match="grad_dtype"):
        Stage1Trainer(_tiny_cfg(compute_dtype="float32",
                                grad_dtype="bfloat16"),
                      enc_config=TINY_ENC.with_(dtype=jnp.float32))


def test_forward_identical_trajectory_bounded():
    """Step-1 loss is bit-equal (forward unchanged); 6 training steps stay
    within a 2% relative-movement envelope of the f32-gradient run."""
    batch = _batch()
    alpha = jnp.zeros((), jnp.float32)

    def run(grad_dtype):
        tr = Stage1Trainer(_tiny_cfg(grad_dtype=grad_dtype),
                           enc_config=TINY_ENC)
        st = tr.init_state(jax.random.PRNGKey(0))
        losses = []
        for _ in range(6):
            st, m = tr.train_step(st, dict(batch), alpha)
            losses.append(float(m["loss"]))
        return losses, st

    losses32, st32 = run("float32")
    losses16, st16 = run("bfloat16")
    assert losses16[0] == losses32[0]  # identical forward before any update
    assert np.isfinite(losses16).all()

    # params stay f32 masters in both runs
    for leaf in jax.tree_util.tree_leaves(st16.params):
        assert leaf.dtype == jnp.float32

    flat32 = jax.tree_util.tree_leaves_with_path(st32.params)
    flat16 = dict(jax.tree_util.tree_leaves_with_path(st16.params))
    init = dict(jax.tree_util.tree_leaves_with_path(
        Stage1Trainer(_tiny_cfg(), enc_config=TINY_ENC)
        .init_state(jax.random.PRNGKey(0)).params))
    for path, p32 in flat32:
        d = np.linalg.norm(np.asarray(p32, np.float64)
                           - np.asarray(flat16[path], np.float64))
        move = np.linalg.norm(np.asarray(p32, np.float64)
                              - np.asarray(init[path], np.float64))
        if move > 0:
            assert d / move < 0.02, (jax.tree_util.keystr(path), d / move)


def test_bf16_grads_get_f32_updates():
    """force_core AdamW consumes bf16 grads with fp32 EMA math and emits
    fp32 updates; trajectory tracks the f32-gradient trajectory."""
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))}
    grads = [{"w": jnp.asarray(
        rng.normal(scale=10 ** rng.uniform(-3, 0), size=(32, 16))
        .astype(np.float32))} for _ in range(20)]

    def run(cast):
        tx = adamw_storage_dtypes(1e-3, weight_decay=1e-4,
                                  mu_dtype=jnp.bfloat16,
                                  nu_dtype=jnp.bfloat16, force_core=True)
        p, state = params, tx.init(params)
        for g in grads:
            if cast:
                g = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), g)
            updates, state = tx.update(g, state, p)
            assert all(u.dtype == jnp.float32
                       for u in jax.tree_util.tree_leaves(updates))
            p = optax.apply_updates(p, updates)
        return p

    p32, p16 = run(False), run(True)
    d = np.linalg.norm(np.asarray(p32["w"]) - np.asarray(p16["w"]))
    move = np.linalg.norm(np.asarray(p32["w"]) - np.asarray(params["w"]))
    assert d / move < 0.02, d / move
