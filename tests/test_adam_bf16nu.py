"""Storage-dtype AdamW (ops/adam_bf16nu.py, r3 capability knob).

Contract: with fp32 storage it IS optax.adamw (bit-level parity over a
trajectory); with bf16 nu storage the update deviates by at most the bf16
mantissa bound on the step scale, and the optimizer state tree keeps the
optax.ScaleByAdamState structure (checkpoint compatibility)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from wav2vec_contr_loss_tpu.ops.adam_bf16nu import adamw_storage_dtypes


def _trajectory(tx, params, grads_seq):
    state = tx.init(params)
    out = []
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
        out.append(params)
    return out, state


@pytest.fixture
def problem():
    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)),
              "b": jnp.asarray(rng.normal(size=(32,)).astype(np.float32))}
    grads_seq = [
        {"w": jnp.asarray(rng.normal(scale=10 ** rng.uniform(-3, 1),
                                     size=(64, 32)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(size=(32,)).astype(np.float32))}
        for _ in range(25)
    ]
    return params, grads_seq


def test_fp32_matches_stock_adamw(problem):
    params, grads_seq = problem
    ours, _ = _trajectory(
        adamw_storage_dtypes(1e-3, weight_decay=1e-4), params, grads_seq)
    stock, _ = _trajectory(
        optax.adamw(1e-3, weight_decay=1e-4), params, grads_seq)
    for a, b in zip(ours, stock):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))
        np.testing.assert_array_equal(np.asarray(a["b"]), np.asarray(b["b"]))


def test_custom_core_fp32_storage_matches_stock(problem):
    """nu_dtype=jnp.float32 (explicit, NOT None) runs the CUSTOM per-leaf
    core rather than delegating to optax — its hand-rolled bias
    correction and step must still be bit-equal to stock optax.adamw
    (review r3: the delegation test alone left this path unverified)."""
    params, grads_seq = problem
    ours, state = _trajectory(
        adamw_storage_dtypes(1e-3, weight_decay=1e-4,
                             nu_dtype=jnp.float32), params, grads_seq)
    stock, _ = _trajectory(
        optax.adamw(1e-3, weight_decay=1e-4), params, grads_seq)
    for a, b in zip(ours, stock):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))
        np.testing.assert_array_equal(np.asarray(a["b"]), np.asarray(b["b"]))
    adam_state = state[0] if isinstance(state, tuple) else state
    assert jax.tree_util.tree_leaves(adam_state.nu)[0].dtype == jnp.float32


def test_bf16_mu_matches_stock_mu_dtype(problem):
    """mu_dtype passthrough must reproduce the r2-measured configuration
    (stock optax.adamw(mu_dtype=bf16)) exactly when nu stays fp32."""
    params, grads_seq = problem
    ours, _ = _trajectory(
        adamw_storage_dtypes(1e-3, weight_decay=1e-4,
                             mu_dtype=jnp.bfloat16), params, grads_seq)
    stock, _ = _trajectory(
        optax.adamw(1e-3, weight_decay=1e-4, mu_dtype=jnp.bfloat16),
        params, grads_seq)
    for a, b in zip(ours, stock):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))


def test_bf16_nu_bounded_deviation(problem):
    """bf16 nu stores ~8 mantissa bits -> |Δnu|/nu <= ~0.4%, i.e. ~0.2% on
    the 1/sqrt(nu) step scale. Assert the parameter trajectory stays within
    a 1% relative envelope of fp32 Adam over 25 steps with gradient scales
    spanning 4 orders of magnitude."""
    params, grads_seq = problem
    ours, state = _trajectory(
        adamw_storage_dtypes(1e-3, weight_decay=1e-4,
                             mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16),
        params, grads_seq)
    ref, _ = _trajectory(
        optax.adamw(1e-3, weight_decay=1e-4, mu_dtype=jnp.bfloat16),
        params, grads_seq)
    for step, (a, b) in enumerate(zip(ours, ref)):
        for k in ("w", "b"):
            da = np.linalg.norm(np.asarray(a[k]) - np.asarray(b[k]))
            # relative to the total parameter MOVEMENT under fp32 Adam
            move = np.linalg.norm(np.asarray(b[k]) - np.asarray(params[k]))
            assert da / move < 0.02, (k, step, da / move)

    # storage dtypes actually reduced
    adam_state = state[0] if isinstance(state, tuple) else state
    nu_leaf = jax.tree_util.tree_leaves(adam_state.nu)[0]
    mu_leaf = jax.tree_util.tree_leaves(adam_state.mu)[0]
    assert nu_leaf.dtype == jnp.dtype(jnp.bfloat16)
    assert mu_leaf.dtype == jnp.dtype(jnp.bfloat16)


def test_trainer_wiring_and_state_shape():
    """Stage1 build_optimizer with adam_nu_dtype='bfloat16' trains a tiny
    step and its optimizer state keeps the ScaleByAdamState layout."""
    from wav2vec_contr_loss_tpu.config import Stage1Config
    from wav2vec_contr_loss_tpu.models.wav2vec2 import Wav2Vec2Config
    from wav2vec_contr_loss_tpu.train import Stage1Trainer

    enc = Wav2Vec2Config(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        dtype=jnp.float32, apply_spec_augment=False)
    cfg = Stage1Config(batch_size=4, max_duration_seconds=1,
                       target_sample_rate=4000, input_dim=32, hidden_dim=16,
                       finetune_encoder=True, use_rawboost=False,
                       compute_dtype="float32", adam_nu_dtype="bfloat16")
    tr = Stage1Trainer(cfg, enc_config=enc)
    st = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "waveforms": jnp.asarray(rng.normal(0, 0.2, (4, 4000)).astype(np.float32)),
        "labels": jnp.asarray([1, 0, 1, 0]),
        "multi_labels": jnp.asarray([1, 0, 1, 0]),
    }
    st, m = tr.train_step(st, batch, jnp.zeros((), jnp.float32))
    assert np.isfinite(float(m["loss"]))
    nu_dtypes = {l.dtype for l in jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x, st.opt_state))
        if hasattr(l, "dtype")}
    assert jnp.dtype(jnp.bfloat16) in nu_dtypes
