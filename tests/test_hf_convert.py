"""HF conversion unit tests beyond the full-model parity suite:
weight-norm collapse across torch naming schemes, dense/conv transposes,
and config translation."""

import numpy as np
import pytest

from wav2vec_contr_loss_tpu.models.hf_convert import (
    _pos_conv_kernel,
    config_from_hf,
)


def _wn_reference(v, g):
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    return (g * v / norm).transpose(2, 1, 0)


def test_pos_conv_weight_norm_old_naming(rng):
    v = rng.normal(size=(8, 4, 16)).astype(np.float32)   # (out, in/g, k)
    g = rng.normal(size=(1, 1, 16)).astype(np.float32)
    sd = {"pos.weight_v": v, "pos.weight_g": g}
    got = _pos_conv_kernel(sd, "pos")
    np.testing.assert_allclose(got, _wn_reference(v, g), rtol=1e-6)
    assert got.shape == (16, 4, 8)  # (k, in/g, out)


def test_pos_conv_weight_norm_parametrize_naming(rng):
    v = rng.normal(size=(8, 4, 16)).astype(np.float32)
    g = rng.normal(size=(1, 1, 16)).astype(np.float32)
    sd = {
        "pos.parametrizations.weight.original0": g,
        "pos.parametrizations.weight.original1": v,
    }
    np.testing.assert_allclose(_pos_conv_kernel(sd, "pos"),
                               _wn_reference(v, g), rtol=1e-6)


def test_pos_conv_materialized_weight(rng):
    w = rng.normal(size=(8, 4, 16)).astype(np.float32)
    got = _pos_conv_kernel({"pos.weight": w}, "pos")
    np.testing.assert_array_equal(got, w.transpose(2, 1, 0))


def test_pos_conv_missing_raises():
    with pytest.raises(KeyError):
        _pos_conv_kernel({}, "pos")


def test_weight_norm_matches_torch(rng):
    torch = pytest.importorskip("torch")
    conv = torch.nn.Conv1d(16, 8, kernel_size=6, groups=2)
    try:
        from torch.nn.utils.parametrizations import weight_norm

        conv = weight_norm(conv, name="weight", dim=2)
    except ImportError:
        conv = torch.nn.utils.weight_norm(conv, name="weight", dim=2)
    sd = {f"c.{k}": v.detach().numpy() for k, v in conv.state_dict().items()}
    got = _pos_conv_kernel(sd, "c")
    want = conv.weight.detach().numpy().transpose(2, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_config_from_hf_roundtrip():
    transformers = pytest.importorskip("transformers")
    hf = transformers.Wav2Vec2Config()
    cfg = config_from_hf(hf)
    assert cfg.hidden_size == hf.hidden_size
    assert cfg.num_layers == hf.num_hidden_layers
    assert cfg.conv_kernel == tuple(hf.conv_kernel)
    assert cfg.do_stable_layer_norm == hf.do_stable_layer_norm
    assert cfg.mask_time_prob == hf.mask_time_prob
