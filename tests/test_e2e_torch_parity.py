"""End-to-end inference score parity against the reference torch pipeline.

Layer-level numerics are covered by test_wav2vec2_parity; metric math by
test_metrics; losses by test_losses. This file closes the remaining seam:
the FULL inference composition, audio -> score, run both ways on the same
weights and the same waveforms:

  reference:  HF encoder hidden-state stack (reference: encoder.py:40-70)
              -> CompressionModule (reference: compression_module.py:35-67)
              -> time-mean + L2 norm (reference:
                 extract_stage1_embeddings.py:147-163)
              -> stage-2 head raw logit (reference: stage2_utils.py:22-42,
                 generate_eval_score_file.py:149-166)
  ours:       SpoofDetector(mode='embed') -> build_head(...)

and the baseline end-to-end chain (reference: baseline_train.py:155-178)
vs SpoofDetector(mode='logits'). The reference's own torch modules are
imported as the oracle (never vendored); the encoder is a locally-built
tiny HF model so no network is touched.
"""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from wav2vec_contr_loss_tpu.models import (  # noqa: E402
    SpoofDetector,
    build_head,
)

from test_wav2vec2_parity import make_pair, make_input  # noqa: E402


def _load_ref(reference_dir, name):
    path = os.path.join(reference_dir, f"{name}.py")
    if not os.path.exists(path):
        pytest.skip(f"reference module {name} not mounted")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _encoder_stack(hf_model, wave_t, mask_t):
    """The reference Wav2Vec2Encoder wrapper's stacking/permutation
    (reference: encoder.py:60-68): tuple of K (B,T,D) hidden states
    -> (B, K, F=D, T)."""
    out = hf_model(
        wave_t, attention_mask=mask_t,
        output_hidden_states=True, return_dict=True,
    )
    hs = torch.stack(out.hidden_states, dim=0).transpose(0, 1)
    return hs.permute(0, 1, 3, 2).contiguous()


def _dense_params(linear):
    return {
        "kernel": jnp.asarray(linear.weight.detach().numpy().T),
        "bias": jnp.asarray(linear.bias.detach().numpy()),
    }


HID = 16  # compression hidden dim (tiny stand-in for the published 256)


@pytest.fixture(scope="module", params=["xlsr", "large960h"])
def chain(request, reference_dir, rng):
    """(variant, torch oracle modules + weights, our params) pair."""
    variant = request.param
    ref_cm = _load_ref(reference_dir, "compression_module")

    hf_model, cfg, enc_params = make_pair(variant)
    torch.manual_seed(7)
    comp = ref_cm.CompressionModule(
        input_dim=cfg.hidden_size, hidden_dim=HID
    ).eval()

    wave = make_input(rng)
    params = {"params": {
        "encoder": enc_params["params"],
        "compression": {"proj": _dense_params(comp.mlp3)},
    }}
    return hf_model, comp, wave, cfg, params


@pytest.mark.parametrize("head_type", ["linear", "mlp"])
def test_stage1_to_stage2_scores_match_reference(
    chain, reference_dir, head_type
):
    hf_model, comp, wave, cfg, params = chain
    ref_s2 = _load_ref(reference_dir, "stage2_utils")

    torch.manual_seed(11)
    if head_type == "linear":
        head_t = ref_s2.LinearBinaryHead(in_dim=HID).eval()
        head_params = {"params": {"fc": _dense_params(head_t.fc)}}
    else:
        head_t = ref_s2.SmallMLPBinaryHead(
            in_dim=HID, hidden=8, dropout=0.2
        ).eval()
        head_params = {"params": {
            "fc1": _dense_params(head_t.net[0]),
            "fc2": _dense_params(head_t.net[3]),
        }}

    wave_t = torch.from_numpy(wave)
    mask_t = (wave_t != 0.0).long()  # reference: encoder.py:50-51
    with torch.no_grad():
        hs = _encoder_stack(hf_model, wave_t, mask_t)
        seq = comp(hs)                                  # (B, H, T)
        # reference: extract_stage1_embeddings.py:156-163
        z_ref = torch.nn.functional.normalize(seq.mean(dim=-1), p=2, dim=1)
        scores_ref = head_t(z_ref).numpy()              # raw logits

    det = SpoofDetector(encoder_config=cfg, hidden_dim=HID)
    z_ours = det.apply(params, wave, mode="embed")
    np.testing.assert_allclose(
        np.asarray(z_ours), z_ref.numpy(), atol=3e-4, rtol=1e-3
    )

    head = build_head(head_type, hidden=8)
    scores = head.apply(head_params, np.asarray(z_ours))
    np.testing.assert_allclose(
        np.asarray(scores), scores_ref, atol=5e-4, rtol=1e-3
    )


def test_baseline_end2end_logits_match_reference(chain):
    hf_model, comp, wave, cfg, params = chain

    torch.manual_seed(13)
    clf = torch.nn.Linear(HID, 1).eval()

    wave_t = torch.from_numpy(wave)
    mask_t = (wave_t != 0.0).long()
    with torch.no_grad():
        # the End2EndBCEModel chain (reference: baseline_train.py:167-176):
        # encoder stack -> compression -> UN-normalized time-mean -> Linear
        seq = comp(_encoder_stack(hf_model, wave_t, mask_t))
        logits_ref = clf(seq.mean(dim=-1)).squeeze(-1).numpy()

    det = SpoofDetector(encoder_config=cfg, hidden_dim=HID)
    full = {"params": dict(params["params"],
                           classifier=_dense_params(clf))}
    logits = det.apply(full, wave, mode="logits")
    np.testing.assert_allclose(
        np.asarray(logits), logits_ref, atol=5e-4, rtol=1e-3
    )
