"""Multi-step training-TRAJECTORY parity against the reference torch loops.

Losses, AdamW numerics, pooling, and inference composition each have their
own torch-oracle tests; this file closes the remaining seam (VERDICT r3
missing #2): run the reference's actual training loop —
`stage1_utils.train_one_epoch` with the `train_stage1.py:93-96` optimizer
groups, and the baseline's `baseline_train.train_one_epoch`
(baseline_train.py:183-216) — side-by-side with our jitted trainers for
several epochs on IDENTICAL weights and IDENTICAL batch streams, and
assert per-step losses, per-epoch dev losses, and final parameter drift.
This is the one test where optimizer groups + head-only grad-clip + alpha
ramp + loss + sampler are exercised *jointly*.

Both sides run fp32 with every TPU fast-math knob pinned to the
reference-exact setting (softmax/layer-mean/adam-mu/adam-nu/grad dtypes =
float32, RawBoost off, dropout 0 so the trajectories are deterministic).
The torch side imports the reference modules as oracles (never vendored);
the encoder is a locally-built tiny HF model (no network), grafted into
the reference's own `encoder.Wav2Vec2Encoder` wrapper by stubbing its
`from_pretrained`.
"""

import copy
import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from wav2vec_contr_loss_tpu.config import BaselineConfig, Stage1Config  # noqa: E402
from wav2vec_contr_loss_tpu.data.pipeline import Batch  # noqa: E402
from wav2vec_contr_loss_tpu.data.sampler import BalancedBatchSampler  # noqa: E402
from wav2vec_contr_loss_tpu.models import (  # noqa: E402
    config_from_hf,
    convert_hf_state_dict,
)
from wav2vec_contr_loss_tpu.parallel import make_mesh  # noqa: E402
from wav2vec_contr_loss_tpu.train import BaselineTrainer, Stage1Trainer  # noqa: E402

REFERENCE_DIR = "/root/reference"

# ------------------------------------------------------------ tiny setup
SR, SECONDS = 2000, 1            # 2000 samples -> 99 frames (stride 20)
B, N_TRAIN, N_DEV = 8, 32, 16    # 4 train batches/epoch, 2 dev batches
EPOCHS = 3
HID = 16                         # compression hidden dim
HEAD_LR, ENC_LR, WD = 5e-3, 1e-3, 3e-3

TINY_HF_KW = dict(
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=64,
    conv_dim=(24, 24, 24),
    conv_kernel=(10, 3, 3),
    conv_stride=(5, 2, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    hidden_dropout=0.0,
    attention_dropout=0.0,
    activation_dropout=0.0,
    feat_proj_dropout=0.0,
    layerdrop=0.0,
    vocab_size=32,
    do_stable_layer_norm=True,
    feat_extract_norm="layer",
    conv_bias=True,
    # determinism: no SpecAugment in train mode on either side
    apply_spec_augment=False,
    mask_time_prob=0.0,
    mask_feature_prob=0.0,
)

# reference-exact knob set: every TPU fast-math deviation pinned off
EXACT_KNOBS = dict(
    compute_dtype="float32",
    softmax_dtype="float32",
    adam_mu_dtype="float32",
    adam_nu_dtype="float32",
    grad_dtype="float32",
    use_rawboost=False,
)


def _load_ref(name):
    """Load a reference module with /root/reference importable, so its
    sibling imports (RawBoost, encoder, loss, ...) resolve. data_loader is
    stubbed out (it imports librosa, absent here) — the trajectory tests
    feed arrays directly, never the reference's datasets."""
    path = os.path.join(REFERENCE_DIR, f"{name}.py")
    if not os.path.exists(path):
        pytest.skip(f"reference module {name} not mounted")
    if "data_loader" not in sys.modules:
        stub = types.ModuleType("data_loader")
        stub.ASVspoof2019Dataset = object
        stub.pad_collate_fn_speaker_source = None
        stub.pad_collate_fn_speaker_source_multiclass = None
        sys.modules["data_loader"] = stub
    sys.path.insert(0, REFERENCE_DIR)
    try:
        spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REFERENCE_DIR)
    return mod


def _one_device_mesh():
    return make_mesh(n_model=1, devices=np.array(jax.devices()[:1]))


def _make_data(rng):
    """(train waves/labels, dev waves/labels) with zero-padded tails on a
    third of the clips so the `wave != 0` mask path is live."""
    def mk(n):
        w = rng.normal(0, 0.2, (n, SR * SECONDS)).astype(np.float32)
        w[:: 3, -400:] = 0.0
        y = np.array(([1] * (n // 2)) + ([0] * (n // 2)), np.int64)
        return w, y

    return mk(N_TRAIN), mk(N_DEV)


def _make_torch_encoder(hf_model, finetune):
    """The reference's own Wav2Vec2Encoder wrapper (encoder.py:11-70)
    around a local deep-copied HF model — from_pretrained is stubbed, the
    freeze/requires_grad/train-eval logic is the reference's."""
    ref_enc = _load_ref("encoder")
    model_copy = copy.deepcopy(hf_model)
    ref_enc.Wav2Vec2Model = types.SimpleNamespace(
        from_pretrained=lambda name: model_copy
    )
    return ref_enc.Wav2Vec2Encoder(
        model_name="local-tiny", freeze_encoder=not finetune
    )


def _dense_params(linear):
    return {
        "kernel": jnp.asarray(linear.weight.detach().numpy().T),
        "bias": jnp.asarray(linear.bias.detach().numpy()),
    }


def _graft(state, mesh, **replacements):
    """Replace top-level trainable param subtrees, keeping device layout."""
    from wav2vec_contr_loss_tpu.parallel.mesh import replicated

    rep = replicated(mesh)
    p = dict(state.params)
    for k, v in replacements.items():
        p[k] = jax.device_put(v, rep)
    return state.replace(params=p)


class _RecordingLoss:
    """Wraps a reference loss module, recording every scalar it returns —
    the hook that turns `train_one_epoch`'s internal per-step losses into
    an observable without touching the reference code."""

    def __init__(self, inner):
        self.inner = inner
        self.record = []

    def __call__(self, *a, **k):
        out = self.inner(*a, **k)
        self.record.append(float(out.detach()))
        return out

    def take(self):
        out, self.record = self.record, []
        return out


class _ArrayPipe:
    """Minimal BatchPipeline stand-in over in-memory arrays, driven by the
    real BalancedBatchSampler — the same index stream is fed to the torch
    loader so both loops see identical batches."""

    rawboost = None

    def __init__(self, waves, labels, batch_size, seed):
        self.waves = waves
        self.labels = labels
        self.sampler = BalancedBatchSampler(labels, batch_size, seed=seed)

    def epoch_indices(self, epoch):
        return list(self.sampler.epoch_batches(epoch))

    def train_epoch(self, epoch, skip=0):
        for idx in self.epoch_indices(epoch)[skip:]:
            yield Batch(
                waveforms=self.waves[idx],
                labels=self.labels[idx].astype(np.int32),
                multi_labels=self.labels[idx].astype(np.int32),
                valid=np.ones(idx.size, bool),
            )

    def torch_loader(self, epoch):
        return [
            (torch.from_numpy(self.waves[idx]),
             torch.from_numpy(self.labels[idx]))
            for idx in self.epoch_indices(epoch)
        ]


def _tree_l2(a, b=None, exclude=()):
    """Global L2 norm of tree a (or of a - b), skipping any leaf whose
    path contains a key in `exclude`."""
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    lb = (jax.tree_util.tree_leaves(b) if b is not None
          else [None] * len(fa))
    assert len(fa) == len(lb)
    sq = 0.0
    for (path, x), y in zip(fa, lb):
        keys = {str(getattr(p, "key", p)) for p in path}
        if keys & set(exclude):
            continue
        d = np.asarray(x, np.float64)
        if y is not None:
            d = d - np.asarray(y, np.float64)
        sq += float(np.sum(d * d))
    return math.sqrt(sq)


def _assert_encoder_drift(ours, final_ref, init_ref):
    """Encoder drift bounds, split by parametrization:

    * everything except the positional conv: ours and the reference
      optimize the SAME parameters — drift must stay a small fraction of
      how far the reference moved;
    * pos_conv_embed: the conversion collapses torch's weight-norm (g, v)
      into a plain kernel (PARITY.md deviation #3) — AdamW then takes a
      genuinely different trajectory in the collapsed space (weight decay
      and per-param step scales act on different coordinates), so only a
      coarse same-order-of-movement bound is meaningful."""
    ex = ("pos_conv_embed",)
    moved = _tree_l2(final_ref, init_ref, exclude=ex)
    drift = _tree_l2(ours, final_ref, exclude=ex)
    assert moved > 1e-4, "encoder never moved — test is vacuous"
    assert drift <= 0.10 * moved + 1e-6, (
        f"encoder drift {drift:.2e} vs movement {moved:.2e}")

    def pc(tree):
        return tree["pos_conv_embed"]

    pc_moved = _tree_l2(pc(final_ref), pc(init_ref))
    pc_drift = _tree_l2(pc(ours), pc(final_ref))
    assert pc_drift <= 0.5 * pc_moved + 1e-6, (
        f"pos-conv drift {pc_drift:.2e} vs movement {pc_moved:.2e} "
        "(weight-norm collapse, PARITY.md deviation #3)")


# ================================================================ stage 1
@pytest.mark.parametrize("finetune", [False, True],
                         ids=["frozen", "finetune"])
def test_stage1_trajectory_matches_reference(reference_dir, finetune):
    """N epochs of Stage1Trainer.fit vs the reference's train_one_epoch
    (reference: stage1_utils.py:102-153) + evaluate (139-153) with the
    train_stage1.py:93-96 optimizer groups: per-step train losses,
    per-epoch dev losses, and final parameter drift must agree."""
    ref_su = _load_ref("stage1_utils")
    ref_cm = _load_ref("compression_module")
    ref_loss = _load_ref("loss")

    rng = np.random.default_rng(42)
    (train_w, train_y), (dev_w, dev_y) = _make_data(rng)

    hf_cfg = transformers.Wav2Vec2Config(**TINY_HF_KW)
    torch.manual_seed(0)
    hf_model = transformers.Wav2Vec2Model(hf_cfg)

    # ---------------- torch (reference) side ----------------
    encoder_t = _make_torch_encoder(hf_model, finetune)
    torch.manual_seed(7)
    comp_t = ref_cm.CompressionModule(
        input_dim=hf_cfg.hidden_size, hidden_dim=HID, dropout_rate=0.0
    )
    uniformity_weight = 0.0 if finetune else 0.05
    loss_t = _RecordingLoss(ref_loss.SupConBinaryLoss(
        temperature=0.2, similarity="cosine",
        uniformity_weight=uniformity_weight, uniformity_t=2.0,
    ))
    groups = [{"params": comp_t.parameters(), "lr": HEAD_LR}]
    if finetune:
        groups.append({"params": encoder_t.parameters(), "lr": ENC_LR})
    optim_t = torch.optim.AdamW(groups, weight_decay=WD)
    ref_cfg = types.SimpleNamespace(
        finetune_encoder=finetune, use_rawboost=False, topk_neg=2,
        warmup_epochs=1, alpha_ramp_epochs=2, alpha_end=0.8,
        target_sample_rate=SR, rawboost_prob=0.0,
    )

    comp_init = copy.deepcopy(comp_t.state_dict())
    enc_init_sd = copy.deepcopy(encoder_t.model.state_dict())

    train_pipe = _ArrayPipe(train_w, train_y, B, seed=5)
    dev_pipe = _ArrayPipe(dev_w, dev_y, B, seed=6)

    ref_step_losses, ref_dev_losses, ref_alphas = [], [], []
    device = torch.device("cpu")
    for epoch in range(1, EPOCHS + 1):
        _, alpha = ref_su.train_one_epoch(
            encoder_t, comp_t, loss_t, train_pipe.torch_loader(epoch),
            optim_t, device, epoch, ref_cfg,
        )
        ref_alphas.append(alpha)
        ref_step_losses.extend(loss_t.take())
        ref_dev_losses.append(ref_su.evaluate(
            encoder_t, comp_t, loss_t, dev_pipe.torch_loader(epoch),
            device, ref_cfg,
        ))
        loss_t.take()

    # ---------------- ours ----------------
    enc_cfg = config_from_hf(hf_cfg)
    enc_params = convert_hf_state_dict(hf_model.state_dict(), enc_cfg)
    cfg = Stage1Config(
        batch_size=B, max_duration_seconds=SECONDS, target_sample_rate=SR,
        input_dim=hf_cfg.hidden_size, hidden_dim=HID, dropout=0.0,
        epochs=EPOCHS, head_lr=HEAD_LR, enc_lr=ENC_LR, weight_decay=WD,
        finetune_encoder=finetune, temperature=0.2,
        supcon_similarity="cosine", uniformity_weight=uniformity_weight,
        uniformity_t=2.0, topk_neg=2, warmup_epochs=1, alpha_ramp_epochs=2,
        alpha_end=0.8, seed=0, **EXACT_KNOBS,
    )
    mesh = _one_device_mesh()
    trainer = Stage1Trainer(cfg, enc_config=enc_cfg, enc_params=enc_params,
                            mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    # graft the torch head's INITIAL weights (comp_t itself has already been
    # trained by the reference loop above)
    state = _graft(state, mesh, compression={"proj": {
        "kernel": jnp.asarray(comp_init["mlp3.weight"].numpy().T),
        "bias": jnp.asarray(comp_init["mlp3.bias"].numpy())}})

    our_step_losses = []
    orig_step = trainer.train_step

    def recording_step(s, batch, alpha):
        s, m = orig_step(s, batch, alpha)
        our_step_losses.append(m["loss"])
        return s, m

    trainer.train_step = recording_step
    state, history = trainer.fit(state, train_pipe, dev_pipe,
                                 log_fn=lambda *_: None)
    our_step_losses = [float(x) for x in jax.device_get(our_step_losses)]

    # ---------------- assertions ----------------
    np.testing.assert_allclose(history["alpha"], ref_alphas, atol=1e-9)
    assert len(our_step_losses) == len(ref_step_losses) == EPOCHS * (
        N_TRAIN // B)
    np.testing.assert_allclose(
        our_step_losses, ref_step_losses, rtol=2e-3, atol=2e-3,
        err_msg="per-step train losses diverged from the torch reference",
    )
    np.testing.assert_allclose(
        history["dev_loss"], ref_dev_losses, rtol=2e-3, atol=2e-3,
        err_msg="per-epoch dev losses diverged from the torch reference",
    )

    # final parameter drift, normalized by how far the reference MOVED
    comp_final_ref = {"proj": _dense_params(comp_t.mlp3)}
    comp_moved = _tree_l2(
        comp_final_ref,
        {"proj": {"kernel": comp_init["mlp3.weight"].numpy().T,
                  "bias": comp_init["mlp3.bias"].numpy()}})
    comp_drift = _tree_l2(state.params["compression"], comp_final_ref)
    assert comp_moved > 1e-3, "head never moved — test is vacuous"
    assert comp_drift <= 0.05 * comp_moved + 1e-6, (
        f"head drift {comp_drift:.2e} vs reference movement {comp_moved:.2e}")

    if finetune:
        _assert_encoder_drift(
            state.params["encoder"],
            convert_hf_state_dict(encoder_t.model.state_dict(), enc_cfg),
            convert_hf_state_dict(enc_init_sd, enc_cfg))
    else:
        # frozen side never touches the encoder — bit-identical to init
        for a, b in zip(
            jax.tree_util.tree_leaves(state.frozen["encoder"]),
            jax.tree_util.tree_leaves(enc_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ================================================================ baseline
@pytest.mark.parametrize("finetune", [False, True],
                         ids=["frozen", "finetune"])
def test_baseline_trajectory_matches_reference(reference_dir, finetune):
    """N epochs of BaselineTrainer.train_step vs the reference baseline's
    train_one_epoch (reference: baseline_train.py:183-217, fp32 path,
    scaler=None) with its optimizer groups (baseline_train.py:360-367) and
    all-params grad clip: per-step train losses, dev BCE loss, and final
    parameter drift must agree."""
    ref_bl = _load_ref("baseline_train")
    ref_cm = _load_ref("compression_module")
    ref_loss = _load_ref("loss")
    ref_bl.USE_RAWBOOST = False  # module-level flag read by train_one_epoch

    rng = np.random.default_rng(43)
    (train_w, train_y), (dev_w, dev_y) = _make_data(rng)
    pos_weight = 3.7  # arbitrary class-imbalance ratio, shared by both

    hf_cfg = transformers.Wav2Vec2Config(**TINY_HF_KW)
    torch.manual_seed(1)
    hf_model = transformers.Wav2Vec2Model(hf_cfg)

    # ---------------- torch (reference) side ----------------
    encoder_t = _make_torch_encoder(hf_model, finetune)
    torch.manual_seed(9)
    comp_t = ref_cm.CompressionModule(
        input_dim=hf_cfg.hidden_size, hidden_dim=HID, dropout_rate=0.0
    )
    model_t = ref_bl.End2EndBCEModel(
        encoder=encoder_t, compression=comp_t, hidden_dim=HID,
        finetune_encoder=finetune,
    )
    loss_t = _RecordingLoss(ref_loss.BCEBinaryLoss(pos_weight=pos_weight))
    groups = [
        {"params": model_t.compression.parameters(), "lr": HEAD_LR},
        {"params": model_t.classifier.parameters(), "lr": HEAD_LR},
    ]
    if finetune:
        groups.insert(0, {"params": model_t.encoder.parameters(),
                          "lr": ENC_LR})
    optim_t = torch.optim.AdamW(groups, weight_decay=WD)

    comp_init = copy.deepcopy(comp_t.state_dict())
    cls_init = copy.deepcopy(model_t.classifier.state_dict())

    train_pipe = _ArrayPipe(train_w, train_y, B, seed=15)

    ref_step_losses, ref_dev_losses = [], []
    device = torch.device("cpu")
    dev_w_t = torch.from_numpy(dev_w)
    dev_y_t = torch.from_numpy(dev_y).float()
    for epoch in range(1, EPOCHS + 1):
        ref_bl.train_one_epoch(
            model_t, loss_t, train_pipe.torch_loader(epoch), optim_t,
            device, scaler=None,
        )
        ref_step_losses.extend(loss_t.take())
        model_t.eval()
        with torch.no_grad():
            logits, _ = model_t(dev_w_t, (dev_w_t != 0.0).long())
            ref_dev_losses.append(float(loss_t.inner(logits, dev_y_t)))

    # ---------------- ours ----------------
    enc_cfg = config_from_hf(hf_cfg)
    enc_params = convert_hf_state_dict(hf_model.state_dict(), enc_cfg)
    cfg = BaselineConfig(
        batch_size=B, max_duration_seconds=SECONDS, target_sample_rate=SR,
        input_dim=hf_cfg.hidden_size, hidden_dim=HID, dropout=0.0,
        epochs=EPOCHS, head_lr=HEAD_LR, enc_lr=ENC_LR, weight_decay=WD,
        finetune_encoder=finetune, use_pos_weight=True, seed=0,
        **EXACT_KNOBS,
    )
    mesh = _one_device_mesh()
    trainer = BaselineTrainer(cfg, enc_config=enc_cfg, enc_params=enc_params,
                              mesh=mesh, pos_weight=pos_weight)
    state = trainer.init_state(jax.random.PRNGKey(0))
    # graft the torch heads' INITIAL weights (the torch modules above have
    # already been trained by the reference loop)
    state = _graft(
        state, mesh,
        compression={"proj": {
            "kernel": jnp.asarray(comp_init["mlp3.weight"].numpy().T),
            "bias": jnp.asarray(comp_init["mlp3.bias"].numpy())}},
        classifier={
            "kernel": jnp.asarray(cls_init["weight"].numpy().T),
            "bias": jnp.asarray(cls_init["bias"].numpy())},
    )

    our_step_losses, our_dev_losses = [], []
    for epoch in range(1, EPOCHS + 1):
        for batch in train_pipe.train_epoch(epoch):
            state, m = trainer.train_step(state, {
                "waveforms": jnp.asarray(batch.waveforms),
                "labels": jnp.asarray(batch.labels),
            })
            our_step_losses.append(m["loss"])
        logits = trainer.logits_step(state, jnp.asarray(dev_w))
        from wav2vec_contr_loss_tpu.losses import bce_logits_loss

        our_dev_losses.append(float(bce_logits_loss(
            logits, jnp.asarray(dev_y.astype(np.int32)), pos_weight)))
    our_step_losses = [float(x) for x in jax.device_get(our_step_losses)]

    # ---------------- assertions ----------------
    assert len(our_step_losses) == len(ref_step_losses) == EPOCHS * (
        N_TRAIN // B)
    np.testing.assert_allclose(
        our_step_losses, ref_step_losses, rtol=2e-3, atol=2e-3,
        err_msg="per-step baseline losses diverged from the torch reference",
    )
    np.testing.assert_allclose(
        our_dev_losses, ref_dev_losses, rtol=2e-3, atol=2e-3,
        err_msg="dev BCE losses diverged from the torch reference",
    )

    head_final_ref = {
        "compression": {"proj": _dense_params(comp_t.mlp3)},
        "classifier": _dense_params(model_t.classifier),
    }
    head_init_ref = {
        "compression": {"proj": {
            "kernel": comp_init["mlp3.weight"].numpy().T,
            "bias": comp_init["mlp3.bias"].numpy()}},
        "classifier": {
            "kernel": cls_init["weight"].numpy().T,
            "bias": cls_init["bias"].numpy()},
    }
    moved = _tree_l2(head_final_ref, head_init_ref)
    ours_head = {k: state.params[k] for k in ("compression", "classifier")}
    drift = _tree_l2(ours_head, head_final_ref)
    assert moved > 1e-3, "heads never moved — test is vacuous"
    assert drift <= 0.05 * moved + 1e-6, (
        f"head drift {drift:.2e} vs reference movement {moved:.2e}")

    if finetune:
        _assert_encoder_drift(
            state.params["encoder"],
            convert_hf_state_dict(encoder_t.model.state_dict(), enc_cfg),
            convert_hf_state_dict(hf_model.state_dict(), enc_cfg))


# ================================================================ stage 2
class _NNProxy:
    """Stand-in for the reference module's `nn` import that wraps
    BCEWithLogitsLoss with a per-call recorder — per-step losses out of
    `train_classifier` without touching the reference code."""

    def __init__(self):
        self.record = []

    def __getattr__(self, k):
        return getattr(torch.nn, k)

    def BCEWithLogitsLoss(self, **kw):
        inner = torch.nn.BCEWithLogitsLoss(**kw)
        rec = self.record

        class _Rec(torch.nn.Module):
            def forward(self, a, b):
                out = inner(a, b)
                rec.append(float(out.detach()))
                return out

        return _Rec()


class _EpochShuffledLoader:
    """torch-side loader reproducing train_stage2's internal per-epoch
    shuffle: each iter() advances the SAME np rng sequence
    (train/stage2.py _batchify with np_rng seeded by cfg.seed)."""

    def __init__(self, x, y, bs, seed):
        from wav2vec_contr_loss_tpu.train.stage2 import _batchify

        self._batchify = _batchify
        self.x, self.y, self.bs = x, y, bs
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        xs, ys, ms = self._batchify(self.x, self.y.astype(np.float32),
                                    self.bs, self.rng)
        # trim the zero-padded tail batch back to its real clips — the
        # torch DataLoader yields the partial batch unpadded
        # (drop_last=False)
        return iter([(torch.from_numpy(xs[i][ms[i]]),
                      torch.from_numpy(ys[i][ms[i]]))
                     for i in range(xs.shape[0])])


@pytest.mark.parametrize("head_type", ["linear", "mlp"])
def test_stage2_trajectory_matches_reference(reference_dir, tmp_path,
                                             capsys, head_type):
    """N epochs of train_stage2 vs the reference's train_classifier
    (reference: stage2_utils.py:86-237): per-step train losses, per-batch
    dev losses, dev acc/EER, the best-epoch choice, and the best head's
    parameter drift must agree. Identical initial weights (init_params
    injection), identical batch streams (the torch loader replays our
    shuffle rng). N_train is deliberately NOT divisible by the batch
    size: our train path pads + masks the final partial batch where the
    reference trains it unpadded (drop_last=False,
    train_stage2_classifier.py:46-50) — the per-step losses, including
    the partial batch's, must still agree (deviation #11 removed, r5)."""
    ref_s2 = _load_ref("stage2_utils")
    proxy = _NNProxy()
    ref_s2.nn = proxy  # record per-call BCE losses (train AND dev)

    from wav2vec_contr_loss_tpu.config import Stage2Config
    from wav2vec_contr_loss_tpu.losses import pos_weight_from_labels
    from wav2vec_contr_loss_tpu.train.stage2 import train_stage2

    rng = np.random.default_rng(11)
    n_train, n_dev, d, bs, epochs = 70, 32, 16, 8, 4  # tail batch of 6

    def clustered(n, n_pos):
        y = np.concatenate([np.ones(n_pos), np.zeros(n - n_pos)]
                           ).astype(np.int64)
        x = rng.normal(size=(n, d)).astype(np.float32)
        x += 0.6 * y[:, None].astype(np.float32)
        return x, y

    xtr, ytr = clustered(n_train, 24)  # unbalanced: pos_weight = 46/24
    xdv, ydv = clustered(n_dev, 16)

    pw_ref = ref_s2.compute_pos_weight(ytr)
    assert abs(pw_ref - float(pos_weight_from_labels(ytr))) < 1e-9

    # ---------------- torch (reference) side ----------------
    cfg_ref = types.SimpleNamespace(
        head_type=head_type, hidden_dim=8, dropout=0.0, lr=5e-3,
        weight_decay=1e-4, epochs=epochs, patience=100, log_every=10 ** 9,
        save_dir=str(tmp_path / "ref_ckpt"),
    )
    torch.manual_seed(3)
    clf_probe = ref_s2.build_head(cfg_ref, in_dim=d)  # capture the init
    init_sd = copy.deepcopy(clf_probe.state_dict())

    train_loader = _EpochShuffledLoader(xtr, ytr, bs, seed=1337)
    dev_batches = [(torch.from_numpy(xdv[i:i + bs]),
                    torch.from_numpy(ydv[i:i + bs]).float())
                   for i in range(0, n_dev, bs)]
    torch.manual_seed(3)  # train_classifier rebuilds the identical head
    best_path = ref_s2.train_classifier(
        cfg_ref, train_loader, dev_batches, torch.device("cpu"),
        in_dim=d, pos_weight_val=pw_ref, ckpt_cfg={},
    )
    printed = capsys.readouterr().out
    steps_per_epoch = -(-n_train // bs)  # ceil: the partial batch trains
    per_epoch = steps_per_epoch + len(dev_batches)
    ref_train_steps, ref_dev_losses = [], []
    for e in range(epochs):
        chunk = proxy.record[e * per_epoch:(e + 1) * per_epoch]
        ref_train_steps.extend(chunk[:steps_per_epoch])
        ref_dev_losses.append(
            float(np.mean(chunk[steps_per_epoch:])))  # equal-size batches
    ref_best_epochs = [int(line.split("]")[0].split()[-1])
                       for line in printed.splitlines() if "New best" in line]

    # ---------------- ours ----------------
    if head_type == "linear":
        init_params = {"fc": {
            "kernel": jnp.asarray(init_sd["fc.weight"].numpy().T),
            "bias": jnp.asarray(init_sd["fc.bias"].numpy())}}
    else:
        init_params = {
            "fc1": {"kernel": jnp.asarray(init_sd["net.0.weight"].numpy().T),
                    "bias": jnp.asarray(init_sd["net.0.bias"].numpy())},
            "fc2": {"kernel": jnp.asarray(init_sd["net.3.weight"].numpy().T),
                    "bias": jnp.asarray(init_sd["net.3.bias"].numpy())},
        }
    cfg = Stage2Config(head_type=head_type, hidden_dim=8, dropout=0.0,
                       lr=5e-3, weight_decay=1e-4, batch_size=bs,
                       epochs=epochs, patience=100, seed=1337)
    best_params, history = train_stage2(
        cfg, xtr, ytr, xdv, ydv, log_fn=lambda *_: None,
        init_params=init_params)

    # ---------------- assertions ----------------
    our_steps = np.concatenate(history["step_losses"])
    np.testing.assert_allclose(
        our_steps, ref_train_steps, rtol=1e-4, atol=1e-4,
        err_msg="per-step stage-2 train losses diverged")
    np.testing.assert_allclose(
        history["dev_loss"], ref_dev_losses, rtol=1e-4, atol=1e-4,
        err_msg="per-epoch stage-2 dev losses diverged")

    # dev metrics as printed by the reference (acc 2dp %, eer 2dp %)
    for e, line in enumerate(
            l for l in printed.splitlines() if "dev_acc=" in l):
        ref_acc = float(line.split("dev_acc=")[1].split("%")[0]) / 100
        assert abs(history["dev_acc"][e] - ref_acc) < 5e-3
        if "dev_eer=" in line and "N/A" not in line.split("dev_eer=")[1]:
            ref_eer = float(line.split("dev_eer=")[1].split("%")[0]) / 100
            # different-but-equivalent EER definitions (sklearn roc_curve
            # nanargmin vs our tie-group sweep) can land a couple of
            # threshold steps apart on a tiny dev set; the EER math itself
            # is bit-exact-tested in tests/test_metrics.py
            assert abs(history["dev_eer"][e] - ref_eer) <= 2 / n_dev + 1e-4

    # both sides must pick the same best epoch, and the best heads match
    our_best_epochs = [e + 1 for e in range(epochs)
                       if e == 0 or history["dev_eer"][e]
                       < min(history["dev_eer"][:e])]
    assert ref_best_epochs, "reference never improved — test is vacuous"
    assert ref_best_epochs[-1] == our_best_epochs[-1], (
        ref_best_epochs, our_best_epochs)
    best_sd = torch.load(best_path, weights_only=False)["model_state_dict"]
    if head_type == "linear":
        ref_best = {"fc": {"kernel": best_sd["fc.weight"].numpy().T,
                           "bias": best_sd["fc.bias"].numpy()}}
    else:
        ref_best = {
            "fc1": {"kernel": best_sd["net.0.weight"].numpy().T,
                    "bias": best_sd["net.0.bias"].numpy()},
            "fc2": {"kernel": best_sd["net.3.weight"].numpy().T,
                    "bias": best_sd["net.3.bias"].numpy()},
        }
    moved = _tree_l2(ref_best, jax.tree_util.tree_map(np.asarray,
                                                      init_params))
    drift = _tree_l2(best_params, ref_best)
    assert moved > 1e-3, "stage-2 head never moved — test is vacuous"
    assert drift <= 0.05 * moved + 1e-6, (
        f"stage-2 best-head drift {drift:.2e} vs movement {moved:.2e}")


# ============================================================== multiclass
def test_multiclass_trajectory_matches_reference(reference_dir):
    """N epochs of Stage1Trainer(loss_mode='multiclass') vs the
    reference's multiclass loop (reference: train_multiclass_con.py
    train_one_epoch:125-180 + evaluate_on_dev:186-214): frozen encoder,
    head-only AdamW + clip 5.0, SupConMultiClassLoss over attack-id
    labels. Per-step losses, dev losses, and head drift must agree."""
    ref_mc = _load_ref("train_multiclass_con")
    ref_cm = _load_ref("compression_module")
    ref_loss = _load_ref("loss")

    rng = np.random.default_rng(44)
    (train_w, _), (dev_w, _) = _make_data(rng)
    # attack-id labels: bona=0 for the first half (binary 1), attacks 1..3
    # cycling over the second half (binary 0) — the reference's multiclass
    # collate contract (collate.py multiclass variant)
    def multi_of(n):
        bin_y = np.array(([1] * (n // 2)) + ([0] * (n // 2)), np.int64)
        multi = np.where(bin_y == 1, 0, 1 + (np.arange(n) % 3)).astype(
            np.int64)
        return bin_y, multi

    bin_tr, multi_tr = multi_of(N_TRAIN)
    bin_dv, multi_dv = multi_of(N_DEV)

    hf_cfg = transformers.Wav2Vec2Config(**TINY_HF_KW)
    torch.manual_seed(2)
    hf_model = transformers.Wav2Vec2Model(hf_cfg)

    # ---------------- torch (reference) side ----------------
    encoder_t = _make_torch_encoder(hf_model, finetune=False)
    torch.manual_seed(8)
    comp_t = ref_cm.CompressionModule(
        input_dim=hf_cfg.hidden_size, hidden_dim=HID, dropout_rate=0.0)
    loss_t = _RecordingLoss(ref_loss.SupConMultiClassLoss(temperature=0.1))
    optim_t = torch.optim.AdamW(comp_t.parameters(), lr=HEAD_LR,
                                weight_decay=WD)
    comp_init = copy.deepcopy(comp_t.state_dict())

    train_pipe = _ArrayPipe(train_w, bin_tr, B, seed=25)
    dev_pipe = _ArrayPipe(dev_w, bin_dv, B, seed=26)

    def five_tuple_loader(pipe, waves, multi, epoch):
        return [
            (torch.from_numpy(waves[idx]),
             torch.from_numpy((multi[idx] == 0).astype(np.int64)),
             torch.from_numpy(multi[idx]), None, None)
            for idx in pipe.epoch_indices(epoch)
        ]

    device = torch.device("cpu")
    ref_step_losses, ref_dev_losses = [], []
    for epoch in range(1, EPOCHS + 1):
        ref_mc.train_one_epoch(
            encoder_t, comp_t, loss_t,
            five_tuple_loader(train_pipe, train_w, multi_tr, epoch),
            optim_t, device, epoch, warmup_epochs=1, log_every=10 ** 9)
        ref_step_losses.extend(loss_t.take())
        ref_dev_losses.append(ref_mc.evaluate_on_dev(
            encoder_t, comp_t, loss_t,
            five_tuple_loader(dev_pipe, dev_w, multi_dv, epoch), device))
        loss_t.take()

    # ---------------- ours ----------------
    enc_cfg = config_from_hf(hf_cfg)
    enc_params = convert_hf_state_dict(hf_model.state_dict(), enc_cfg)
    cfg = Stage1Config(
        batch_size=B, max_duration_seconds=SECONDS, target_sample_rate=SR,
        input_dim=hf_cfg.hidden_size, hidden_dim=HID, dropout=0.0,
        epochs=EPOCHS, head_lr=HEAD_LR, weight_decay=WD,
        finetune_encoder=False, seed=0, **EXACT_KNOBS)
    mesh = _one_device_mesh()
    trainer = Stage1Trainer(cfg, enc_config=enc_cfg, enc_params=enc_params,
                            mesh=mesh, loss_mode="multiclass",
                            multiclass_temperature=0.1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = _graft(state, mesh, compression={"proj": {
        "kernel": jnp.asarray(comp_init["mlp3.weight"].numpy().T),
        "bias": jnp.asarray(comp_init["mlp3.bias"].numpy())}})

    our_steps, our_dev = [], []
    alpha0 = jnp.zeros((), jnp.float32)
    for epoch in range(1, EPOCHS + 1):
        for idx in train_pipe.epoch_indices(epoch):
            batch = {
                "waveforms": jnp.asarray(train_w[idx]),
                "labels": jnp.asarray((multi_tr[idx] == 0).astype(np.int32)),
                "multi_labels": jnp.asarray(multi_tr[idx].astype(np.int32)),
            }
            state, m = trainer.train_step(state, batch, alpha0)
            our_steps.append(m["loss"])
        dls = []
        for idx in dev_pipe.epoch_indices(epoch):
            dls.append(trainer.eval_step(state, {
                "waveforms": jnp.asarray(dev_w[idx]),
                "labels": jnp.asarray((multi_dv[idx] == 0).astype(np.int32)),
                "multi_labels": jnp.asarray(multi_dv[idx].astype(np.int32)),
            }))
        our_dev.append(float(np.mean(jax.device_get(dls))))
    our_steps = [float(x) for x in jax.device_get(our_steps)]

    # ---------------- assertions ----------------
    np.testing.assert_allclose(
        our_steps, ref_step_losses, rtol=2e-3, atol=2e-3,
        err_msg="per-step multiclass losses diverged")
    np.testing.assert_allclose(
        our_dev, ref_dev_losses, rtol=2e-3, atol=2e-3,
        err_msg="multiclass dev losses diverged")

    comp_final_ref = {"proj": _dense_params(comp_t.mlp3)}
    moved = _tree_l2(comp_final_ref, {"proj": {
        "kernel": comp_init["mlp3.weight"].numpy().T,
        "bias": comp_init["mlp3.bias"].numpy()}})
    drift = _tree_l2(state.params["compression"], comp_final_ref)
    assert moved > 1e-3, "head never moved — test is vacuous"
    assert drift <= 0.05 * moved + 1e-6, (
        f"multiclass head drift {drift:.2e} vs movement {moved:.2e}")


# ============================================================ from-features
def test_from_features_trajectory_matches_reference(reference_dir):
    """N epochs of Stage1Trainer.fit_from_features vs the reference's
    precomputed-embedding loop (reference: train_stage1_from_emb.py
    train_one_epoch:116-145 + evaluate:148-161): head-only AdamW with
    clip 5.0, SupConBinaryLoss with alpha ramp, features fed as
    (B, F, T') stacks. Per-step losses, dev losses, alpha, and head
    drift must agree — this closes the fifth and last reference
    training loop."""
    ref_fe = _load_ref("train_stage1_from_emb")
    ref_cm = _load_ref("compression_module")
    ref_loss = _load_ref("loss")
    # pin the reference's module-constant knobs to the test recipe
    ref_fe.TOPK_NEG = 2
    ref_fe.WARMUP_EPOCHS = 1
    ref_fe.ALPHA_RAMP_EPOCHS = 2
    ref_fe.ALPHA_END = 0.8

    rng = np.random.default_rng(45)
    f_dim, t_frames = 24, 10

    def feats(n):
        x = rng.normal(size=(n, f_dim, t_frames)).astype(np.float32)
        y = np.array(([1] * (n // 2)) + ([0] * (n // 2)), np.int64)
        return x, y

    xtr, ytr = feats(N_TRAIN)
    xdv, ydv = feats(N_DEV)

    # ---------------- torch (reference) side ----------------
    torch.manual_seed(17)
    comp_t = ref_cm.CompressionModule(
        input_dim=f_dim, hidden_dim=HID, dropout_rate=0.0)
    loss_t = _RecordingLoss(ref_loss.SupConBinaryLoss(
        temperature=0.2, similarity="cosine"))
    optim_t = torch.optim.AdamW(comp_t.parameters(), lr=HEAD_LR,
                                weight_decay=WD)
    comp_init = copy.deepcopy(comp_t.state_dict())

    # replay the exact sampler streams fit_from_features builds
    # internally (seed=cfg.seed train, seed+1 dev)
    tr_sampler = BalancedBatchSampler(ytr, B, seed=0)
    dv_sampler = BalancedBatchSampler(ydv, B, seed=1)

    def loader(x, y, sampler, epoch):
        return [(torch.from_numpy(x[idx]), torch.from_numpy(y[idx]))
                for idx in sampler.epoch_batches(epoch)]

    device = torch.device("cpu")
    ref_steps, ref_dev, ref_alphas = [], [], []
    for epoch in range(1, EPOCHS + 1):
        _, alpha = ref_fe.train_one_epoch(
            comp_t, loss_t, loader(xtr, ytr, tr_sampler, epoch), optim_t,
            device, epoch)
        ref_alphas.append(alpha)
        ref_steps.extend(loss_t.take())
        ref_dev.append(ref_fe.evaluate(
            comp_t, loss_t, loader(xdv, ydv, dv_sampler, epoch), device))
        loss_t.take()

    # ---------------- ours ----------------
    cfg = Stage1Config(
        batch_size=B, input_dim=f_dim, hidden_dim=HID, dropout=0.0,
        epochs=EPOCHS, head_lr=HEAD_LR, weight_decay=WD, temperature=0.2,
        supcon_similarity="cosine", topk_neg=2, warmup_epochs=1,
        alpha_ramp_epochs=2, alpha_end=0.8, seed=0, **EXACT_KNOBS)
    mesh = _one_device_mesh()
    trainer = Stage1Trainer(cfg, mesh=mesh, from_features=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = _graft(state, mesh, compression={"proj": {
        "kernel": jnp.asarray(comp_init["mlp3.weight"].numpy().T),
        "bias": jnp.asarray(comp_init["mlp3.bias"].numpy())}})

    our_steps = []
    orig_step = trainer.train_step

    def recording_step(s, batch, alpha):
        s, m = orig_step(s, batch, alpha)
        our_steps.append(m["loss"])
        return s, m

    trainer.train_step = recording_step
    state, history = trainer.fit_from_features(
        state, xtr, ytr, dev_features=xdv, dev_labels=ydv,
        log_fn=lambda *_: None)
    our_steps = [float(x) for x in jax.device_get(our_steps)]

    # ---------------- assertions ----------------
    np.testing.assert_allclose(history["alpha"], ref_alphas, atol=1e-9)
    assert len(our_steps) == len(ref_steps) == EPOCHS * (N_TRAIN // B)
    np.testing.assert_allclose(
        our_steps, ref_steps, rtol=5e-4, atol=5e-4,
        err_msg="per-step from-features losses diverged")
    np.testing.assert_allclose(
        history["dev_loss"], ref_dev, rtol=5e-4, atol=5e-4,
        err_msg="from-features dev losses diverged")

    comp_final_ref = {"proj": _dense_params(comp_t.mlp3)}
    moved = _tree_l2(comp_final_ref, {"proj": {
        "kernel": comp_init["mlp3.weight"].numpy().T,
        "bias": comp_init["mlp3.bias"].numpy()}})
    drift = _tree_l2(state.params["compression"], comp_final_ref)
    assert moved > 1e-3, "head never moved — test is vacuous"
    assert drift <= 0.05 * moved + 1e-6, (
        f"from-features head drift {drift:.2e} vs movement {moved:.2e}")
