"""wav2vec_contr_loss_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
spoofed-speech (audio deepfake) detection.

Re-designed from scratch with the capabilities of the reference repo
`JaskiratSudan/wav2vec_contr_loss` (PyTorch, single-GPU):

  * raw-waveform datasets (ASVspoof2019-LA, In-The-Wild, FamousFigures,
    ASVspoof2021-DF, RAVDESS, CommonVoice) with RawBoost augmentation,
  * a Wav2Vec2 encoder (strided-conv feature extractor + transformer,
    HF-checkpoint-convertible) + compression projection head,
  * fused supervised-contrastive losses (cosine / geodesic similarity,
    uniformity regularizer, top-K hard-negative mining with alpha blend)
    and the end-to-end BCE baseline,
  * the two-stage pipeline (Stage-1 embeddings -> Stage-2 classifier),
  * ASVspoof score files + EER / t-DCF evaluation,
  * data-parallel (and optional tensor-parallel) execution over a
    `jax.sharding.Mesh`, bf16 compute, static shapes throughout.

Subpackages:
  data/     protocol parsers, audio IO, balanced sampler, RawBoost, pipeline
  models/   wav2vec2 encoder, compression module, classifier heads, HF import
  ops/      pallas kernels and fused device ops
  losses/   supcon (binary + multiclass), bce
  train/    stage1 / stage2 / baseline loops, schedules, checkpointing
  eval/     EER / t-DCF metrics, score files, embedding extraction
  parallel/ mesh + sharding helpers
  viz/      UMAP/PCA embedding plots
  utils/    seeding, logging, timing
"""

__version__ = "0.1.0"
