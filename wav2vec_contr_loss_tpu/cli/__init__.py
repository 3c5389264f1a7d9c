"""Thin argparse CLIs over the library — the reference's L6 entry-point
scripts reimagined as `python -m wav2vec_contr_loss_tpu.cli.<name>`
(SURVEY.md §1 layer map).

  train_stage1            <- train_stage1.py / train_multiclass_con.py /
                             train_stage1_from_emb.py (via flags)
  train_stage2            <- train_stage2_classifier.py
  train_baseline          <- baseline_train.py
  extract_embeddings      <- extract_stage1_embeddings.py
  extract_encoder_features<- extract_encoder_embeddings.py
  generate_scores         <- generate_eval_score_file.py
  score_baseline          <- eval_baseline_score_file.py
  score_famous_figures    <- eval_famous_figures_score_file.py
  eval_scores             <- evaluation.py / eer_from_scores.py / notebook
  plot_umap               <- plot_stage1_umap_*.py / plot_subspace_umap_*.py
  run_pipeline            <- train_stage1.sbatch (the full experiment chain)
"""
