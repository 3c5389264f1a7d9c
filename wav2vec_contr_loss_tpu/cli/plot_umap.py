"""Embedding visualization CLI: 2-D UMAP/PCA plots of stage-1 embeddings
colored by attack type (ASV) or real-vs-spoof (ITW)
(reference: plot_stage1_umap_asv.py, plot_stage1_umap_itw.py)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..eval.extract import load_embeddings
from ..viz import plot_embeddings_2d


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--emb_dir", type=str, required=True)
    p.add_argument("--split", type=str, default="eval")
    p.add_argument("--out_dir", type=str, default="plots")
    p.add_argument("--multi_labels", type=str, default=None,
                   help=".npy of attack-id classes for per-attack coloring")
    p.add_argument("--seed", type=int, default=1337)
    args = p.parse_args(argv)

    embs, labels = load_embeddings(args.emb_dir, args.split)
    if args.multi_labels:
        labels = np.load(args.multi_labels)
        names = None
    else:
        names = {1: "Real", 0: "Spoof"}
    out_png = os.path.join(args.out_dir, f"umap_{args.split}.png")
    out_html = os.path.join(args.out_dir, f"umap_{args.split}.html")
    plot_embeddings_2d(
        embs, labels, out_png,
        title=f"Stage-1 embeddings ({args.split})",
        label_names=names, out_html=out_html, seed=args.seed,
    )
    print(f"Wrote {out_png}")


if __name__ == "__main__":
    main()
