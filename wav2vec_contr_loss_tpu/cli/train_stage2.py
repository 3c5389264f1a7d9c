"""Stage-2 classifier training CLI over extracted embeddings
(reference: train_stage2_classifier.py + stage2_config.py)."""

from __future__ import annotations

import argparse

from ..config import Stage2Config
from ..eval.extract import load_embeddings
from ..train import train_stage2
from ..utils import set_seed


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--emb_dir", type=str, required=True,
                   help="directory with <split>_embeddings.npy / _labels.npy")
    p.add_argument("--train_split", type=str, default="train")
    p.add_argument("--dev_split", type=str, default="dev")
    p.add_argument("--save_dir", type=str, default="checkpoints_stage2/run")
    p.add_argument("--head_type", type=str, default="linear",
                   choices=["linear", "mlp"])
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--patience", type=int, default=15)
    p.add_argument("--seed", type=int, default=1337)
    args = p.parse_args(argv)

    set_seed(args.seed)
    train_embs, train_labels = load_embeddings(args.emb_dir, args.train_split)
    dev_embs, dev_labels = load_embeddings(args.emb_dir, args.dev_split)
    cfg = Stage2Config(
        head_type=args.head_type, in_dim=train_embs.shape[1],
        hidden_dim=args.hidden_dim, dropout=args.dropout, lr=args.lr,
        weight_decay=args.weight_decay, epochs=args.epochs,
        batch_size=args.batch_size, patience=args.patience, seed=args.seed,
    )
    train_stage2(cfg, train_embs, train_labels, dev_embs, dev_labels,
                 save_dir=args.save_dir)
    print(f"==> Stage-2 training complete. Checkpoints in {args.save_dir}")


if __name__ == "__main__":
    main()
