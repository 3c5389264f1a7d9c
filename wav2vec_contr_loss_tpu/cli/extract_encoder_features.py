"""Raw encoder-feature extraction CLI: layer-mean features -> (N, F, 250)
disk memmap, RawBoost p=0.9 on the train split only
(reference: extract_encoder_embeddings.py)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..data import BatchPipeline, RawBoostParams
from ..eval.extract import extract_encoder_features
from ..models.wav2vec2 import Wav2Vec2Encoder
from .common import add_asv_paths, add_encoder_args, asv_dataset, build_encoder


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_encoder_args(p)
    add_asv_paths(p, dev=True)
    p.add_argument("--out_dir", type=str, default="features/run")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--rawboost_prob", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)

    enc_config, enc_params = build_encoder(args.model_name, args.encoder_init)
    encoder = Wav2Vec2Encoder(enc_config.with_(dtype=jnp.bfloat16))
    if enc_params is None:
        enc_params = encoder.init(
            jax.random.PRNGKey(args.seed), jnp.zeros((1, 80000), jnp.float32)
        )["params"]

    # params as jit ARGUMENTS, never closure captures: closed-over arrays
    # are embedded in the lowered module as literals, ballooning the HLO
    # shipped to the remote-compile service by the full parameter size
    # (see eval/serving.py for the measured failure).
    enc_params = jax.device_put(enc_params)

    @jax.jit
    def _layer_mean(p, waves):
        return encoder.apply({"params": p}, waves)["layer_mean"]

    def layer_mean_fn(waves):
        return _layer_mean(enc_params, waves)

    rb = RawBoostParams(prob=args.rawboost_prob)
    for name, root, protocol, boost in [
        ("train", args.train_root, args.train_protocol, rb),
        ("dev", args.dev_root, args.dev_protocol, None),  # aug on train only
    ]:
        if not protocol:
            continue
        ds = asv_dataset(root, protocol)
        pipe = BatchPipeline(ds, args.batch_size, num_workers=args.num_workers)
        extract_encoder_features(
            layer_mean_fn, pipe, args.out_dir, name, rawboost=boost,
            rawboost_prob=args.rawboost_prob, seed=args.seed,
            overwrite=args.overwrite,
        )


if __name__ == "__main__":
    main()
