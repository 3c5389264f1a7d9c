"""Environment self-check: `python -m wav2vec_contr_loss_tpu doctor`.

One command that answers "will training/serving work on this host?"
before a multi-hour job is launched: JAX backend + device visibility,
the native decoder build and a decode round trip, a jitted forward on a
tiny encoder, checkpoint write/restore, the persistent compile cache,
and (optionally) the reference checkout that enables the oracle tests.
Prints one `[ ok ]` / `[FAIL]` line per check and exits nonzero if any
check fails — wire it as a scheduler prologue or container healthcheck.

The reference has no equivalent; failures there surface minutes-to-hours
into an sbatch run (SURVEY.md §5 — SLURM mail-on-fail is the detector).
"""

from __future__ import annotations

import argparse
import os
import tempfile
import traceback
from typing import Callable, List, Tuple

_CHECKS: List[Tuple[str, Callable[[], str]]] = []


def check(name: str):
    def reg(fn):
        _CHECKS.append((name, fn))
        return fn
    return reg


@check("jax backend")
def _jax() -> str:
    import jax

    devs = jax.devices()
    return (f"jax {jax.__version__}, platform={devs[0].platform}, "
            f"{len(devs)} device(s), {jax.process_count()} process(es)")


@check("versions (flax/optax/orbax)")
def _versions() -> str:
    import flax
    import optax
    import orbax.checkpoint as ocp

    return (f"flax {flax.__version__}, optax {optax.__version__}, "
            f"orbax {ocp.__version__}")


@check("native decoder")
def _native() -> str:
    import numpy as np

    from ..data import AudioConfig
    from ..data.audio import AudioLoader, write_wav

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "probe.wav")
        x = (0.25 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
             ).astype(np.float32)
        write_wav(path, x, 16000)
        w = AudioLoader(AudioConfig(16000, 1)).load(path)
        if w.shape != (16000,) or not w.any():
            raise RuntimeError(f"decode round trip failed: {w.shape}")
    from ..data import audio as audio_mod

    backend = ("native C++" if audio_mod._native_decoder() is not None
               else "python fallback")
    return f"decode round trip ok ({backend})"


@check("jitted forward (tiny encoder)")
def _forward() -> str:
    import jax
    import jax.numpy as jnp

    from ..models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    cfg = Wav2Vec2Config(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        dtype=jnp.float32, apply_spec_augment=False,
    )
    enc = Wav2Vec2Encoder(cfg)
    wave = jnp.zeros((2, 4000), jnp.float32).at[:, :100].set(0.1)
    params = enc.init(jax.random.PRNGKey(0), wave, deterministic=True)
    out = jax.jit(lambda p, w: enc.apply(p, w, deterministic=True))(
        params, wave)["layer_mean"]
    got = float(jnp.sum(out))  # host fetch: the only reliable sync
    if not (out.ndim == 3 and out.shape[0] == 2):
        raise RuntimeError(f"unexpected output shape {out.shape}")
    return f"compile+run ok, layer_mean{tuple(out.shape)} sum={got:.3f}"


@check("checkpoint write/restore")
def _ckpt() -> str:
    import jax.numpy as jnp
    import numpy as np

    from ..train import checkpoint as ckpt

    with tempfile.TemporaryDirectory() as d:
        state = {"w": jnp.arange(8, dtype=jnp.float32)}
        ckpt.save_checkpoint(d, "probe", state, config={"OK": 1},
                             metrics={"epoch": 1})
        back, sidecar = ckpt.restore_checkpoint(d, "probe")
        if not np.array_equal(np.asarray(back["w"]),
                              np.arange(8, dtype=np.float32)):
            raise RuntimeError("restore mismatch")
        if sidecar["config"] != {"OK": 1}:
            raise RuntimeError("sidecar mismatch")
    return "orbax save/restore round trip ok"


@check("compile cache")
def _cache() -> str:
    import jax

    d = jax.config.jax_compilation_cache_dir
    if not d:
        return "disabled (jax_compilation_cache_dir unset)"
    n = sum(1 for _ in os.scandir(d)) if os.path.isdir(d) else 0
    return f"{d} ({n} entries)"


@check("real-weights leg (optional)")
def _real_weights() -> str:
    """Pre-stages the north-star EER-parity run (BASELINE.md): reports
    whether the facebook/wav2vec2-xls-r-300m weights and the ASVspoof
    corpora are reachable RIGHT NOW, so the day the environment grants
    network or a file drop, parity is one command chain with no
    decisions left:

      python -m wav2vec_contr_loss_tpu convert_hf_checkpoint \
          --src $W2V_HF_SNAPSHOT --out ckpt/xlsr300m        # offline drop
      python -m wav2vec_contr_loss_tpu run_pipeline \
          --exp_name supcon_temp_0.07 --encoder_init ckpt/xlsr300m ...
      python -m wav2vec_contr_loss_tpu verify_parity \
          --exp_name supcon_temp_0.07 ...   # accepts |ΔEER| <= 0.2% abs

    Reachability sources probed: (a) a dropped HF snapshot directory in
    $W2V_HF_SNAPSHOT — set-but-invalid FAILS the check (a user error
    worth surfacing), (b) the HF hub cache ($HF_HOME or
    ~/.cache/huggingface), (c) corpora roots in $W2V_ASV19_LA_ROOT /
    $W2V_ITW_ROOT. All-absent is reported, not failed — expected in the
    air-gapped image (PARITY.md §real-weights)."""
    bits = []

    snap = os.environ.get("W2V_HF_SNAPSHOT", "")
    if snap:
        has_cfg = os.path.isfile(os.path.join(snap, "config.json"))
        has_weights = any(
            f.endswith((".safetensors", ".bin", ".pt"))
            or f.endswith(".index.json")
            for f in (os.listdir(snap) if os.path.isdir(snap) else ())
        )
        if not (has_cfg and has_weights):
            raise RuntimeError(
                f"W2V_HF_SNAPSHOT={snap} is set but not an ingestible HF "
                "snapshot (need config.json + model.safetensors/"
                "pytorch_model.bin)")
        bits.append(f"snapshot drop {snap}: ingestible")
    else:
        bits.append("no snapshot drop ($W2V_HF_SNAPSHOT unset)")

    hub = os.environ.get("HF_HOME",
                         os.path.expanduser("~/.cache/huggingface"))
    cached = os.path.join(hub, "hub", "models--facebook--wav2vec2-xls-r-300m")
    bits.append("hub cache: " + ("present" if os.path.isdir(cached)
                                 else "absent"))

    for env in ("W2V_ASV19_LA_ROOT", "W2V_ITW_ROOT"):
        root = os.environ.get(env, "")
        bits.append(f"{env}: " + (
            "unset" if not root
            else "present" if os.path.isdir(root)
            else "SET BUT MISSING"))
        if root and not os.path.isdir(root):
            raise RuntimeError(f"{env}={root} does not exist")

    return "; ".join(bits)


@check("reference oracle (optional)")
def _reference() -> str:
    ref = "/root/reference"
    if not os.path.isdir(ref):
        return "absent — oracle parity tests will skip (expected off-box)"
    n = sum(1 for f in os.listdir(ref) if f.endswith(".py"))
    return f"{ref} present ({n} py files) — oracle parity tests active"


def main(argv=None) -> None:
    argparse.ArgumentParser(description=__doc__).parse_args(argv)
    failed = 0
    for name, fn in _CHECKS:
        try:
            detail = fn()
            print(f"[ ok ] {name}: {detail}")
        except Exception as e:  # noqa: BLE001 — each check isolates failure
            failed += 1
            print(f"[FAIL] {name}: {type(e).__name__}: {e}")
            if os.environ.get("DOCTOR_TRACE"):
                traceback.print_exc()
    print(f"==> doctor: {len(_CHECKS) - failed}/{len(_CHECKS)} checks passed")
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
