"""End-to-end BCE baseline trainer.

Equivalent of the reference's baseline (reference: baseline_train.py):
encoder -> compression -> time-mean -> Linear(1) logits, BCE(pos_weight),
balanced train batches but a natural-distribution dev loader
(baseline_train.py:331-340), in-loop dev EER via the exact duplicate-score
threshold sweep (baseline_train.py:114-148), early stop on dev EER with
patience 10, grad-clip 5.0 over ALL params (baseline_train.py:203).

The reference's AMP (autocast + GradScaler, baseline_train.py:198-206,
369-371) maps to bf16 compute — bf16 shares fp32's exponent range, so no
loss scaling is needed on TPU.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import BaselineConfig
from ..data.pipeline import Batch, BatchPipeline, prefetch_to_device
from ..data.rawboost import RawBoostParams
from ..eval.metrics import eer_threshold_sweep
from ..losses import bce_logits_loss
from ..models.compression import CompressionModule, clip_embedding
from ..models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from ..ops.rawboost import rawboost_batch_device
from ..ops.wire import dequantize_wire, quantize_wire
from ..parallel.mesh import batch_sharding, make_mesh, replicated
from . import checkpoint as ckpt

__all__ = ["BaselineState", "BaselineTrainer"]


@flax.struct.dataclass
class BaselineState:
    params: Any          # {'compression', 'classifier', ['encoder']}
    frozen: Any          # {'encoder'} when frozen
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


class BaselineTrainer:
    def __init__(
        self,
        cfg: BaselineConfig,
        enc_config: Optional[Wav2Vec2Config] = None,
        enc_params: Optional[Dict] = None,
        mesh=None,
        pos_weight: float = 1.0,
    ):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.enc_config = (enc_config or Wav2Vec2Config()).with_(
            dtype=dtype, remat=cfg.remat_encoder,
            remat_policy=getattr(cfg, "remat_policy", "full"),
            scan_unroll=getattr(cfg, "scan_unroll", 1),
            dropout_impl=getattr(cfg, "dropout_impl", "threefry"),
            softmax_dtype=getattr(cfg, "softmax_dtype", "float32"),
        )
        self.encoder = Wav2Vec2Encoder(self.enc_config)
        self.compression = CompressionModule(
            input_dim=cfg.input_dim, hidden_dim=cfg.hidden_dim,
            dropout_rate=cfg.dropout,
        )
        self.pos_weight = pos_weight if cfg.use_pos_weight else None
        self.rawboost_params = RawBoostParams(
            sample_rate=cfg.target_sample_rate, prob=cfg.rawboost_prob,
            fir_impl=getattr(cfg, "rawboost_fir_impl", "direct"),
            isd_mode=getattr(cfg, "rawboost_isd_mode", "exact"),
        )
        self._enc_params_init = enc_params
        self._build_steps()

    def init_state(self, rng: Optional[jax.Array] = None) -> BaselineState:
        return self._shard_state(self._build_state(rng))

    def _build_state(self, rng: Optional[jax.Array] = None) -> BaselineState:
        """Pure (traceable) state construction — restore() runs this under
        jax.eval_shape for a free template (see Stage1Trainer._build_state)."""
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed) if rng is None else rng
        k_enc, k_comp, k_cls, k_run = jax.random.split(rng, 4)
        t = cfg.max_duration_seconds * cfg.target_sample_rate
        if self._enc_params_init is not None:
            enc_params = self._enc_params_init
        else:
            enc_params = self.encoder.init(
                k_enc, jnp.zeros((2, t), jnp.float32)
            )["params"]
        comp_params = self.compression.init(
            k_comp, jnp.zeros((2, 1, cfg.input_dim), jnp.float32)
        )["params"]
        cls_params = self._classifier().init(
            k_cls, jnp.zeros((2, cfg.hidden_dim)))["params"]

        trainable = {"compression": comp_params, "classifier": cls_params}
        frozen = {}
        if cfg.finetune_encoder:
            trainable["encoder"] = enc_params
        else:
            frozen["encoder"] = enc_params

        # reference param groups: encoder @ enc_lr, the rest @ head_lr;
        # global-norm clip 5.0 over the whole update (baseline_train.py:203)
        labels = {k: ("encoder" if k == "encoder" else "head") for k in trainable}
        mu_dtype = (jnp.bfloat16 if getattr(cfg, "adam_mu_dtype", "float32")
                    == "bfloat16" else None)
        nu_dtype = (jnp.bfloat16 if getattr(cfg, "adam_nu_dtype", "float32")
                    == "bfloat16" else None)
        from ..ops.adam_bf16nu import adamw_storage_dtypes

        from .stage1 import resolve_grad_bf16

        grad_bf16 = resolve_grad_bf16(cfg)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.multi_transform(
                {
                    "head": adamw_storage_dtypes(
                        cfg.head_lr, weight_decay=cfg.weight_decay,
                        mu_dtype=mu_dtype, nu_dtype=nu_dtype),
                    # bf16 encoder grads need the fp32-math Adam core
                    # (stock optax runs EMA math in the grad dtype)
                    "encoder": adamw_storage_dtypes(
                        cfg.enc_lr, weight_decay=cfg.weight_decay,
                        mu_dtype=mu_dtype, nu_dtype=nu_dtype,
                        force_core=grad_bf16),
                },
                labels,
            ),
        )
        return BaselineState(
            params=trainable, frozen=frozen, opt_state=self.tx.init(trainable),
            step=jnp.zeros((), jnp.int32), rng=k_run,
        )

    def _shard_state(self, state: BaselineState) -> BaselineState:
        """Same layout policy as Stage1Trainer._shard_state: TP specs when
        the mesh has a model axis, optional ZeRO-3 via param_sharding."""
        from ..parallel.mesh import shard_opt_state, shard_params

        fsdp = getattr(self.cfg, "param_sharding", "replicated") == "fsdp"
        rep = replicated(self.mesh)
        params = shard_params(state.params, self.mesh, fsdp=fsdp)
        frozen = shard_params(state.frozen, self.mesh, fsdp=fsdp)
        if fsdp:
            opt_state = shard_opt_state(state.opt_state, params, self.tx,
                                        self.mesh)
        else:
            opt_state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), state.opt_state)
        step, rng = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), (state.step, state.rng))
        return BaselineState(params=params, frozen=frozen,
                             opt_state=opt_state, step=step, rng=rng)

    @staticmethod
    def _classifier() -> nn.Dense:
        """Single definition of the classifier head — init_state and
        _logits must build the identical module or the param trees
        mismatch at apply time."""
        return nn.Dense(1, param_dtype=jnp.float32)

    def _logits(self, params: Dict, frozen: Dict, wave: jnp.ndarray,
                train: bool, rng: jax.Array) -> jnp.ndarray:
        cfg = self.cfg
        k_enc, k_comp = jax.random.split(rng)
        attn = (wave != 0.0).astype(jnp.int32)
        enc_params = params.get("encoder", frozen.get("encoder"))
        enc_train = train and cfg.finetune_encoder
        enc_out = self.encoder.apply(
            {"params": enc_params}, wave, attn, deterministic=not enc_train,
            rngs={"dropout": k_enc} if enc_train else None,
        )
        seq = self.compression.apply(
            {"params": params["compression"]}, enc_out["layer_mean"],
            deterministic=not train,
            rngs={"dropout": k_comp} if train else None,
        )
        pooled = clip_embedding(seq, l2_normalize=False)
        return self._classifier().apply(
            {"params": params["classifier"]}, pooled
        )[..., 0]

    def _build_steps(self) -> None:
        cfg = self.cfg
        from .stage1 import cast_stacked_kernels_bf16, resolve_grad_bf16

        grad_bf16 = resolve_grad_bf16(cfg)
        if grad_bf16 and cfg.compute_dtype != "bfloat16":
            # same refusal as Stage1Trainer: under fp32 compute the bf16
            # kernel cast would CHANGE the forward
            raise ValueError(
                "grad_dtype='bfloat16' requires compute_dtype='bfloat16'")

        def train_step(state: BaselineState, batch: Dict):
            rng, k_rb, k_fwd = jax.random.split(state.rng, 3)
            wave = dequantize_wire(batch["waveforms"])  # ops/wire.py
            if cfg.use_rawboost and cfg.rawboost_mode == "device":
                wave = rawboost_batch_device(
                    wave, k_rb, cfg.rawboost_prob, self.rawboost_params
                )

            def loss_fn(params):
                logits = self._logits(params, state.frozen, wave, True, k_fwd)
                return bce_logits_loss(logits, batch["labels"], self.pos_weight)

            loss, grads = jax.value_and_grad(loss_fn)(
                cast_stacked_kernels_bf16(state.params)
                if grad_bf16 else state.params)
            if grad_bf16:
                # unlike stage-1 (head-only clip over f32 grads), the
                # baseline's clip_by_global_norm spans the encoder too — a
                # 315M-element bf16 norm reduction is too lossy, so upcast
                # into the clip. The converts fuse into the norm/update
                # loops: the dW kernels still WRITE bf16 and both readers
                # read bf16-sized buffers.
                grads = jax.tree_util.tree_map(
                    lambda g: g.astype(jnp.float32), grads)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(params=params, opt_state=opt_state,
                                 step=state.step + 1, rng=rng), {"loss": loss}

        def logits_step(state: BaselineState, wave: jnp.ndarray):
            return self._logits(state.params, state.frozen,
                                dequantize_wire(wave), False,
                                jax.random.PRNGKey(0))

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.logits_step = jax.jit(logits_step)

    def _put(self, batches: Iterator[Batch]) -> Iterator[Dict]:
        from ..parallel.mesh import global_batch_from_local

        n_proc = jax.process_count()
        rank = jax.process_index()

        wire16 = getattr(self.cfg, "wire_dtype", "float32") == "int16"

        def put(b: Batch) -> Dict:
            arrays = {"waveforms": quantize_wire(b.waveforms) if wire16
                      else b.waveforms, "labels": b.labels}
            if n_proc > 1:
                B = b.waveforms.shape[0]
                if B % n_proc:
                    raise ValueError(
                        f"global batch {B} not divisible by "
                        f"process_count={n_proc}; clips would be dropped"
                    )
                per = B // n_proc
                sl = slice(rank * per, (rank + 1) * per)
                arrays = {k: v[sl] for k, v in arrays.items()}
            return global_batch_from_local(self.mesh, arrays)

        return prefetch_to_device(batches, put, depth=2)

    def _scored_batches(self, state: BaselineState, pipe: BatchPipeline):
        """Yield (valid-row logits, valid-row labels) per sequential batch,
        triple-overlapped (H2D / compute / D2H — data.pipeline.
        stream_through_device) and multi-process safe: the global
        data-sharded logits are fetched via fetch_global (np.asarray on an
        array spanning hosts raises); labels/valid stay host-side."""
        from ..data.pipeline import stream_through_device
        from ..parallel.mesh import fetch_global, global_batch_from_local

        n_proc = jax.process_count()
        rank = jax.process_index()
        wire16 = getattr(self.cfg, "wire_dtype", "float32") == "int16"

        def put(b: Batch):
            w = quantize_wire(b.waveforms) if wire16 else b.waveforms
            if n_proc > 1:
                B = w.shape[0]
                if B % n_proc:
                    raise ValueError(
                        f"global batch {B} not divisible by "
                        f"process_count={n_proc}; clips would be dropped")
                per = B // n_proc
                w = w[rank * per:(rank + 1) * per]
            return global_batch_from_local(self.mesh, {"waveforms": w})[
                "waveforms"]

        for lg, b in stream_through_device(
                pipe.sequential(), put,
                lambda wave: self.logits_step(state, wave),
                fetch_fn=fetch_global):
            yield lg[b.valid], b.labels[b.valid]

    def evaluate_dev(self, state: BaselineState, dev_pipe: BatchPipeline
                     ) -> Tuple[float, float, float]:
        """-> (dev EER, threshold, accuracy@thresh) over the natural-
        distribution dev set (reference: baseline_train.py:220-253)."""
        logits, labels = [], []
        for lg, lab in self._scored_batches(state, dev_pipe):
            logits.append(lg)
            labels.append(lab)
        logits = np.concatenate(logits)
        labels = np.concatenate(labels)
        scores = 1.0 / (1.0 + np.exp(-logits))
        eer, thresh = eer_threshold_sweep(labels, scores)
        acc = float(((scores >= thresh).astype(int) == labels).mean())
        return eer, thresh, acc

    def fit(
        self,
        state: BaselineState,
        train_pipe: BatchPipeline,
        dev_pipe: BatchPipeline,
        save_dir: Optional[str] = None,
        log_fn=print,
        preemption=None,
        start_epoch: int = 1,
        skip_steps: int = 0,
        best_eer: float = float("inf"),
        epochs_no_improve: int = 0,
    ) -> Tuple[BaselineState, Dict]:
        """`preemption`/`skip_steps`/`best_eer`/`epochs_no_improve` mirror
        Stage1Trainer.fit: graceful mid-epoch save on SIGTERM, exact
        replay-resume past the saved batch cursor, and best/patience
        tracking carried across restarts via the 'baseline_latest'
        sidecar (the reference baseline has no resume at all,
        baseline_train.py:180-218)."""
        cfg = self.cfg
        history = {"train_loss": [], "dev_eer": [], "dev_acc": []}
        if epochs_no_improve >= cfg.patience:
            # resuming a run that already early-stopped: a no-op, not a
            # surprise extra epoch
            log_fn(f"[EARLY STOP] patience {cfg.patience} already reached "
                   f"at resume (best EER={best_eer * 100:.2f}%)")
            return state, history
        for epoch in range(start_epoch, cfg.epochs + 1):
            losses = []
            skip = skip_steps if epoch == start_epoch else 0
            n_steps = skip
            preempted = False
            for batch in self._put(train_pipe.train_epoch(epoch, skip=skip)):
                state, metrics = self.train_step(state, batch)
                losses.append(metrics["loss"])
                n_steps += 1
                if preemption is not None and preemption.requested(n_steps):
                    preempted = True
                    break
            if preempted:
                if save_dir is not None:
                    ckpt.wait_for_saves()
                    ckpt.save_checkpoint(
                        save_dir, "baseline_latest", state, cfg.ckpt_config(),
                        {"epoch": epoch, "batches_done": n_steps,
                         "preempted": True, "best_eer": best_eer,
                         "epochs_no_improve": epochs_no_improve},
                        self._sidecar_extra())
                log_fn(f"[PREEMPTED] {'saved mid-epoch state at' if save_dir else 'stopping (no save_dir) at'} "
                       f"epoch {epoch} batch {n_steps}"
                       + ("; resume with --resume" if save_dir else ""))
                history["preempted"] = True
                return state, history
            train_loss = float(np.mean(jax.device_get(losses))) if losses else 0.0
            dev_eer, thresh, dev_acc = self.evaluate_dev(state, dev_pipe)
            history["train_loss"].append(train_loss)
            history["dev_eer"].append(dev_eer)
            history["dev_acc"].append(dev_acc)
            log_fn(
                f"[epoch {epoch:03d}] train_loss={train_loss:.4f} | "
                f"dev_eer={dev_eer * 100:.2f}% | dev_acc={dev_acc * 100:.2f}% "
                f"| thresh={thresh:.4f}"
            )
            is_new_best = dev_eer < best_eer
            # one shared snapshot when both 'best' and 'latest' save the
            # same state this epoch (review r3 finding)
            host = (ckpt.snapshot_for_save(state)
                    if save_dir is not None and is_new_best else None)
            if is_new_best:
                best_eer = dev_eer
                epochs_no_improve = 0
                if save_dir is not None:
                    ckpt.save_checkpoint(
                        save_dir, "baseline_best", state, cfg.ckpt_config(),
                        {"epoch": epoch, "dev_eer": dev_eer, "dev_acc": dev_acc},
                        self._sidecar_extra(), block=False, host_state=host,
                    )
                    log_fn(f"[epoch {epoch:03d}] ✓ new best dev EER="
                           f"{best_eer * 100:.2f}%")
            else:
                epochs_no_improve += 1
            if save_dir is not None:
                # epoch-cadence resume point (best/patience carried in the
                # sidecar); 'baseline_best' semantics are untouched
                ckpt.save_checkpoint(
                    save_dir, "baseline_latest", state, cfg.ckpt_config(),
                    {"epoch": epoch, "dev_eer": dev_eer, "dev_acc": dev_acc,
                     "best_eer": best_eer,
                     "epochs_no_improve": epochs_no_improve},
                    self._sidecar_extra(), block=False, host_state=host)
            if epochs_no_improve >= cfg.patience:
                log_fn(f"[EARLY STOP] patience {cfg.patience} reached "
                       f"(best EER={best_eer * 100:.2f}%)")
                break
        if save_dir is not None:
            ckpt.wait_for_saves()
        return state, history

    def _sidecar_extra(self) -> Dict:
        import dataclasses

        from ..models.wav2vec2 import config_to_dict

        return {
            "enc_config": config_to_dict(self.enc_config),
            "baseline_config": dataclasses.asdict(self.cfg),
        }

    def restore(self, save_dir: str, name: str = "baseline_best"
                ) -> BaselineState:
        # abstract template (ADVICE r2): works for fsdp process-sharded
        # checkpoints; eval_shape keeps it free of concrete init/sharding
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.eval_shape(self._build_state))
        state, _ = ckpt.restore_checkpoint(save_dir, name, template)
        return self._shard_state(state)

    @classmethod
    def from_checkpoint(cls, save_dir: str, name: str = "baseline_best",
                        mesh=None) -> Tuple["BaselineTrainer", BaselineState]:
        from ..models.wav2vec2 import config_from_dict

        sidecar = ckpt.load_sidecar(save_dir, name)
        extra = sidecar["extra"]
        cfg = BaselineConfig(**extra["baseline_config"])
        trainer = cls(cfg, enc_config=config_from_dict(extra["enc_config"]),
                      mesh=mesh)
        return trainer, trainer.restore(save_dir, name)

    def score_dataset(self, state: BaselineState, pipe: BatchPipeline
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (logits, labels) over a dataset in order, for CM score files
        (reference: eval_baseline_score_file.py:77-169)."""
        logits, labels = [], []
        for lg, lab in self._scored_batches(state, pipe):
            logits.append(lg)
            labels.append(lab)
        return np.concatenate(logits), np.concatenate(labels)
