"""Real multi-process SPMD smoke run (CPU, Gloo collectives).

Round-2 review finding: every multi-host claim in this repo rested on
single-process *simulation* — `jax.process_count() > 1` branches
(`train/stage1.py::_device_batches`, `parallel/mesh.py:76-79`, the
collective checkpoint path) had never executed with two real processes.
This module is the executable claim: the SAME tiny stage-1 training job
(global balanced sampler -> per-process batch slice ->
`make_array_from_process_local_data` -> fsdp+tp sharded train steps ->
collective Orbax checkpoint), plus a pipeline-parallel segment whose
inter-stage ppermute collectives cross the process boundary (stage pairs
interleaved across processes — r5), run either single-process over 8
local devices or as N real `jax.distributed` processes each owning 8/N of
them. Losses and final parameters must match across the two launch
shapes.

Replaces for real what the reference's dead DDP scaffolding intended
(reference: stage1_utils.py:156-172 — init_process_group code that was
never activated).

Driven by tests/test_multiprocess.py (subprocess fixture) and the
optional 2-proc leg of `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Optional

import numpy as np

N_DEVICES = 8           # global devices in every launch shape
N_MODEL = 2             # tensor-parallel width -> mesh (4, 2)
BATCH = 8
N_CLIPS = 16
SR, SECONDS = 4000, 1   # 4000 samples -> 99 frames
EPOCHS = 2              # 16 clips / batch 8 -> 2 steps/epoch -> 4 steps


def _corpus():
    """Deterministic synthetic corpus, identical in every process."""
    rng = np.random.default_rng(0)
    wave = rng.normal(0, 0.2, (N_CLIPS, SR * SECONDS)).astype(np.float32)
    labels = np.array([1, 0] * (N_CLIPS // 2), np.int32)
    return wave, labels


def run_smoke(ckpt_dir: Optional[str] = None) -> Dict:
    """Run the smoke job on whatever process topology is already live.

    Caller is responsible for platform setup (CPU devices and, for the
    multi-process shape, `jax.distributed.initialize`). Returns
    {"process_count", "losses", "pp_losses", "param_sum", "param_l1"};
    all collective paths (batch assembly, fsdp train step, cross-process
    pipeline-parallel steps, checkpoint save) execute on every process.
    """
    import jax
    import jax.numpy as jnp

    from ..config import Stage1Config
    from ..data.pipeline import Batch
    from ..data.sampler import BalancedBatchSampler
    from ..models.wav2vec2 import Wav2Vec2Config
    from ..train.stage1 import Stage1Trainer
    from .mesh import make_mesh

    if jax.device_count() < N_DEVICES:
        raise RuntimeError(
            f"need {N_DEVICES} global devices, have {jax.device_count()}"
        )
    mesh = make_mesh(n_model=N_MODEL, devices=jax.devices()[:N_DEVICES])

    # 4 layers so the scan-stacked layer axis tiles the 4-wide 'data' axis
    # (fsdp/ZeRO-3 actually shards, incl. ACROSS the two processes)
    enc_cfg = Wav2Vec2Config(
        hidden_size=64, num_layers=4, num_heads=4, intermediate_size=128,
        conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        dtype=jnp.float32, apply_spec_augment=False,
    )
    cfg = Stage1Config(
        batch_size=BATCH, max_duration_seconds=SECONDS,
        target_sample_rate=SR, input_dim=64, hidden_dim=16,
        finetune_encoder=True, use_rawboost=True, rawboost_mode="device",
        rawboost_prob=1.0, compute_dtype="float32", seed=0,
        param_sharding="fsdp",
    )
    trainer = Stage1Trainer(cfg, enc_config=enc_cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))

    wave, labels = _corpus()
    sampler = BalancedBatchSampler(labels, BATCH, seed=0, mode="global")

    def batches():
        for epoch in range(1, EPOCHS + 1):
            for idx in sampler.epoch_batches(epoch):
                yield Batch(
                    waveforms=wave[idx], labels=labels[idx],
                    multi_labels=labels[idx],
                    valid=np.ones(len(idx), bool),
                )

    losses: List[float] = []
    alpha = jnp.zeros((), jnp.float32)
    # _device_batches is the under-test path: n_proc > 1 slices each
    # global balanced batch by jax.process_index() and reassembles via
    # make_array_from_process_local_data (parallel/mesh.py:62-79)
    for dev_batch in trainer._device_batches(batches()):
        state, metrics = trainer.train_step(state, dev_batch, alpha)
        losses.append(float(metrics["loss"]))

    # Pipeline-parallel leg (VERDICT r4 next #6): the SAME job under
    # param_sharding='pp' on a mesh whose 'model'-axis stage pairs are
    # INTERLEAVED across processes — in the 2-proc shape every
    # inter-stage ppermute (activations forward, grads backward,
    # parallel/pipeline.py) crosses a REAL process boundary, the one
    # collective+topology combination the fsdp leg never exercises.
    # Single-process uses the same interleaved order (placement-only), so
    # the caller's topology-invariance assertions extend to pp.
    devices = jax.devices()[:N_DEVICES]
    if jax.process_count() > 1:
        by_proc: Dict[int, list] = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        cols = [by_proc[k] for k in sorted(by_proc)]
        devices = [d for pair in zip(*cols) for d in pair]
    pp_mesh = make_mesh(n_model=N_MODEL, devices=np.array(devices))
    pp_trainer = Stage1Trainer(
        cfg.replace(param_sharding="pp", pipeline_microbatches=2),
        enc_config=enc_cfg, mesh=pp_mesh)
    pp_state = pp_trainer.init_state(jax.random.PRNGKey(0))

    # Input assembly for the interleaved mesh: with stage pairs spanning
    # processes, EVERY process holds a model-column device in EVERY
    # 'data' row, so each process's addressable portion of a data-sharded
    # batch is the FULL global batch — `_device_batches`' disjoint
    # per-process slicing contract does not apply here. Feed the whole
    # global batch from every process through the shared assembler.
    from .mesh import global_batch_from_local

    pp_losses: List[float] = []
    for b in batches():
        dev_batch = global_batch_from_local(pp_mesh, {
            "waveforms": b.waveforms,
            "labels": b.labels,
            "multi_labels": b.multi_labels,
        })
        pp_state, pp_metrics = pp_trainer.train_step(pp_state, dev_batch,
                                                     alpha)
        pp_losses.append(float(pp_metrics["loss"]))
        if len(pp_losses) >= 2:
            break

    from ..train import checkpoint as ckpt

    host_params = ckpt._host_tree(state.params)  # collective for fsdp leaves
    leaves = jax.tree_util.tree_leaves(host_params)
    param_sum = float(sum(np.sum(x, dtype=np.float64) for x in leaves))
    param_l1 = float(sum(np.sum(np.abs(x), dtype=np.float64) for x in leaves))

    if ckpt_dir is not None:
        # collective multi-process save (all procs enter; proc 0 swaps)
        ckpt.save_checkpoint(ckpt_dir, "smoke", state.params,
                             config={"SMOKE": 1},
                             metrics={"final_loss": losses[-1]})

    preempt_stop = None
    if ckpt_dir is not None and jax.process_count() > 1:
        # Preemption-agreement leg: the signal lands on ONE host only
        # (process 0 marks its guard); the periodic allgather in
        # PreemptionGuard.requested must make every process stop at the
        # SAME step so the mid-epoch save stays a lockstep collective.
        from ..utils.preemption import PreemptionGuard

        guard = PreemptionGuard(sync_every=2)
        if jax.process_index() == 0:
            guard.mark()
        n = 0
        for dev_batch in trainer._device_batches(batches()):
            state, metrics = trainer.train_step(state, dev_batch, alpha)
            n += 1
            if guard.requested(n):
                preempt_stop = n
                break
        if preempt_stop is None:
            raise RuntimeError(
                "preemption agreement never reached before the epoch "
                "ended — sync_every vs step-count geometry is broken")
        # collective mid-run save from the agreed stop point
        ckpt.save_checkpoint(ckpt_dir, "preempt", state.params,
                             config={"SMOKE": 1},
                             metrics={"batches_done": n, "preempted": True})

    return {
        "process_count": int(jax.process_count()),
        "losses": losses,
        "pp_losses": pp_losses,
        "param_sum": param_sum,
        "param_l1": param_l1,
        "preempt_stop": preempt_stop,
    }


def launch_gang(out: str, ckpt_dir: Optional[str] = None, n: int = 2,
                timeout: int = 600) -> List[Dict]:
    """Spawn the N-process smoke gang and return each worker's result dict.

    One launcher for every caller (tests/test_multiprocess.py fixture and
    __graft_entry__'s dryrun leg — review r3: the two had drifted copies):
    picks a free coordinator port, scrubs the axon env pins, runs N
    `mp_smoke` workers to completion, and raises with the worker log tail
    on any nonzero exit or timeout. Result files `<out>.p<i>` are left on
    disk for the caller (the dryrun deletes them, the test fixture's
    tmpdir handles it)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip slow remote-TPU registration
    env["JAX_PLATFORMS"] = "cpu"      # worker re-pins via jax.config anyway
    cmd_tail = ["--num_processes", str(n), "--port", str(port), "--out", out]
    if ckpt_dir is not None:
        cmd_tail += ["--ckpt_dir", ckpt_dir]
    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "wav2vec_contr_loss_tpu.parallel.mp_smoke",
             "--process_id", str(i)] + cmd_tail,
            env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(n)
    ]
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=timeout)
            logs.append(stdout)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise RuntimeError(f"{n}-proc smoke gang timed out")
    for p, log in zip(procs, logs):
        if p.returncode != 0:
            raise RuntimeError(
                f"{n}-proc smoke worker failed:\n{log[-4000:]}")
    results = []
    for i in range(n):
        with open(f"{out}.p{i}") as f:
            results.append(json.load(f))
    return results


def main(argv=None) -> None:
    """Worker entry: set up the platform/topology, run, dump JSON.

    Invoked as one process of an N-process gang:
      python -m wav2vec_contr_loss_tpu.parallel.mp_smoke \
          --num_processes 2 --process_id 0 --port 12345 --out r.json
    Each process provisions 8/N local CPU devices so the global device
    count matches the single-process shape exactly.
    """
    p = argparse.ArgumentParser()
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--ckpt_dir", type=str, default=None)
    args = p.parse_args(argv)

    import jax

    # must win before any backend init (the shell env pins axon)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", N_DEVICES // args.num_processes)
    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    result = run_smoke(ckpt_dir=args.ckpt_dir)
    if args.out:
        with open(f"{args.out}.p{args.process_id}", "w") as f:
            json.dump(result, f)
    print(f"[mp_smoke] p{args.process_id}/{args.num_processes} "
          f"losses={['%.6f' % x for x in result['losses']]} "
          f"param_l1={result['param_l1']:.6f}", flush=True)


if __name__ == "__main__":
    main()
