"""Driver contract tests: __graft_entry__.entry traces on the flagship
model shapes, and dryrun_multichip runs a real dp+tp train step on the
8-device CPU mesh.

The real 2-process gang leg of dryrun (several minutes of fresh-interpreter
compiles) is skipped throughout this file via GRAFT_DRYRUN_2PROC=0 — it has
its own dedicated suite, tests/test_multiprocess.py; these tests cover the
provisioning/respawn mechanics around it."""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(autouse=True)
def _skip_two_proc_leg(monkeypatch):
    monkeypatch.setenv("GRAFT_DRYRUN_2PROC", "0")


def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "OK" in out and "mesh=(4x2)" in out
    assert "2-proc(skipped)" in out


def test_dryrun_multichip_odd():
    import __graft_entry__ as ge

    ge.dryrun_multichip(5)  # odd device count -> pure DP mesh


def test_dryrun_multichip_under_driver_env():
    """Reproduce the driver's actual invocation: a fresh interpreter with
    the shell's pinned JAX_PLATFORMS (axon on the real box, anything here)
    and only `python -c "from __graft_entry__ import dryrun_multichip; ..."`.
    Round 1 failed exactly this context (MULTICHIP_r01: rc=1, 1 device) —
    dryrun_multichip must self-provision the virtual 8-CPU mesh."""
    import os
    import subprocess

    env = dict(os.environ)
    # the real driver env pins a 1-device platform; axon may be slow to
    # register here, so emulate "pinned non-cpu platform" semantics by NOT
    # pre-clearing anything jax-related except the conftest cpu override
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = env.get("GRAFT_TEST_PLATFORM", "axon")
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep registration fast in CI
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [
            "python", "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "OK" in res.stdout and "mesh=(4x2)" in res.stdout
    assert "input-contract" in res.stdout


def test_dryrun_multichip_respawns_when_backend_too_small():
    """If a too-small backend is already initialized (config can no longer
    be flipped), dryrun must fall back to a scrubbed child process."""
    import os
    import subprocess

    env = dict(os.environ)
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    code = (
        "import jax; "
        "jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_num_cpu_devices',1); "
        "assert len(jax.devices()) == 1; "
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    res = subprocess.run(
        ["python", "-c", code],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=560,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "mesh=(4x2)" in res.stdout


def test_entry_traces():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    # trace + lower (no compile/execute: XLS-R is too big to run on CPU CI)
    lowered = jax.jit(fn).lower(*args)
    text = lowered.as_text()
    assert "while" in text or "transpose" in text  # encoder scan present
