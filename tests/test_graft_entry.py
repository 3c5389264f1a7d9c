"""Driver contract tests: __graft_entry__.entry traces on the flagship
model shapes, and dryrun_multichip runs a real dp+tp train step on the
8-device CPU mesh."""

import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "OK" in out and "mesh=(4x2)" in out


def test_dryrun_multichip_odd():
    import __graft_entry__ as ge

    ge.dryrun_multichip(5)  # odd device count -> pure DP mesh


def test_entry_traces():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    # trace + lower (no compile/execute: XLS-R is too big to run on CPU CI)
    lowered = jax.jit(fn).lower(*args)
    text = lowered.as_text()
    assert "while" in text or "transpose" in text  # encoder scan present
