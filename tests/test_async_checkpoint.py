"""Async checkpoint writes (`save_checkpoint(..., block=False)`).

The reference blocks training on `torch.save` every epoch
(train_stage1.py:114-129); the async path hides the multi-GB Orbax write
behind the next epoch on a single ordered writer thread. These tests pin
the contract: call-order commits, read-after-write exactness, snapshot
isolation from donated buffers, and failure surfacing.
"""

import numpy as np
import pytest

import wav2vec_contr_loss_tpu.train.checkpoint as ckpt


@pytest.fixture(autouse=True)
def _drain():
    yield
    try:
        ckpt.wait_for_saves()
    except Exception:
        pass


def _state(val: float):
    return {"w": np.full((64, 64), val, np.float32),
            "step": np.int64(int(val))}


def test_async_save_then_restore(tmp_path):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, "latest", _state(3.0), {"A": 1}, block=False)
    ckpt.wait_for_saves()
    state, sidecar = ckpt.restore_checkpoint(d, "latest")
    np.testing.assert_array_equal(state["w"], _state(3.0)["w"])
    assert sidecar["config"] == {"A": 1}


def test_read_after_write_without_explicit_wait(tmp_path):
    """Readers drain the writer queue: exists/restore immediately after an
    async save see the committed checkpoint."""
    d = str(tmp_path)
    ckpt.save_checkpoint(d, "latest", _state(1.0), block=False)
    assert ckpt.checkpoint_exists(d, "latest")
    state, _ = ckpt.restore_checkpoint(d, "latest")
    assert float(state["w"][0, 0]) == 1.0


def test_saves_commit_in_call_order(tmp_path):
    d = str(tmp_path)
    for v in (1.0, 2.0, 3.0):
        ckpt.save_checkpoint(d, "latest", _state(v), block=False)
    state, _ = ckpt.restore_checkpoint(d, "latest")
    assert float(state["w"][0, 0]) == 3.0


def test_alias_ordered_behind_async_save(tmp_path):
    """'best' aliased while the 'latest' write is still in flight must
    resolve to the committed latest state."""
    d = str(tmp_path)
    ckpt.save_checkpoint(d, "latest", _state(7.0), {"E": 7}, block=False)
    ckpt.alias_checkpoint(d, "best", "latest")
    state, sidecar = ckpt.restore_checkpoint(d, "best")
    assert float(state["w"][0, 0]) == 7.0
    assert sidecar["config"] == {"E": 7}


def test_snapshot_isolated_from_caller_mutation(tmp_path):
    """The async path deep-copies the host snapshot: mutating (or the
    device reusing, under buffer donation) the caller's arrays after the
    call must not corrupt the write."""
    d = str(tmp_path)
    live = _state(5.0)
    ckpt.save_checkpoint(d, "latest", live, block=False)
    live["w"][:] = -999.0  # simulate donation reuse
    ckpt.wait_for_saves()
    state, _ = ckpt.restore_checkpoint(d, "latest")
    assert float(state["w"][0, 0]) == 5.0


def test_background_failure_surfaces(tmp_path, monkeypatch):
    d = str(tmp_path)

    def boom(*a, **k):
        raise RuntimeError("disk on fire")

    monkeypatch.setattr(ckpt, "_commit_save", boom)
    ckpt.save_checkpoint(d, "latest", _state(1.0), block=False)
    with pytest.raises(RuntimeError, match="disk on fire"):
        ckpt.wait_for_saves()


def test_multiprocess_degrades_to_blocking(tmp_path, monkeypatch):
    """block=False under process_count>1 must run inline on the calling
    thread (the Orbax save and the barriers are collectives): nothing is
    enqueued. The real multi-process save runs in the
    tests/test_multiprocess.py gang; here we pin only the dispatch."""
    import threading

    import jax

    d = str(tmp_path)
    seen = {}

    def fake_commit(path, directory, name, host_state, config, metrics,
                    extra):
        seen["thread"] = threading.current_thread()

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(ckpt, "_commit_save", fake_commit)
    ckpt.save_checkpoint(d, "latest", _state(2.0), block=False)
    assert not ckpt._PENDING
    assert seen["thread"] is threading.main_thread()


def test_blocking_save_orders_after_async(tmp_path):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, "latest", _state(1.0), block=False)
    ckpt.save_checkpoint(d, "latest", _state(4.0))  # blocking
    state, _ = ckpt.restore_checkpoint(d, "latest")
    assert float(state["w"][0, 0]) == 4.0
