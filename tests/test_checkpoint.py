"""Checkpoint crash-safety: a failure mid-save must never destroy the
previous checkpoint (ADVICE.md r1: the old code rmtree'd 'latest' before
Orbax wrote the replacement)."""

import numpy as np
import pytest

from wav2vec_contr_loss_tpu.train import checkpoint as ckpt


def _state(v: float):
    return {"w": np.full((3,), v, np.float32),
            "step": np.asarray(int(v), np.int32)}


def test_save_restore_roundtrip(tmp_path):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, "latest", _state(1.0), config={"A": 1},
                         metrics={"loss": 0.5}, extra={"k": "v"})
    state, sidecar = ckpt.restore_checkpoint(d, "latest", _state(0.0))
    np.testing.assert_array_equal(state["w"], np.full((3,), 1.0, np.float32))
    assert sidecar["config"] == {"A": 1}
    assert ckpt.checkpoint_exists(d, "latest")


def test_crash_mid_save_preserves_previous(tmp_path, monkeypatch):
    d = str(tmp_path)
    ckpt.save_checkpoint(d, "latest", _state(1.0), config={"epoch": 1})

    c = ckpt._checkpointer()
    real_save = c.save

    def exploding_save(path, *a, **kw):
        real_save(path, *a, **kw)
        c.wait_until_finished()  # tmp fully on disk, then "crash"
        raise RuntimeError("simulated crash during checkpoint write")

    monkeypatch.setattr(type(c), "save",
                        lambda self, path, *a, **kw: exploding_save(path, *a, **kw))
    with pytest.raises(RuntimeError, match="simulated crash"):
        ckpt.save_checkpoint(d, "latest", _state(2.0), config={"epoch": 2})
    monkeypatch.undo()

    # the previous checkpoint (v=1) must survive, data AND sidecar
    state, sidecar = ckpt.restore_checkpoint(d, "latest", _state(0.0))
    np.testing.assert_array_equal(state["w"], np.full((3,), 1.0, np.float32))
    assert sidecar["config"] == {"epoch": 1}

    # and a later successful save self-heals (stale .saving dir cleaned up)
    ckpt.save_checkpoint(d, "latest", _state(3.0), config={"epoch": 3})
    state, sidecar = ckpt.restore_checkpoint(d, "latest", _state(0.0))
    np.testing.assert_array_equal(state["w"], np.full((3,), 3.0, np.float32))
    assert sidecar["config"] == {"epoch": 3}


def test_crash_window_recovery(tmp_path):
    """A crash between the two renames in save_checkpoint leaves a complete
    copy under 'latest.saving' or 'latest.replaced' but no 'latest'.
    Readers resolve it IN PLACE without renaming (ADVICE r2: a reader
    racing the writer's swap must never mutate the dir); the next
    writer-side save adopts and cleans up."""
    import os

    from wav2vec_contr_loss_tpu.train import checkpoint as ck

    d = str(tmp_path)
    state = {"w": np.arange(4, dtype=np.float32)}
    ck.save_checkpoint(d, "latest", state, config={"A": 1})
    path = os.path.join(d, "latest")

    # crash flavor 1: new state written, old displaced, final rename lost
    os.rename(path, path + ".saving")
    os.rename(path + ".config.json", path + ".saving.config.json")
    assert ck.checkpoint_exists(d, "latest")      # resolved from .saving
    got, sidecar = ck.restore_checkpoint(d, "latest", target=state)
    np.testing.assert_array_equal(got["w"], state["w"])
    # the staged sidecar travels with the state (ADVICE r2 #3): no stale
    # config pairing
    assert sidecar["config"] == {"A": 1}
    # readers never renamed anything
    assert os.path.isdir(path + ".saving") and not os.path.exists(path)

    # crash flavor 2: only the displaced previous copy survives
    os.rename(path + ".saving", path + ".replaced")
    os.rename(path + ".saving.config.json", path + ".replaced.config.json")
    assert ck.checkpoint_exists(d, "latest")      # resolved from .replaced
    got, _ = ck.restore_checkpoint(d, "latest", target=state)
    np.testing.assert_array_equal(got["w"], state["w"])

    # writer-side: the next save adopts the stranded copy and cleans up
    os.rename(path + ".replaced", path + ".saving")
    os.rename(path + ".replaced.config.json", path + ".saving.config.json")
    ck.save_checkpoint(d, "latest", {"w": state["w"] + 1}, config={"A": 2})
    got, sidecar = ck.restore_checkpoint(d, "latest", target=state)
    np.testing.assert_array_equal(got["w"], state["w"] + 1)
    assert sidecar["config"] == {"A": 2}
    assert not os.path.exists(path + ".saving")
    assert not os.path.exists(path + ".replaced")
    assert not os.path.exists(path + ".saving.config.json")
    assert not os.path.exists(path + ".replaced.config.json")
