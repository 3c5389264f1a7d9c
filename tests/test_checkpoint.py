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


def test_stranded_sidecar_adopted_after_final_swap_crash(tmp_path):
    """Crash flavor 3 (review r4): the state rename landed but the
    sidecar replace didn't — `latest` holds the NEW state with NO
    sidecar, the new sidecar is stranded at `.saving.config.json`. The
    next writer-side save must adopt it (not delete the only copy), and
    load_sidecar must work after recovery."""
    import os

    d = str(tmp_path)
    state = {"w": np.arange(4, dtype=np.float32)}
    ckpt.save_checkpoint(d, "latest", state, config={"A": 1})
    path = os.path.join(d, "latest")

    # simulate: swap moved the state but crashed before the sidecar move
    os.rename(path + ".config.json", path + ".replaced.config.json")
    with open(path + ".saving.config.json", "w") as f:
        f.write('{"config": {"A": 9}, "metrics": {}, "extra": {}}')

    # the next save's recovery must adopt the stranded NEW sidecar
    ckpt.save_checkpoint(d, "latest", {"w": state["w"] + 1},
                         config={"A": 10})
    got, sidecar = ckpt.restore_checkpoint(d, "latest", target=state)
    np.testing.assert_array_equal(got["w"], state["w"] + 1)
    assert sidecar["config"] == {"A": 10}
    for leftover in (".saving", ".replaced", ".saving.config.json",
                     ".replaced.config.json"):
        assert not os.path.exists(path + leftover)


def test_recover_adopts_stranded_sidecar_directly(tmp_path):
    """The _recover unit itself: path exists without a sidecar + a
    stranded `.saving.config.json` (no `.saving` dir) -> adopted."""
    import os

    d = str(tmp_path)
    state = {"w": np.zeros(2, np.float32)}
    ckpt.save_checkpoint(d, "probe", state, config={"K": 1})
    path = os.path.join(d, "probe")
    os.rename(path + ".config.json", path + ".saving.config.json")
    assert not os.path.exists(path + ".config.json")
    ckpt._recover(path)
    assert os.path.exists(path + ".config.json")
    assert ckpt.load_sidecar(d, "probe")["config"] == {"K": 1}

    # but with a complete `.saving` DIRECTORY also present, the tmp
    # sidecar belongs to tmp — _recover must NOT mispair it with path
    os.rename(path + ".config.json", path + ".saving.config.json")
    os.makedirs(path + ".saving")
    ckpt._recover(path)
    assert not os.path.exists(path + ".config.json")


def test_raise_failed_saves_surfaces_every_failure(capsys):
    """Two completed failed futures: the first raises, the second is
    printed (not silently dropped); a single pass means no future can
    slip through the done/pending partition unchecked."""
    from concurrent.futures import Future

    f1, f2, live = Future(), Future(), Future()
    f1.set_exception(OSError("disk full"))
    f2.set_exception(OSError("also failed"))
    ckpt._PENDING.extend([f1, f2, live])
    try:
        with pytest.raises(OSError, match="disk full"):
            ckpt._raise_failed_saves()
        assert "also failed" in capsys.readouterr().err
        assert ckpt._PENDING == [live]
    finally:
        ckpt._PENDING.clear()


def test_restore_retries_when_writer_swaps_mid_read(tmp_path, monkeypatch):
    """Reader-vs-writer race (review r4): a save committing while a
    reader restores re-binds `latest` to a new inode; the reader must
    detect the torn read and retry against the committed checkpoint."""
    import os

    d = str(tmp_path)
    state = {"w": np.arange(3, dtype=np.float32)}
    ckpt.save_checkpoint(d, "latest", state, config={"E": 1})

    real_restore = ckpt._checkpointer().restore
    swapped = {"done": False}

    def racing_restore(path, *a, **k):
        out = real_restore(path, *a, **k)
        if not swapped["done"]:
            swapped["done"] = True
            # the writer commits a NEW save mid-read -> new inode at path
            ckpt.save_checkpoint(d, "latest", {"w": state["w"] + 5},
                                 config={"E": 2})
        return out

    monkeypatch.setattr(ckpt._checkpointer(), "restore", racing_restore)
    got, sidecar = ckpt.restore_checkpoint(d, "latest", target=state)
    # the retry read the COMMITTED new checkpoint coherently
    np.testing.assert_array_equal(got["w"], state["w"] + 5)
    assert sidecar["config"] == {"E": 2}
