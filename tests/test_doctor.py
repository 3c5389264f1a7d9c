"""`doctor` environment self-check: all checks pass in this environment,
output is one line per check, and a failing check exits nonzero."""

import pytest

from wav2vec_contr_loss_tpu.cli import doctor


def test_doctor_all_checks_pass(capsys):
    doctor.main([])
    out = capsys.readouterr().out
    assert "[FAIL]" not in out
    # every registered check printed a line
    assert out.count("[ ok ]") == len(doctor._CHECKS)
    assert "decode round trip ok" in out
    assert "orbax save/restore round trip ok" in out


def test_doctor_failing_check_exits_nonzero(capsys, monkeypatch):
    def boom():
        raise RuntimeError("synthetic failure")

    monkeypatch.setattr(doctor, "_CHECKS",
                        [("probe", boom)] + doctor._CHECKS[:1])
    with pytest.raises(SystemExit) as e:
        doctor.main([])
    assert e.value.code == 1
    out = capsys.readouterr().out
    assert "[FAIL] probe: RuntimeError: synthetic failure" in out


def test_doctor_real_weights_prestage(capsys, monkeypatch, tmp_path):
    """The real-weights reachability check (PARITY.md §real-weights): an
    ingestible $W2V_HF_SNAPSHOT drop is reported, an invalid one FAILS."""
    # isolate from ambient pre-staged environments (the check reads these)
    for env in ("W2V_HF_SNAPSHOT", "W2V_ASV19_LA_ROOT", "W2V_ITW_ROOT",
                "HF_HOME"):
        monkeypatch.delenv(env, raising=False)
    snap = tmp_path / "snap"
    snap.mkdir()
    (snap / "config.json").write_text("{}")
    (snap / "model.safetensors").write_bytes(b"x")
    monkeypatch.setenv("W2V_HF_SNAPSHOT", str(snap))
    assert "ingestible" in doctor._real_weights()

    (snap / "config.json").unlink()
    with pytest.raises(RuntimeError, match="not an ingestible"):
        doctor._real_weights()

    monkeypatch.delenv("W2V_HF_SNAPSHOT")
    monkeypatch.setenv("W2V_ASV19_LA_ROOT", str(tmp_path / "nope"))
    with pytest.raises(RuntimeError, match="does not exist"):
        doctor._real_weights()

    monkeypatch.setenv("W2V_ASV19_LA_ROOT", str(tmp_path))
    out = doctor._real_weights()
    assert "W2V_ASV19_LA_ROOT: present" in out and "W2V_ITW_ROOT: unset" in out
