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
