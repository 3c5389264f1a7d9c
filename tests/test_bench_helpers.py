"""bench.py helper contract: the driver parses exactly one JSON line, so
the emit format, failure-record metric naming, and the fixed-recipe flag
guard are load-bearing (BENCH_r0N.json is judged from them). These tests
exercise the host-side helpers without touching a device."""

import importlib.util
import json
import sys

import pytest

BENCH = "/root/repo/bench.py"


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_emit_prints_one_json_line(bench, capsys):
    bench._emit("some_metric", 123.4567, "clips/sec/chip", 30.0)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec == {"metric": "some_metric", "value": 123.46,
                   "unit": "clips/sec/chip", "vs_baseline": 4.115}


def test_failure_metric_name_tracks_mode(bench, monkeypatch):
    """Failure records carry the MODE'S unit too — a failed stage2 run
    must not report batches/sec work under a clips/sec/chip label
    (advisor r4)."""
    cps = "clips/sec/chip"
    cases = {
        (): ("stage1_supcon_finetune_train_throughput", cps),
        ("--mode", "frozen"): ("stage1_supcon_frozen_train_throughput", cps),
        ("--mode", "baseline"): ("baseline_bce_train_throughput", cps),
        ("--mode", "extract"): ("stage1_embedding_extract_throughput", cps),
        ("--mode", "stage2"): ("stage2_scoring_throughput", "batches/sec"),
        # malformed argv falls back to the headline
        ("--mode",): ("stage1_supcon_finetune_train_throughput", cps),
    }
    for argv, want in cases.items():
        monkeypatch.setattr(sys, "argv", ["bench.py", *argv])
        assert bench._failure_metric_name() == want, argv


def test_no_mode_runs_all_modes_headline_last(bench, monkeypatch, capsys):
    """Plain `python bench.py` must emit one JSON line PER mode with the
    finetune headline LAST (the driver's single-line parser lands on it),
    each mode in its own subprocess (VERDICT r4 weak #1)."""
    import subprocess
    import types

    launched = []

    def fake_run(cmd, **kw):
        mode = cmd[cmd.index("--mode") + 1]
        launched.append(mode)
        assert cmd[cmd.index("--steps") + 1] == "7"  # forwards to children
        line = json.dumps({"metric": f"m_{mode}", "value": 1.0,
                           "unit": "u", "vs_baseline": 1.0})
        return types.SimpleNamespace(stdout=line + "\n", returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench.main(["--steps", "7"])
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert launched == bench.ALL_MODES
    assert launched[-1] == "finetune"
    assert [r["metric"] for r in out] == [f"m_{m}" for m in bench.ALL_MODES]


def test_no_mode_failed_child_records_and_exits_nonzero(bench, monkeypatch,
                                                        capsys):
    import subprocess
    import types

    def fake_run(cmd, **kw):
        mode = cmd[cmd.index("--mode") + 1]
        if mode == "stage2":  # dies without printing its own record
            return types.SimpleNamespace(stdout="", returncode=-9)
        line = json.dumps({"metric": f"m_{mode}", "value": 1.0,
                           "unit": "u", "vs_baseline": 1.0})
        return types.SimpleNamespace(stdout=line + "\n", returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(SystemExit) as e:
        bench.main([])
    assert e.value.code == 1
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert len(out) == len(bench.ALL_MODES)  # synthesized failure record
    stage2_rec = [r for r in out if r["metric"] == "stage2_scoring_throughput"]
    assert stage2_rec and stage2_rec[0]["unit"] == "batches/sec"
    assert "error" in stage2_rec[0]
    assert out[-1]["metric"] == "m_finetune"  # headline still last


def test_no_mode_rejects_recipe_knobs(bench, capsys):
    with pytest.raises(SystemExit) as e:
        bench.main(["--attention", "pallas"])
    assert e.value.code == 2
    assert "needs an explicit --mode" in capsys.readouterr().err


def test_timed_steps_retries_flaky_first_compile(bench, monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = {"first": 0, "step": 0, "sync": 0}

    def first():
        calls["first"] += 1
        if calls["first"] < 3:
            raise RuntimeError("HTTP 500: remote compile flake")

    dt = bench._timed_steps(
        first, lambda: calls.__setitem__("step", calls["step"] + 1),
        lambda: calls.__setitem__("sync", calls["sync"] + 1), 5)
    assert calls == {"first": 3, "step": 5, "sync": 1}
    assert dt >= 0.0


def test_timed_steps_raises_after_three_failures(bench, monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    def always_fails():
        raise RuntimeError("persistent outage")

    with pytest.raises(RuntimeError, match="persistent outage"):
        bench._timed_steps(always_fails, lambda: None, lambda: None, 1)


def test_fixed_recipe_modes_reject_unsupported_knobs(bench, capsys,
                                                     monkeypatch):
    # keep the test hermetic: don't write CPU entries into the repo's
    # TPU compile cache
    from wav2vec_contr_loss_tpu.utils import compile_cache

    monkeypatch.setattr(compile_cache, "enable_compile_cache",
                        lambda *a, **k: None)
    # the guard fires during arg validation, before any device use
    for argv in (["--mode", "stage2", "--batch_size", "64"],
                 ["--mode", "baseline", "--dropout0"],
                 ["--mode", "extract", "--attention", "pallas"],
                 ["--mode", "extract", "--remat", "off"]):
        with pytest.raises(SystemExit) as e:
            bench.main(argv)
        assert e.value.code == 2, argv
        assert "not supported by --mode" in capsys.readouterr().err
