"""The `python -m wav2vec_contr_loss_tpu <command>` dispatcher.

Covers the one-binary front door over the reference's script-per-task
layout (SURVEY.md §1 L6): listing, forwarding (incl. argv passthrough),
and unknown-command handling.
"""

import pytest

from wav2vec_contr_loss_tpu.__main__ import COMMANDS, main


def test_no_args_prints_all_commands(capsys):
    main([])
    out = capsys.readouterr().out
    for cmd in COMMANDS:
        assert cmd in out


def test_unknown_command_exits_2(capsys):
    with pytest.raises(SystemExit) as e:
        main(["not_a_command"])
    assert e.value.code == 2
    assert "unknown command" in capsys.readouterr().err


def test_every_command_maps_to_a_cli_module_with_main():
    import importlib

    for cmd, (mod_name, _) in COMMANDS.items():
        mod = importlib.import_module(f"wav2vec_contr_loss_tpu.cli.{mod_name}")
        assert callable(mod.main), cmd


def test_forwards_argv_to_subcommand(capsys):
    # eval_scores --help is cheap (argparse exits before any model work)
    with pytest.raises(SystemExit) as e:
        main(["eval_scores", "--help"])
    assert e.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()


def test_cli_module_list_matches_disk():
    """Every cli/*.py (except common/__init__) is reachable from the
    dispatcher — a new CLI module must be registered here."""
    import pathlib

    import wav2vec_contr_loss_tpu.cli as cli_pkg

    disk = {p.stem for p in pathlib.Path(cli_pkg.__file__).parent.glob("*.py")
            if p.stem not in ("__init__", "__main__", "common")}
    assert disk == {m for m, _ in COMMANDS.values()}


def test_dispatch_enables_persistent_compile_cache(capsys):
    """Every dispatched command (not just bench.py) must get the
    persistent compile cache — a cold train/serve compile on the axon
    remote service costs 10-45 min, a cached one seconds."""
    import jax

    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        with pytest.raises(SystemExit) as e:
            main(["eval_scores", "--help"])  # argparse exits after dispatch
        assert e.value.code == 0
        capsys.readouterr()
        assert str(jax.config.jax_compilation_cache_dir).endswith(".jax_cache")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
