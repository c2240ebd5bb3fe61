"""Unified ``python -m pix2pose_tpu`` dispatcher."""

import importlib

import pytest

from pix2pose_tpu import __main__ as cli


def test_usage_lists_every_command(capsys):
    cli.main([])
    out = capsys.readouterr().out
    for name in cli._COMMANDS:
        assert name in out


def test_unknown_command_exits():
    with pytest.raises(SystemExit):
        cli.main(["definitely-not-a-command"])


def test_every_target_module_has_argv_main():
    for name, (mod_name, _) in cli._COMMANDS.items():
        mod = importlib.import_module(mod_name)
        main = getattr(mod, "main")
        # every main must accept an argv list (dispatcher contract)
        main.__call__  # noqa: B018 — attribute presence
        import inspect

        params = inspect.signature(main).parameters
        assert len(params) >= 1, f"{name}: main() takes no argv"
