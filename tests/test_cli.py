"""CLI parsing + sweep spec tests (no training)."""

import json

from vargp_tpu.experiments import cli, sweep


def test_parse_args():
    args, kwargs = cli._parse_args(
        ["--epochs=5", "--lr=1e-3", "--dkl=True", "--name=abc", "--flag", "7"]
    )
    assert kwargs == dict(epochs=5, lr=1e-3, dkl=True, name="abc", flag=True)
    assert args == [7]


def test_commands_exist():
    cmds = cli._commands()
    for name in (
        "toy", "s_mnist", "p_mnist", "toy_global", "s_mnist_global",
        "p_mnist_global", "toy_retrain", "analyze_smnist", "gen_sweep",
        "run_sweep",
    ):
        assert name in cmds, name


def test_help_runs():
    assert cli.main(["--help"]) == 0
    assert cli.main(["nonsense"]) == 1


def test_gen_sweep(tmp_path):
    out = sweep.generate_vargp_sweep("toy", out=str(tmp_path / "s.json"))
    with open(out) as f:
        spec = json.load(f)
    assert spec["method"] == "random"
    assert "lr" in spec["parameters"]
