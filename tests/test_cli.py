"""CLI smoke tests (the reference's entry surface, train.py/tools.py) on the
tiny models — every action must run end to end on CPU."""
import json

import numpy as np
import pytest

from channel_pruning_tpu import cli


def test_cli_prune_combine_flop_roundtrip(tmp_path):
    wd = str(tmp_path)
    cli.main(["prune", "--model", "tiny_vgg", "--mode", "3c", "--batch", "4",
              "--cal-batches", "4", "--cal-batch", "4", "--speed", "2.0",
              "--work-dir", wd])
    cli.main(["combine", "--prototxt", f"{wd}/3C_tiny_vgg.prototxt",
              "--weights", f"{wd}/3C_tiny_vgg.caffemodel", "--batch", "4",
              "--work-dir", wd])
    cli.main(["flop", "--prototxt", f"{wd}/cb_tiny_vgg.prototxt",
              "--batch", "4"])
    import pathlib
    assert (pathlib.Path(wd) / "cb_tiny_vgg.caffemodel").exists()


def test_cli_prune_mode_prune_and_addbn(tmp_path):
    wd = str(tmp_path)
    cli.main(["prune", "--model", "tiny_vgg", "--mode", "prune", "--batch", "4",
              "--cal-batches", "4", "--cal-batch", "4", "--speed", "2.0",
              "--work-dir", wd])
    cli.main(["addbn", "--prototxt", f"{wd}/cp_tiny_vgg.prototxt",
              "--weights", f"{wd}/cp_tiny_vgg.caffemodel", "--batch", "4",
              "--cal-batches", "2", "--cal-batch", "4", "--work-dir", wd])
    import pathlib
    assert (pathlib.Path(wd) / "bn_tiny_vgg.prototxt").exists()


def test_cli_time_action(tmp_path, capsys):
    res = cli.main(["time", "--model", "tiny_vgg", "--batch", "4",
                    "--work-dir", str(tmp_path), "--iters", "3"])
    assert res["images_per_sec"] > 0


def test_cli_deploy_action(tmp_path):
    """`deploy` exports a StableHLO serving artifact that rehydrates and
    runs without the framework's Graph machinery."""
    import numpy as np

    from channel_pruning_tpu import deploy

    out = cli.main(["deploy", "--model", "tiny_vgg", "--batch", "2",
                    "--work-dir", str(tmp_path)])
    fn = deploy.load_serialized(out)
    y = np.asarray(fn(np.zeros((2, 3, 16, 16), np.float32)))
    assert y.shape[0] == 2 and np.isfinite(y).all()


def test_cli_set_overrides(tmp_path):
    from channel_pruning_tpu.cli import _build_config

    class A:
        set = ["dic.keep=2.5", "lasso.n_sweeps=55", "sample.seed=3"]

    cfg = _build_config(A())
    assert cfg.dic.keep == 2.5
    assert cfg.lasso.n_sweeps == 55
    assert cfg.sample.seed == 3


def test_cli_full_chain_prune_addbn_finetune_eval(tmp_path):
    """The complete reference workflow on the tiny model: prune -> addbn ->
    finetune -> eval, all through Caffe artifacts (README.md workflow)."""
    wd = str(tmp_path)
    cli.main(["prune", "--model", "tiny_vgg", "--mode", "prune", "--batch", "4",
              "--cal-batches", "4", "--cal-batch", "4", "--speed", "2.0",
              "--work-dir", wd])
    cli.main(["addbn", "--prototxt", f"{wd}/cp_tiny_vgg.prototxt",
              "--weights", f"{wd}/cp_tiny_vgg.caffemodel", "--batch", "4",
              "--cal-batches", "2", "--cal-batch", "4", "--work-dir", wd])
    cli.main(["finetune", "--prototxt", f"{wd}/bn_tiny_vgg.prototxt",
              "--weights", f"{wd}/bn_tiny_vgg.caffemodel", "--batch", "4",
              "--steps", "3", "--lr", "1e-3", "--work-dir", wd])
    # artifact names derive from the graph's internal name ("tiny_vgg")
    res = cli.main(["eval", "--prototxt", f"{wd}/ft_tiny_vgg.prototxt",
                    "--weights", f"{wd}/ft_tiny_vgg.caffemodel",
                    "--batch", "4", "--eval-batches", "2", "--work-dir", wd])
    assert res["n_images"] == 8
