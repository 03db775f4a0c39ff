"""CLI smoke tests (the reference's entry surface, train.py/tools.py) on the
tiny models — every action must run end to end on CPU."""
import json

import numpy as np
import pytest

from channel_pruning_tpu import cli


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_cli_verify_release(tmp_path):
    """The released-model acceptance protocol as a command (reference
    README.md:100): resize/crop/mean eval over a val folder, delta + verdict
    vs an expected table."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    val = tmp_path / "val"
    for ci in range(2):
        d = val / f"c{ci}"
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    wd = str(tmp_path)
    cli.main(["finetune", "--model", "tiny_vgg", "--batch", "4", "--steps",
              "1", "--work-dir", wd])
    args = ["verify-release", "--prototxt", f"{wd}/ft_tiny_vgg.prototxt",
            "--weights", f"{wd}/ft_tiny_vgg.caffemodel", "--batch", "4",
            "--data-dir", str(val), "--iterations", "2"]
    res = cli.main(args + ["--expect-top1", "0.0", "--expect-top5", "0.0"])
    assert res["verdict"] == "PASS"
    assert res["measured"]["n_images"] == 8
    assert res["protocol"]["iterations"] == 2
    res = cli.main(args + ["--expect-top1", "0.99"])
    assert res["verdict"] == "FAIL"
    assert "accuracy@1" in res["delta"]

    mean_file = "/root/reference/temp/bgr.binaryproto"
    import os
    if os.path.exists(mean_file):
        res = cli.main(args + ["--mean", mean_file, "--expect-top1", "0.0"])
        assert res["verdict"] == "PASS"


def test_cli_verify_release_known_tables():
    from channel_pruning_tpu.cli import RELEASED_ACCURACY

    # the published accuracy table, reference README.md:20-26
    assert RELEASED_ACCURACY["channel_pruning_5x"]["accuracy@5"] == 0.881
    assert RELEASED_ACCURACY["vgg16_3c_4x"]["accuracy@1"] == 0.706
    assert RELEASED_ACCURACY["resnet50_2x"]["accuracy@5"] == 0.908


def test_freeze_crash_disarms_fused_program(tmp_path, monkeypatch):
    """A worker crash ANYWHERE in the freeze stage (upload, compile, or the
    fused program itself) must set CP_TPU_NO_FUSE before recovery retries —
    otherwise the re-exec loop retries the same worker-killing fused
    program until the re-exec budget is gone (observed 3/3 on the Xception
    freeze, 2026-08-19)."""
    import channel_pruning_tpu.cli as cli_mod
    from channel_pruning_tpu.sampling import sampler
    from channel_pruning_tpu.utils import runtime
    from jax.errors import JaxRuntimeError

    monkeypatch.delenv("CP_TPU_NO_FUSE", raising=False)
    # crash shape: the axon tunnel's dead-worker signature, raised from the
    # upload path (OUTSIDE sample_features' fused-call handler)
    def crashing(*a, **k):
        raise JaxRuntimeError(
            "UNAVAILABLE: TPU worker process crashed or restarted.")
    monkeypatch.setattr(cli_mod, "to_device_params", crashing, raising=False)
    import channel_pruning_tpu.ops.forward as fwd_mod
    monkeypatch.setattr(fwd_mod, "to_device_params", crashing)
    # make the in-process retry give up instantly (client unrecoverable)
    monkeypatch.setattr(runtime, "wait_for_device", lambda *a, **k: False)

    with pytest.raises(JaxRuntimeError):
        cli_mod.main(["prune", "--model", "tiny_vgg", "--mode", "prune",
                      "--batch", "4", "--cal-batches", "4", "--cal-batch",
                      "4", "--speed", "2.0", "--platform", "cpu",
                      "--work-dir", str(tmp_path)])
    import os
    assert os.environ.get("CP_TPU_NO_FUSE") == "1", \
        "freeze-stage crash did not disarm the fused program"
    os.environ.pop("CP_TPU_NO_FUSE", None)
