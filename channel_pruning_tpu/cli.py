"""Command-line driver.

Reference surface: `python3 train.py -action {c3,combine,addbn,splitrelu}`
plus `python3 tools.py {flop,param,resnet}` (lib/train.py:123-184,
tools.py:20-70). Here every action is a subcommand; any nested config knob is
settable with repeated `--set dic.keep=3.0` flags (the reference reflected
every cfgs.py leaf into argparse, train.py:128-153).

Models come either from the registry (`--model vgg16`) or from Caffe
artifacts (`--prototxt ... --weights ...`). With no `--data-dir`, calibration
and finetune data are synthetic (smoke/bench mode).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def _load_model(args):
    from channel_pruning_tpu.io import caffe as cio
    from channel_pruning_tpu.models import zoo
    from channel_pruning_tpu.models.vgg import init_params

    if args.prototxt:
        g, params = cio.import_model(args.prototxt, args.weights,
                                     batch=args.batch)
        if not params:
            params = init_params(g, seed=0)
        return g, params
    kw = {"batch": args.batch}
    if getattr(args, "image_size", None):
        kw["image_size"] = args.image_size
    g = zoo.get_model(args.model, **kw)
    params = init_params(g, seed=0)
    if args.weights:
        from channel_pruning_tpu.io.caffe import load_weights
        g, loaded = load_weights(g, args.weights)
        params.update(loaded)
    return g, params


def _resize_dim(crop: int) -> int:
    """Shorter-side resize target for a given crop, preserving the reference's
    256/224 ratio (temp/vgg.prototxt:7-21) at any model input size."""
    return max(crop + 1, int(round(crop * 256 / 224)))


_PRELOAD_CACHE: dict = {}
_PRELOAD_MAX_IMAGES = 20_000


def _image_batches(args, graph, **kw):
    """Batches from the imagefolder or a Caffe LMDB (auto-detected by
    data.mdb), sized to the model's input (crop = H of the input spec,
    resize scaled with it). Small imagefolders are decoded + preprocessed
    once and replayed from memory (epoch loops over the tunnel would
    otherwise be decode-bound)."""
    from channel_pruning_tpu.data import pipeline as dp

    crop = graph.inputs[0].shape[2]
    batch = kw.pop("batch", args.batch)
    # Caffe transform_param.scale analogue: multiply the mean-subtracted
    # pixels (e.g. 1/128 when feeding image-scale data to a unit-scale net)
    scale = float(getattr(args, "input_scale", 1.0) or 1.0)

    def scaled(it):
        if scale == 1.0:
            return it
        return ((x * scale, y) for x, y in it)

    d = Path(args.data_dir)
    if d.name == "data.mdb" or (d / "data.mdb").exists():
        from channel_pruning_tpu.data.lmdb import lmdb_batches
        return scaled(lmdb_batches(d, batch, new_dim=_resize_dim(crop),
                                   crop=crop, **kw))
    n_files = len(dp._list_imagefolder(Path(args.data_dir))[0])
    if n_files <= _PRELOAD_MAX_IMAGES:
        key = (str(args.data_dir), crop)
        if key not in _PRELOAD_CACHE:
            _PRELOAD_CACHE[key] = dp.preload_imagefolder(
                args.data_dir, new_dim=_resize_dim(crop), crop=crop)
        X, y = _PRELOAD_CACHE[key]
        kw.pop("random_crop", None)  # preload is center-crop only
        return scaled(dp.memory_batches(X, y, batch, **kw))
    return scaled(dp.imagefolder_batches(args.data_dir, batch,
                                         new_dim=_resize_dim(crop), crop=crop,
                                         **kw))


def _calibration(args, graph):
    """(n_batches, bs, 3, H, W) inputs from the dataset dir or synthetic."""
    shape = graph.inputs[0].shape
    bs = args.cal_batch
    if args.data_dir:
        from channel_pruning_tpu.data.pipeline import calibration_batches
        src = _image_batches(args, graph, batch=bs, shuffle=True,
                             seed=args.seed, loop=True)
        inputs, labels = calibration_batches(src, args.cal_batches, bs,
                                             image=shape[2])
        return inputs, labels
    # synthetic calibration lives only as a PRNG spec: batches are generated
    # straight into HBM (freeze + every rolling replay), so the ~2.9 GB
    # VGG/500 set never crosses the tunnel and is never written to the cache
    from channel_pruning_tpu.sampling.inputs import SyntheticInputs

    return SyntheticInputs(n_batches=args.cal_batches, bs=bs,
                           sample_shape=tuple(shape[1:]),
                           seed=args.seed), None


def _build_config(args):
    from channel_pruning_tpu.utils.config import default_config

    cfg = default_config()
    for kv in args.set or []:
        key, _, val = kv.partition("=")
        cfg = cfg.replace_nested(key, val)
    return cfg


def _workdir(args) -> Path:
    wd = Path(args.work_dir)
    wd.mkdir(parents=True, exist_ok=True)
    return wd


def _solver_mesh():
    """Sample-dimension mesh over every local device for the solver
    reductions (psum Gram, SURVEY.md §5); None on a single chip."""
    import jax

    from channel_pruning_tpu.parallel import mesh as mesh_mod

    if len(jax.devices()) > 1:
        mesh = mesh_mod.make_mesh()
        print(f"[prune] sharding solver reductions over "
              f"{mesh.devices.size} devices")
        return mesh
    return None


def cmd_prune(args):
    from channel_pruning_tpu.io import caffe as cio
    from channel_pruning_tpu.models.vgg import VGG16_5X_CHANNELS, VGG16_RANKS_4X
    from channel_pruning_tpu.ops.forward import to_device_params
    from channel_pruning_tpu.pipeline import c3
    from channel_pruning_tpu.sampling import FrozenCache, freeze
    from channel_pruning_tpu.sampling.sampler import resnet_share_key
    from channel_pruning_tpu.utils import flops

    cfg = _build_config(args)
    wd = _workdir(args)
    t0 = time.perf_counter()
    graph, params = _load_model(args)
    print(f"[prune] model load {time.perf_counter() - t0:.1f}s")
    if ("vgg" in graph.name
            and not any(kv.startswith("solve.dtype") for kv in args.set or [])):
        # VGG preset: bf16 replay measured selection-identical to f32
        # (BENCH_NOTES); other families stay on the reference's f32 default
        cfg = cfg.replace_nested("solve.dtype", "bfloat16")
    print(f"[prune] model {graph.name}: {len(graph.convs)} convs, "
          f"{flops.total_flops(graph):,} mults")

    graph, params = c3.preprocess(graph, params)
    inputs, labels = _calibration(args, graph)
    mesh = _solver_mesh()  # once: freeze + solve share it (one banner)

    cache_path = wd / f"frozen_{inputs.shape[0]}x{inputs.shape[1]}.npz"
    if cache_path.exists() and not args.refreeze:
        print(f"[prune] loading frozen cache {cache_path}")
        cache = FrozenCache.load(cache_path)
    else:
        from channel_pruning_tpu.utils.runtime import retry_on_worker_crash

        share = resnet_share_key(graph) if graph.sums else None
        # capture set first, so only the weights the truncated freeze
        # program reads cross the link (fitfc off skips the FC stack:
        # ~470 MB of VGG-16's 528 MB params never upload). Small FC stacks
        # (ResNet's 8 MB fc1000) stay in: capturing them keeps the freeze on
        # the proven-stable fused whole-graph program for free.
        from channel_pruning_tpu.sampling.sampler import (freeze_tensor_set,
                                                          params_for_tensors)
        fc_bytes = sum(int(np.asarray(v).nbytes)
                       for f in graph.fcs for v in params.get(f, {}).values())
        tensors = freeze_tensor_set(
            graph, include_fc=cfg.dic.fitfc or fc_bytes < (64 << 20))
        fparams = params_for_tensors(graph, params, tensors)
        t_phase = {}

        def _freeze_once():
            # upload inside: a crash retry must re-upload device state
            t = time.perf_counter()
            dfp = to_device_params(fparams)
            t_phase["upload"] = time.perf_counter() - t
            t = time.perf_counter()
            c = freeze(
                graph, dfp, inputs, tensors=tensors,
                n_points=cfg.sample.n_points_per_layer,
                seed=cfg.sample.seed, share_key=share, labels=labels,
                chunk_batches=max(cfg.sample.freeze_device_batch
                                  // inputs.shape[1], 1),
                mesh=mesh)
            t_phase["freeze"] = time.perf_counter() - t
            return c

        def _freeze_with_fallback():
            # ANY worker crash during the freeze stage disarms the fused
            # whole-net program for the in-process retry AND the re-exec
            # recovery. The in-fused handler (sampler.sample_features) only
            # fires when the fault surfaces inside the fused call — a crash
            # during the upload/compile path previously left CP_TPU_NO_FUSE
            # unset, so all 3 re-execs retried the same worker-killing
            # program (Xception freeze, 2026-08-19). Grouped freezes have
            # never faulted the worker; slower is better than never.
            import os

            from jax.errors import JaxRuntimeError

            from channel_pruning_tpu.utils.runtime import is_worker_crash
            try:
                return _freeze_once()
            except JaxRuntimeError as exc:
                if is_worker_crash(exc) and not os.environ.get(
                        "CP_TPU_NO_FUSE"):
                    os.environ["CP_TPU_NO_FUSE"] = "1"
                    print("[prune] worker crashed during freeze; the fused "
                          "whole-net program is disabled for recovery")
                raise

        cache = retry_on_worker_crash(_freeze_with_fallback)
        t_sv = time.perf_counter()
        cache.save(cache_path)
        print(f"[prune] froze calibration cache -> {cache_path} "
              f"({time.perf_counter() - t0:.1f}s incl. load: "
              f"upload {t_phase.get('upload', 0):.1f}s, "
              f"freeze {t_phase.get('freeze', 0):.1f}s, "
              f"save {time.perf_counter() - t_sv:.1f}s)")

    is_vgg = "vgg" in graph.name
    if args.mode == "2c":
        cfg = cfg.replace_nested("dic.vh", False)  # decomposition only
    if args.mode in ("3c", "2c"):
        if args.ranks:
            ranks = json.loads(Path(args.ranks).read_text())
        elif is_vgg and len(graph.convs) == 13:
            ranks = c3.ranks_for_speed(VGG16_RANKS_4X, args.speed)
        else:
            ranks = {c: max(1, int(graph.layer(c).attr("num_output") * 2
                                   // int(args.speed)))
                     for c in graph.convs[1:]}
        from channel_pruning_tpu.pipeline.checkpoint import SolveCheckpoint
        ck = SolveCheckpoint(wd / "solve_state_3c.pkl", every=1)
        res = c3.solve_3c(graph, params, cache, cfg, ranks, checkpoint=ck,
                          mesh=mesh)
    else:
        input_targets = None
        if args.channels:
            targets = json.loads(Path(args.channels).read_text())
            cfg = cfg.replace_nested("solve.band", "bottom")
        elif is_vgg and len(graph.convs) == 13 and abs(args.speed - 5.0) < 1e-6:
            targets = VGG16_5X_CHANNELS
            # released-structure table: the channel counts ARE the ground
            # truth, so land on them instead of the top of the band
            cfg = cfg.replace_nested("solve.band", "bottom")
        elif "resnet50" in graph.name and abs(args.speed - 2.0) < 1e-6:
            from channel_pruning_tpu.models.resnet import resnet50_2x_targets
            targets, input_targets = resnet50_2x_targets()
            cfg = cfg.replace_nested("solve.band", "bottom")
        else:
            targets = c3.plan_uniform_targets(graph, args.speed,
                                              rank_tol=cfg.dic.rank_tol)
        from channel_pruning_tpu.pipeline.checkpoint import SolveCheckpoint
        ck = SolveCheckpoint(wd / "solve_state_cp.pkl", every=3)
        res = c3.solve_prune(graph, params, cache, cfg,
                             channel_targets=targets,
                             input_targets=input_targets,
                             checkpoint=ck, mesh=mesh)

    dt = time.perf_counter() - t0
    print(res.summary())
    orig = flops.total_flops(graph, include_fc=False)
    new = flops.total_flops(res.graph, include_fc=False)
    print(f"[prune] conv mults {orig:,} -> {new:,} "
          f"({orig / max(new, 1):.2f}x) in {dt:.1f}s")

    prefix = {"3c": "3C", "2c": "2C", "prune": "cp"}[args.mode]
    cio.export_model(res.graph, res.params, wd / f"{prefix}_{graph.name}.prototxt",
                     wd / f"{prefix}_{graph.name}.caffemodel")
    np.savez_compressed(wd / f"{prefix}_{graph.name}_selections.npz",
                        **{k: v for k, v in res.selections.items()})
    print(f"[prune] artifacts -> {wd}/{prefix}_{graph.name}.(prototxt|caffemodel)")
    return res


def cmd_combine(args):
    from channel_pruning_tpu.graph.rewrite import combine_hp
    from channel_pruning_tpu.io import caffe as cio
    from channel_pruning_tpu.utils import flops

    graph, params = _load_model(args)
    g2, p2 = combine_hp(graph, params)
    orig = flops.total_flops(graph, include_fc=False)
    new = flops.total_flops(g2, include_fc=False)
    print(f"[combine] conv mults {orig:,} -> {new:,}")
    wd = _workdir(args)
    cio.export_model(g2, p2, wd / f"cb_{graph.name}.prototxt",
                     wd / f"cb_{graph.name}.caffemodel")


def cmd_addbn(args):
    from channel_pruning_tpu.graph.rewrite import add_bn_after_convs, split_relu
    from channel_pruning_tpu.io import caffe as cio
    from channel_pruning_tpu.ops.forward import to_device_params
    from channel_pruning_tpu.sampling.sampler import channel_stats

    graph, params = _load_model(args)
    graph = split_relu(graph)
    inputs, _ = _calibration(args, graph)
    tops = {c: graph.layer(c).tops[0] for c in graph.convs}
    stats_by_top = channel_stats(graph, to_device_params(params), inputs,
                                 tuple(tops.values()))
    stats = {c: stats_by_top[t] for c, t in tops.items()}
    g2, p2 = add_bn_after_convs(graph, params, stats)
    wd = _workdir(args)
    cio.export_model(g2, p2, wd / f"bn_{graph.name}.prototxt",
                     wd / f"bn_{graph.name}.caffemodel")
    print(f"[addbn] inserted BN after {len(stats)} convs -> {wd}")


def cmd_splitrelu(args):
    from channel_pruning_tpu.graph.rewrite import split_relu
    from channel_pruning_tpu.io import caffe as cio

    graph, params = _load_model(args)
    g2 = split_relu(graph)
    wd = _workdir(args)
    cio.export_model(g2, params, wd / f"s_{graph.name}.prototxt",
                     wd / f"s_{graph.name}.caffemodel")
    print(f"[splitrelu] -> {wd}/s_{graph.name}.prototxt")


def cmd_flop(args):
    from channel_pruning_tpu.models import zoo
    from channel_pruning_tpu.utils import flops

    graph, params = _load_model(args)
    total = flops.total_flops(graph, include_fc=False, verbose=True)
    print(f"[flop] conv mults: {total:,}")
    print(f"[param] parameters: {flops.total_params(graph, params):,}")
    denom = None
    if args.model in zoo.MODEL_REGISTRY:
        denom = zoo.MODEL_REGISTRY[args.model].get("flops")
    if args.orig_flops:
        denom = args.orig_flops
    if denom:
        print(f"[flop] {100.0 * total / denom:.2f}% of original "
              f"({denom / total:.2f}x speed-up)")
    if args.what_if_keep is not None:
        # reference `tools.py resnet` what-if (rescomputation,
        # lib/net.py:1083-1104): branch widths scaled by keep
        proj = flops.what_if_flops(graph, args.what_if_keep,
                                   match=args.what_if_match)
        base = denom or total
        print(f"[flop] what-if keep={args.what_if_keep} on "
              f"'{args.what_if_match}': {proj:,} mults "
              f"({100.0 * proj / base:.2f}% of original)")


def cmd_finetune(args):
    from channel_pruning_tpu.parallel.mesh import make_mesh
    from channel_pruning_tpu.train import finetune as ft
    from channel_pruning_tpu.utils.config import FinetuneConfig

    graph, params = _load_model(args)
    cfg = FinetuneConfig(base_lr=args.lr, batch_size=args.batch,
                         stepsize=args.lr_step or 200_000, gamma=args.gamma,
                         clip_gradients=args.clip_gradients)
    import jax
    # largest device count that divides the batch (DP shards the batch dim)
    n_dev = len(jax.devices())
    while n_dev > 1 and args.batch % n_dev:
        n_dev -= 1
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    heads = teacher = None
    if getattr(args, "teacher_prototxt", None):
        # distillation recovery against the frozen ORIGINAL net — the
        # finetune path for heads whose task labels live out-of-repo
        # (detection backbones; reference README.md:116-119)
        teacher_g, teacher_p = _load_teacher(args)
        heads = ft.distill_heads(teacher_g)
        teacher = ft.make_teacher_fn(teacher_g, teacher_p, heads)
        print(f"[finetune] distilling against {teacher_g.name}: "
              + ", ".join(f"{h.tensor}({h.kind})" for h in heads))
    if args.data_dir:
        data = _image_batches(args, graph, shuffle=True, loop=True,
                              random_crop=True, seed=args.seed)
    else:
        shape = graph.inputs[0].shape
        data = ft.synthetic_batches(args.batch, image=shape[2])
    wd = _workdir(args)
    state = ft.finetune(graph, params, data, cfg, mesh=mesh,
                        max_steps=args.steps,
                        snapshot_dir=str(wd / "snapshots"),
                        heads=heads, teacher=teacher)
    from channel_pruning_tpu.io import caffe as cio
    import jax as _jax
    host = _jax.tree_util.tree_map(np.asarray, state.params)
    cio.export_model(graph, host, wd / f"ft_{graph.name}.prototxt",
                     wd / f"ft_{graph.name}.caffemodel")
    print(f"[finetune] {state.step} steps -> {wd}/ft_{graph.name}.caffemodel")


def cmd_time(args):
    """Forward latency/throughput (the reference's `caffe time`,
    lib/net.py:1760). `--loop-steps N` chains N forwards into ONE device
    program (lax.fori_loop) so the host<->device RTT amortises away — the
    compute-honest MFU view; without it each step pays a dispatch."""
    from channel_pruning_tpu.utils.profiling import (time_forward,
                                                     time_forward_device_loop,
                                                     time_per_layer)

    graph, params = _load_model(args)
    if args.per_layer:
        res = time_per_layer(graph, params, batch=args.batch,
                             steps=args.per_layer_steps,
                             compute_dtype=args.dtype)
        other = None
        if args.compare_prototxt:
            from channel_pruning_tpu.io import caffe as cio
            g2, p2 = cio.import_model(args.compare_prototxt,
                                      args.compare_weights, batch=args.batch)
            other = time_per_layer(g2, p2, batch=args.batch,
                                   steps=args.per_layer_steps,
                                   compute_dtype=args.dtype)
            res["compare"] = other
        by_name = {r["layer"]: r for r in (other or {}).get("layers", [])}
        hdr = f"{'layer':>20s} {'type':>12s} {'ms':>9s} {'Gmult':>8s}"
        if other:
            hdr += f" {'pruned ms':>10s} {'speedup':>8s}"
        print(hdr)
        for r in res["layers"]:
            line = (f"{r['layer']:>20s} {r['type']:>12s} {r['ms']:>9.3f} "
                    f"{r['mults'] / 1e9:>8.3f}")
            o = by_name.get(r["layer"])
            if other:
                line += (f" {o['ms']:>10.3f} {r['ms'] / o['ms']:>7.2f}x"
                         if o else f" {'-':>10s} {'-':>8s}")
            print(line)
        total = f"{'TOTAL':>20s} {'':>12s} {res['sum_ms']:>9.3f}"
        if other:
            total += (f" {'':>8s} {other['sum_ms']:>10.3f} "
                      f"{res['sum_ms'] / other['sum_ms']:>7.2f}x")
        print(total)
    elif args.loop_steps:
        res = time_forward_device_loop(graph, params, batch=args.batch,
                                       steps=args.loop_steps,
                                       compute_dtype=args.dtype)
    else:
        res = time_forward(graph, params, batch=args.batch, iters=args.iters,
                           compute_dtype=args.dtype)
    print(json.dumps(res))
    return res


def cmd_deploy(args):
    """Serving export: freeze the jitted forward (weights baked in) to a
    portable StableHLO artifact via jax.export — the TPU-native analogue of
    handing the pruned prototxt+caffemodel to stock Caffe
    (/root/reference/README.md:100)."""
    from channel_pruning_tpu import deploy

    graph, params = _load_model(args)
    out = args.out or str(_workdir(args) / f"{graph.name}.stablehlo")
    payload = deploy.export_serialized(graph, params, out, batch=args.batch,
                                       output=args.output)
    print(f"[deploy] {out}: {len(payload):,} bytes "
          f"(batch {args.batch or graph.inputs[0].shape[0]})")
    return out


def _load_teacher(args):
    from channel_pruning_tpu.io import caffe as cio

    return cio.import_model(args.teacher_prototxt, args.teacher_weights,
                            batch=args.batch)


def cmd_eval(args):
    from channel_pruning_tpu.train import evaluate as ev
    from channel_pruning_tpu.train import finetune as ft

    graph, params = _load_model(args)
    if args.data_dir:
        data = _image_batches(args, graph)
    else:
        shape = graph.inputs[0].shape
        data = ft.synthetic_batches(args.batch, image=shape[2])
    if getattr(args, "teacher_prototxt", None):
        # head-fidelity eval vs the frozen original (detection backbones:
        # VOC mAP lives out-of-repo, reference README.md:116-119)
        teacher_g, teacher_p = _load_teacher(args)
        heads = ft.distill_heads(teacher_g)
        teacher = ft.make_teacher_fn(teacher_g, teacher_p, heads)
        res = ev.evaluate_heads(graph, params, teacher, heads,
                                (x for x, _ in data),
                                max_batches=args.eval_batches)
    else:
        res = ev.evaluate(graph, params, data, max_batches=args.eval_batches,
                          verbose=True)
    print(json.dumps(res))
    return res


# the reference's released-model accuracy table (reference README.md:20-26);
# ImageNet-val fractions. `verify-release --expect <key>` compares against it.
RELEASED_ACCURACY = {
    "channel_pruning_5x": {"accuracy@1": 0.678, "accuracy@5": 0.881},
    "vgg16_3c_4x": {"accuracy@1": 0.706, "accuracy@5": 0.899},
    "resnet50_2x": {"accuracy@1": 0.723, "accuracy@5": 0.908},
}


def cmd_verify_release(args):
    """The reference's release acceptance protocol, as a runnable command:
    `caffe test -iterations 5000` over val batches of 10 with
    bicubic-resize-256 / center-crop-224 / BGR mean-file subtraction
    (reference README.md:100, temp/vgg.prototxt:7-21), then the top-1/top-5
    delta vs the published table (README.md:20-26). The environment ships
    neither ImageNet nor the released caffemodels, so THIS command is the
    protocol to run the day those assets exist:

        cli verify-release --prototxt channel_pruning.prototxt \\
            --weights channel_pruning.caffemodel --data-dir <imagenet-val> \\
            --mean bgr.binaryproto --expect channel_pruning_5x
    """
    from channel_pruning_tpu.data import pipeline as dp
    from channel_pruning_tpu.train import evaluate as ev

    if not args.data_dir:
        raise SystemExit("verify-release needs --data-dir (the val set: "
                         "imagefolder or Caffe LMDB)")
    graph, params = _load_model(args)
    crop = graph.inputs[0].shape[2]
    mean = None
    if args.mean:
        if str(args.mean).endswith(".npy"):
            mean = dp.load_mean_file(args.mean)
        else:
            mean = dp.load_binaryproto_mean(args.mean, crop=crop)
        print(f"[verify] mean file {args.mean}: shape {mean.shape}")
        mean = dp.as_pixel_mean(mean)

    d = Path(args.data_dir)
    if d.name == "data.mdb" or (d / "data.mdb").exists():
        from channel_pruning_tpu.data.lmdb import lmdb_batches
        data = lmdb_batches(d, args.batch, new_dim=_resize_dim(crop),
                            crop=crop, mean=None if mean is None else
                            np.asarray(mean))
    else:
        data = dp.imagefolder_batches(args.data_dir, args.batch,
                                      new_dim=_resize_dim(crop), crop=crop,
                                      mean=mean)
    res = ev.evaluate(graph, params, data, max_batches=args.iterations,
                      verbose=True)

    expect = {}
    if args.expect:
        if args.expect not in RELEASED_ACCURACY:
            raise SystemExit(f"--expect {args.expect!r}: unknown release; "
                             f"have {sorted(RELEASED_ACCURACY)}")
        expect = dict(RELEASED_ACCURACY[args.expect])
    if args.expect_top1 is not None:
        expect["accuracy@1"] = args.expect_top1
    if args.expect_top5 is not None:
        expect["accuracy@5"] = args.expect_top5

    out = {"measured": res, "protocol": {
        "iterations": args.iterations, "batch": args.batch,
        "resize": _resize_dim(crop), "crop": crop,
        "mean": str(args.mean) if args.mean else "BGR pixel mean"}}
    if expect:
        deltas = {k: round(res[k] - v, 4) for k, v in expect.items()}
        ok = all(res[k] >= v - args.tolerance for k, v in expect.items())
        out.update(expected=expect, delta=deltas,
                   tolerance=args.tolerance,
                   verdict="PASS" if ok else "FAIL")
        for k, v in expect.items():
            print(f"[verify] {k}: measured {res[k]:.4f} vs released {v:.4f} "
                  f"(delta {deltas[k]:+.4f})")
        print(f"[verify] {out['verdict']} (tolerance {args.tolerance})")
    print(json.dumps(out))
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(prog="channel_pruning_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--model", default="vgg16")
        p.add_argument("--prototxt", default=None)
        p.add_argument("--weights", default=None)
        p.add_argument("--batch", type=int, default=10)
        p.add_argument("--image-size", type=int, default=None)
        p.add_argument("--work-dir", default="work")
        p.add_argument("--data-dir", default=None)
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--platform", default=None,
                       help="jax platform override (e.g. cpu) — useful for "
                            "smokes while the TPU is busy")
        p.add_argument("--set", action="append", metavar="KEY=VAL",
                       help="nested config override, e.g. dic.keep=3.0")
        p.add_argument("--input-scale", type=float, default=1.0,
                       help="multiply mean-subtracted pixels by this "
                            "(Caffe transform_param.scale)")

    p = sub.add_parser("prune", help="c3 compression pipeline")
    common(p)
    p.add_argument("--mode", choices=["prune", "3c", "2c"], default="prune")
    p.add_argument("--speed", type=float, default=5.0)
    p.add_argument("--cal-batches", type=int, default=50)
    p.add_argument("--cal-batch", type=int, default=10)
    p.add_argument("--ranks", default=None, help="json file {conv: rank}")
    p.add_argument("--channels", default=None, help="json file {conv: keep}")
    p.add_argument("--refreeze", action="store_true")
    p.set_defaults(fn=cmd_prune)

    p = sub.add_parser("combine", help="merge H into P convs (combineHP)")
    common(p)
    p.set_defaults(fn=cmd_combine)

    p = sub.add_parser("addbn", help="measure stats and insert BN for finetune")
    common(p)
    p.add_argument("--cal-batches", type=int, default=50)
    p.add_argument("--cal-batch", type=int, default=10)
    p.set_defaults(fn=cmd_addbn)

    p = sub.add_parser("splitrelu", help="make in-place ReLUs addressable")
    common(p)
    p.set_defaults(fn=cmd_splitrelu)

    p = sub.add_parser("flop", help="FLOPs accounting")
    common(p)
    p.add_argument("--orig-flops", type=int, default=None)
    p.add_argument("--what-if-keep", type=float, default=None,
                   help="project FLOPs with matching conv outputs scaled by "
                        "this keep ratio (tools.py resnet what-if)")
    p.add_argument("--what-if-match", default="branch2a",
                   help="substring selecting the convs to scale")
    p.set_defaults(fn=cmd_flop)

    p = sub.add_parser("finetune", help="data-parallel SGD finetune")
    common(p)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--lr-step", type=int, default=None,
                   help="step-decay interval (solver.prototxt stepsize)")
    p.add_argument("--gamma", type=float, default=0.1)
    p.add_argument("--clip-gradients", type=float, default=0.0,
                   help="SolverParameter.clip_gradients: rescale updates "
                        "whose global L2 norm exceeds this (0 = off); "
                        "needed when finetuning 3C-decomposed nets")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--teacher-prototxt", default=None,
                   help="distill against this frozen original net instead "
                        "of labels (multi-head recovery for detection "
                        "backbones: RPN cls softmax + bbox SmoothL1)")
    p.add_argument("--teacher-weights", default=None)
    p.set_defaults(fn=cmd_finetune)

    p = sub.add_parser("eval", help="top-1/top-5 evaluation")
    common(p)
    p.add_argument("--eval-batches", type=int, default=None)
    p.add_argument("--teacher-prototxt", default=None,
                   help="report per-head fidelity vs this frozen original "
                        "net instead of label accuracy")
    p.add_argument("--teacher-weights", default=None)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("verify-release",
                       help="released-model acceptance protocol: caffe test "
                            "-iterations 5000 + delta vs the published table")
    common(p)
    p.add_argument("--iterations", type=int, default=5000,
                   help="val batches to evaluate (reference README.md:100)")
    p.add_argument("--mean", default=None,
                   help="mean file (.binaryproto or .npy); default: BGR "
                        "pixel mean")
    p.add_argument("--expect", default=None,
                   help=f"released model key: {sorted(RELEASED_ACCURACY)}")
    p.add_argument("--expect-top1", type=float, default=None)
    p.add_argument("--expect-top5", type=float, default=None)
    p.add_argument("--tolerance", type=float, default=0.001,
                   help="accepted shortfall vs the released numbers "
                        "(BASELINE.md bar: top-5 within 0.1%%)")
    p.set_defaults(fn=cmd_verify_release)

    p = sub.add_parser("deploy", help="export serving artifact (StableHLO)")
    common(p)
    p.add_argument("--out", default=None, help="output path (.stablehlo)")
    p.add_argument("--output", default=None,
                   help="graph tensor to serve (default: last output)")
    p.set_defaults(fn=cmd_deploy)

    p = sub.add_parser("time", help="forward latency/throughput (caffe time)")
    common(p)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--loop-steps", type=int, default=0,
                   help="chain N forwards into one device program "
                        "(RTT-free compute timing)")
    p.add_argument("--dtype", default=None,
                   help="compute dtype for the timed forward, e.g. bfloat16")
    p.add_argument("--per-layer", action="store_true",
                   help="per-layer forward ms table (caffe time parity, "
                        "lib/net.py:1755-1760); each layer timed as its own "
                        "device loop over its real inputs")
    p.add_argument("--per-layer-steps", type=int, default=20,
                   help="loop iterations per layer program")
    p.add_argument("--compare-prototxt", default=None,
                   help="also time this (pruned) model and print side-by-side "
                        "per-layer speedups")
    p.add_argument("--compare-weights", default=None)
    p.set_defaults(fn=cmd_time)

    args = parser.parse_args(argv)
    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)
    # AFTER platform selection: the cache is skipped on CPU backends (stale
    # cross-host AOT entries execute illegal instructions — runtime.py)
    from channel_pruning_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    wdog = None
    if argv is None and getattr(args, "platform", None) != "cpu":
        # hang detection for tunneled-TPU runs (see runtime.Watchdog)
        from channel_pruning_tpu.utils.runtime import Watchdog
        wdog = Watchdog(["-m", "channel_pruning_tpu.cli"] + sys.argv[1:]).start()
    try:
        return args.fn(args)
    except Exception as exc:
        # process-level crash recovery: a dead axon worker permanently
        # invalidates this process's PJRT client, so reconnecting means
        # re-exec'ing (every stage is resumable: frozen cache on disk,
        # mid-solve checkpoint, orbax snapshots). Only from a real command
        # line — never hijack a programmatic main(argv) call (tests).
        from channel_pruning_tpu.utils.runtime import (
            is_worker_crash, wait_for_device_subprocess)
        if (argv is not None or not is_worker_crash(exc)
                or type(exc).__name__ != "JaxRuntimeError"):
            raise
        import os
        n = int(os.environ.get("CP_TPU_REEXEC", "0"))
        if n >= 3 or not wait_for_device_subprocess():
            raise
        os.environ["CP_TPU_REEXEC"] = str(n + 1)
        print(f"[cli] TPU worker died mid-run; re-executing to reconnect "
              f"(attempt {n + 1}/3)")
        sys.stdout.flush()
        os.execv(sys.executable, [sys.executable, "-m",
                                  "channel_pruning_tpu.cli"] + sys.argv[1:])


if __name__ == "__main__":
    main()
