"""Measure the whole-net freeze (calibration sampling pass): fused one-program
path vs the grouped <=6-tensor path, VGG-16 @ 500 images (the reference's
extract_features workload, lib/net.py:368-532 at nBatches=500).

Usage: python tools/freeze_bench.py [--mode fused|grouped|both] [--images 500]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both", choices=["fused", "grouped", "both"])
    ap.add_argument("--images", type=int, default=500)
    ap.add_argument("--bs", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=25,
                    help="batches per device step (CLI uses "
                         "sample.device_batch // bs = 10 by default)")
    ap.add_argument("--no-fc", action="store_true",
                    help="FC-truncated capture set (the fitfc-off CLI path)")
    ap.add_argument("--host-inputs", action="store_true",
                    help="host-array calibration (uploads ~n GB over the "
                         "tunnel) instead of the device-side generator the "
                         "CLI's synthetic mode now uses")
    args = ap.parse_args()

    from channel_pruning_tpu.models.vgg import build_vgg16, init_params
    from channel_pruning_tpu.ops.forward import to_device_params
    from channel_pruning_tpu.pipeline import c3
    from channel_pruning_tpu.sampling import sampler
    from channel_pruning_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    g = build_vgg16(batch=args.bs)
    params = init_params(g, seed=0)
    g, params = c3.preprocess(g, params)
    dparams = to_device_params(params)
    n_batches = args.images // args.bs
    if args.host_inputs:
        rng = np.random.default_rng(0)
        inputs = rng.normal(0, 1, (n_batches, args.bs, 3, 224, 224)
                            ).astype(np.float32)
    else:
        from channel_pruning_tpu.sampling.inputs import SyntheticInputs

        inputs = SyntheticInputs(n_batches=n_batches, bs=args.bs,
                                 sample_shape=(3, 224, 224), seed=0)

    results = {}
    modes = ["fused", "grouped"] if args.mode == "both" else [args.mode]
    for mode in modes:
        names = [g.layer(c).tops[0] for c in g.convs]
        if not args.no_fc:
            names += [g.layer(f).tops[0] for f in g.fcs]
        from channel_pruning_tpu.graph.ir import shapes_of
        shapes = shapes_of(g, batch=args.bs)
        plan = sampler.make_point_plan(shapes, names, n_batches, 10, 0)
        # warm compile with a 1-chunk slice, then time the full pass
        ck = args.chunk
        if args.host_inputs:
            warm = inputs[:ck]
        else:
            from channel_pruning_tpu.sampling.inputs import SyntheticInputs

            warm = SyntheticInputs(n_batches=ck, bs=args.bs,
                                   sample_shape=(3, 224, 224), seed=0)
        sampler.sample_features(g, dparams, warm, plan={
            t: (p[0][:ck], p[1][:ck]) for t, p in plan.items()},
            tensors=names, chunk_batches=ck, fuse=(mode == "fused"))
        t0 = time.perf_counter()
        feats = sampler.sample_features(g, dparams, inputs, plan, names,
                                        chunk_batches=ck,
                                        fuse=(mode == "fused"))
        dt = time.perf_counter() - t0
        results[mode] = (dt, {t: v.shape for t, v in feats.items()})
        print(f"[freeze_bench] {mode}: {dt:.1f}s for {args.images} images, "
              f"{len(names)} tensors")

    if len(modes) == 2:
        f, gr = results["fused"][0], results["grouped"][0]
        print(f"[freeze_bench] speedup fused vs grouped: {gr / f:.2f}x")
        # parity: same shapes (values identical by construction; the fused
        # path is a concat/split of the same gathers)
        assert results["fused"][1] == results["grouped"][1]


if __name__ == "__main__":
    main()
