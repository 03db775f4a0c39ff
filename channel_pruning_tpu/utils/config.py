"""Typed, immutable configuration.

Replaces the reference's ambient mutable EasyDict config (lib/cfgs.py:2-121)
with frozen dataclasses threaded explicitly through the pipeline — required
for jit purity, and it keeps the same knob surface: speed-up `keep`,
`rank_tol`, LASSO seed `alpha`, `n_batches`/`n_points_per_layer` sampling
sizes, solver selection, etc. (lib/cfgs.py:68-117).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


class PruneMode:
    """Pipeline flavours (reference: pruning_options / dic.vh, lib/cfgs.py:47-51,78)."""

    PRUNE = "prune"  # channel pruning only (the ICCV'17 "channel pruning 5x" model)
    C3 = "3c"        # spatial SVD + channel decomposition + pruning (the "3C 4x" model)
    C2 = "2c"        # decomposition only, no pruning


class Solvers:
    """Solver backends (reference: cfgs.solvers, lib/cfgs.py:40-46).

    The reference had six half-wired backends; we keep exactly one good
    device implementation per role plus a numpy oracle used in tests.
    """

    DEVICE = "device"   # on-TPU Gram/CD solvers (default)
    NUMPY = "numpy"     # numpy/sklearn oracle path (parity testing)


@dataclass(frozen=True)
class DicConfig:
    """LASSO / dictionary-solver knobs (reference: c.dic, lib/cfgs.py:68-79)."""

    keep: float = 3.0          # speed ratio knob: ranks scale by 4/keep (net.py:1323-1326)
    rank_tol: float = 0.1      # accepted support band [rank, rank+tol*rank] (decompose.py:487-525)
    c_ratio: float = 1.15      # pruned channel count d_c = C_out / c_ratio (net.py:1327)
    alter: bool = False        # alternating LASSO <-> lstsq refinement (decompose.py:526-580)
    vh: bool = True            # gate spatial decomposition + pruning (cfgs.py:78)
    fitfc: bool = False        # include FC layers in solve set (cfgs.py:73)
    # route 1x1-kernel consumers through the row-sparse group lasso
    # (MultiTaskLasso). The reference CODE carries this branch
    # (decompose.py:439-444) but ships it disabled — the gate reads
    # `if h == 1 and False:` (decompose.py:406) and the grplasso_kernel
    # selected by dic.afterconv is undefined (net.py:87) — so the SHIPPED
    # semantics, and our default, is the summed single-task form for every
    # consumer. True enables the intended group selection for 1x1/FC; the
    # released ResNet-50 tables were produced with the shipped (False) path.
    grplasso: bool = False
    # autodet mode's per-layer alpha exponent: the fixed selection alpha is
    # solve.alpha / c**layeralpha, c = consumer input channels
    # (reference c.dic.layeralpha, lib/cfgs.py:70; used decompose.py:415)
    layeralpha: float = 1.0
    debug: bool = False


@dataclass(frozen=True)
class LassoConfig:
    """On-device LASSO solver parameters (no reference equivalent — the
    reference delegated to sklearn coordinate descent, decompose.py:449)."""

    n_sweeps: int = 200          # CD sweeps per alpha
    tol: float = 1e-6            # convergence tol on max |delta beta|
    grid_size: int = 32          # alphas solved in parallel per refinement round
    max_rounds: int = 8          # grid refinement rounds
    subsample_rows: int = 400    # row subsample for Z (decompose.py:425)


@dataclass(frozen=True)
class SampleConfig:
    """Activation sampling (reference: nBatches/nPointsPerLayer, cfgs.py:104,108)."""

    n_batches: int = 500
    batch_size: int = 10
    n_points_per_layer: int = 10
    seed: int = 0
    device_batch: int = 100      # images per device forward step: bounded so
    # two adjacent VGG-scale feature maps (~1.3 GB each at 100 images) plus
    # weights fit HBM with the inline capture-gather (ops/forward.py)
    freeze_device_batch: int = 200  # images per step for the whole-net fused
    # freeze program ONLY: the axon worker reproducibly dies executing that
    # program at 100 images/step but is stable at 200-250 (measured); 250
    # fit HBM when the program carried the FC stack, but the FC-truncated
    # freeze (fitfc off) schedules to a ~1 GB higher activation peak and
    # OOMs 16.05/15.75 GB at 250 — 200 restores ~3 GB of headroom


@dataclass(frozen=True)
class SolveConfig:
    """Reconstruction / decomposition solvers."""

    alpha: float = 1e-3          # LASSO alpha seed (cfgs.py:18)
    # fixed-alpha support-free selection: solve the LASSO ONCE at
    # alpha / c**dic.layeralpha and keep whatever support comes out — no
    # band search, no target enforcement (reference c.autodet,
    # lib/cfgs.py:110; norank path decompose.py:395,414-415,582-585)
    autodet: bool = False
    ls_ridge: float = 0.0        # optional ridge in reconstruction (cfgs.fc_ridge)
    nonlinear_lambdas: tuple[float, ...] = (0.1, 1.0)   # relu-ALS schedule
    nonlinear_iters: tuple[int, ...] = (30, 20)         # (decompose.py:204-208,677-679)
    itq_lambdas: tuple[float, ...] = (0.1, 1.0)
    itq_iters: tuple[int, ...] = (30, 20)
    cholesky_jitter: float = 1e-6
    # which end of the rank_tol support band the alpha search refines to:
    # "top" (default) keeps the most channels the speed target allows (best
    # rMSE; the planner bakes the overshoot into its targets), "bottom"
    # lands on the exact requested count — used when reproducing a released
    # structure table where the channel count itself is ground truth
    band: str = "top"
    # run the whole alpha search as ONE device program (lax.while_loop over
    # grid rounds, ops/lasso._fused_search) instead of host-stepped rounds.
    # Saves ~10-20 tunnel round trips per layer (~1.8x faster per-layer
    # solve, BENCH_r03); grid endpoints compute in f32 on device (vs f64 on
    # host) so borderline supports can differ by one probe — support counts
    # match on the parity battery (tests/test_solvers.py) and whole-model
    # keep structures are byte-identical on VGG 5x / 3C 4x / ResNet 2x.
    # Default ON since round 4; --set solve.fused_search=False restores the
    # host-stepped measured-exact path.
    fused_search: bool = True
    # replay/extraction compute dtype. The reference runs f32 everywhere;
    # that stays the global default. bf16 forwards were measured
    # selection-identical to f32 (rMSE to 1e-3, BENCH_NOTES) on VGG-16 —
    # the VGG CLI presets opt in, and any run can via
    # --set solve.dtype=bfloat16. The SOLVER math itself always runs
    # f32-precision (ops/lstsq.f32_matmuls) either way.
    dtype: str = "float32"


@dataclass(frozen=True)
class FinetuneConfig:
    """Data-parallel finetune (reference: temp/solver.prototxt:1-18)."""

    base_lr: float = 1e-5
    momentum: float = 0.9
    weight_decay: float = 0.0
    nesterov: bool = True
    batch_size: int = 128
    max_iter: int = 200_000
    lr_policy: str = "step"
    stepsize: int = 200_000
    gamma: float = 0.1
    snapshot_every: int = 20_000
    snapshot_dir: str = "snapshots"
    # Caffe SolverParameter.clip_gradients: scale the update when the global
    # L2 gradient norm exceeds this (0 = off, the solver.prototxt default).
    # Finetuning 3C-decomposed V/H/P chains needs it: a single outlier batch
    # spikes the gradient through the factored 1x1 stacks and SGD+momentum
    # then diverges to NaN within ~10 steps at any useful lr.
    clip_gradients: float = 0.0


@dataclass(frozen=True)
class Config:
    """Top-level pipeline config (reference: lib/cfgs.py module)."""

    model: str = "vgg16"
    mode: str = PruneMode.C3
    solver: str = Solvers.DEVICE
    dic: DicConfig = field(default_factory=DicConfig)
    lasso: LassoConfig = field(default_factory=LassoConfig)
    sample: SampleConfig = field(default_factory=SampleConfig)
    solve: SolveConfig = field(default_factory=SolveConfig)
    finetune: FinetuneConfig = field(default_factory=FinetuneConfig)
    data_dir: str = ""          # ImageNet directory (synthetic data when empty)
    work_dir: str = "work"
    accname: str = "accuracy@5"

    def replace(self, **kwargs: Any) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def replace_nested(self, path: str, value: Any) -> "Config":
        """Replace a nested knob addressed as 'dic.keep' etc. (mirrors the
        reference's '-dic.keep'-style CLI flags, train.py:128-153)."""
        parts = path.split(".")
        if len(parts) == 1:
            cur = getattr(self, parts[0])
            return dataclasses.replace(self, **{parts[0]: type(cur)(value) if cur is not None else value})
        obj = getattr(self, parts[0])
        cur = getattr(obj, parts[1])
        coerced = type(cur)(value) if not isinstance(cur, bool) else _to_bool(value)
        return dataclasses.replace(self, **{parts[0]: dataclasses.replace(obj, **{parts[1]: coerced})})


def _to_bool(v: Any) -> bool:
    if isinstance(v, str):
        return v.lower() in ("1", "true", "yes", "on")
    return bool(v)


def default_config(**kwargs: Any) -> Config:
    return Config(**kwargs)
