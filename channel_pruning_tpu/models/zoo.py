"""Model registry (reference: cfgs.Models / per-model classes, lib/cfgs.py:56-66)."""
from __future__ import annotations

from typing import Callable

from channel_pruning_tpu.graph.ir import Graph
from channel_pruning_tpu.models import resnet, vgg


MODEL_REGISTRY: dict[str, dict] = {
    "vgg16": {
        "build": vgg.build_vgg16,
        "flops": vgg.VGG16_FLOPS,
        "accname": "accuracy@5",
        "family": "vgg",
    },
    "resnet50": {
        "build": resnet.build_resnet50,
        "flops": resnet.RESNET50_FLOPS,
        "accname": "accuracy@5",
        "family": "resnet",
    },
    "tiny_vgg": {
        "build": lambda **kw: vgg.build_tiny_vgg(**kw)[0],
        "flops": None,
        "accname": "accuracy@1",
        "family": "vgg",
    },
    "tiny_resnet": {
        "build": lambda **kw: resnet.build_tiny_resnet(**kw)[0],
        "flops": None,
        "accname": "accuracy@1",
        "family": "resnet",
    },
}


def get_model(name: str, **kwargs) -> Graph:
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(MODEL_REGISTRY)}")
    build: Callable[..., Graph] = MODEL_REGISTRY[name]["build"]
    return build(**kwargs)
