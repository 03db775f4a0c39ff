"""Graph IR <-> Caffe model interop.

Import: prototxt text -> Graph (layer types of SURVEY.md §2.2), caffemodel
binary -> params pytree. Export: the inverse, producing artifacts loadable by
stock Caffe — the fidelity-check contract of SURVEY.md §2.2 ("Protobuf model
format ... north-star requirement"). The Caffe-fork `Filter` layer maps to
our static `Select` gather both ways.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np

from channel_pruning_tpu.graph.ir import Graph, Layer, LT, TensorSpec
from channel_pruning_tpu.io import caffemodel as cm
from channel_pruning_tpu.io import prototxt as pt

_DATA_TYPES = ("Data", "ImageData", "MemoryData", "Input", "HDF5Data",
               "DummyData")


# ---------------------------------------------------------------------------
# prototxt -> Graph
# ---------------------------------------------------------------------------

def _first(v, default=None):
    vals = pt.as_list(v)
    return vals[0] if vals else default


def _conv_attrs(p: Mapping[str, Any]) -> dict[str, Any]:
    a: dict[str, Any] = {"num_output": int(p["num_output"])}
    if "kernel_size" in p:
        a["kernel_size"] = int(_first(p["kernel_size"]))
    for k in ("kernel_h", "kernel_w", "stride_h", "stride_w", "pad_h", "pad_w"):
        if k in p:
            a[k] = int(p[k])
    if "pad" in p:
        a["pad"] = int(_first(p["pad"]))
    if "stride" in p:
        a["stride"] = int(_first(p["stride"]))
    if "group" in p:
        a["group"] = int(p["group"])
    a["bias"] = bool(p.get("bias_term", True))
    return a


def import_prototxt(text: str, *, batch: int | None = None,
                    default_image: int = 224) -> Graph:
    msg = pt.parse(text)
    name = msg.get("name", "net")
    inputs: list[TensorSpec] = []
    layers: list[Layer] = []

    # old-style net inputs: input/input_dim or input_shape
    in_names = [str(s) for s in pt.as_list(msg.get("input"))]
    dims = [int(d) for d in pt.as_list(msg.get("input_dim"))]
    shapes = pt.as_list(msg.get("input_shape"))
    for i, iname in enumerate(in_names):
        if shapes:
            dim = [int(d) for d in pt.as_list(shapes[i]["dim"])]
        else:
            dim = dims[4 * i:4 * i + 4]
        if batch is not None and dim:
            dim[0] = batch
        inputs.append(TensorSpec(iname, tuple(dim)))

    for lmsg in pt.as_list(msg.get("layer")) + pt.as_list(msg.get("layers")):
        lname = lmsg["name"]
        ltype = lmsg["type"]
        bottoms = [str(b) for b in pt.as_list(lmsg.get("bottom"))]
        tops = [str(t) for t in pt.as_list(lmsg.get("top"))] or [lname]
        # skip phase-TRAIN-only duplicates (keep the TEST/eval graph)
        include = pt.as_list(lmsg.get("include"))
        if include and all(inc.get("phase") == "TRAIN" for inc in include):
            continue

        if ltype in _DATA_TYPES:
            tp = lmsg.get("transform_param", {})
            crop = int(tp.get("crop_size", default_image))
            if ltype == "Input":
                ip = lmsg.get("input_param", {})
                shp = pt.as_list(ip.get("shape"))
                dim = [int(d) for d in pt.as_list(shp[0]["dim"])] if shp \
                    else [batch or 1, 3, crop, crop]
            else:
                dp = lmsg.get(f"{ltype[0].lower()}{ltype[1:]}_param",
                              lmsg.get("data_param", lmsg.get("image_data_param",
                                       lmsg.get("memory_data_param", {}))))
                bs = int(dp.get("batch_size", batch or 1))
                dim = [batch or bs, 3, crop, crop]
            if batch is not None:
                dim[0] = batch
            inputs.append(TensorSpec(tops[0], tuple(dim)))
            # a paired label tensor may be produced; eval harness provides it
            continue

        if ltype == "Convolution":
            attrs = _conv_attrs(lmsg.get("convolution_param", {}))
            layers.append(Layer.make(lname, LT.CONV, bottoms, tops, **attrs))
        elif ltype == "InnerProduct":
            p = lmsg.get("inner_product_param", {})
            layers.append(Layer.make(lname, LT.FC, bottoms[:1], tops,
                                     num_output=int(p["num_output"]),
                                     bias=bool(p.get("bias_term", True))))
        elif ltype == "Pooling":
            p = lmsg.get("pooling_param", {})
            pool = str(p.get("pool", "MAX")).lower()
            attrs = {"pool": {"max": "max", "ave": "ave"}.get(pool, pool)}
            if p.get("global_pooling"):
                attrs["global_pooling"] = True
            else:
                attrs["kernel_size"] = int(p["kernel_size"])
                attrs["stride"] = int(p.get("stride", 1))
                attrs["pad"] = int(p.get("pad", 0))
            # PoolingParameter.round_mode (CEIL default; FLOOR for the
            # torch-style models, e.g. Xception's strided blocks)
            if str(p.get("round_mode", "CEIL")).upper() == "FLOOR":
                attrs["ceil_mode"] = False
            layers.append(Layer.make(lname, LT.POOL, bottoms, tops, **attrs))
        elif ltype == "ReLU":
            layers.append(Layer.make(lname, LT.RELU, bottoms, tops))
        elif ltype == "Eltwise":
            p = lmsg.get("eltwise_param", {})
            op = str(p.get("operation", "SUM")).lower()
            layers.append(Layer.make(lname, LT.ELTWISE, bottoms, tops,
                                     operation={"sum": "sum", "max": "max",
                                                "prod": "prod"}[op]))
        elif ltype == "BatchNorm":
            p = lmsg.get("batch_norm_param", {})
            layers.append(Layer.make(lname, LT.BN, bottoms, tops,
                                     eps=float(p.get("eps", 1e-5))))
        elif ltype == "Scale":
            p = lmsg.get("scale_param", {})
            layers.append(Layer.make(lname, LT.SCALE, bottoms, tops,
                                     bias=bool(p.get("bias_term", False))))
        elif ltype == "Dropout":
            p = lmsg.get("dropout_param", {})
            layers.append(Layer.make(lname, LT.DROPOUT, bottoms, tops,
                                     dropout_ratio=float(p.get("dropout_ratio", 0.5))))
        elif ltype == "Softmax":
            layers.append(Layer.make(lname, LT.SOFTMAX, bottoms, tops))
        elif ltype == "SoftmaxWithLoss":
            layers.append(Layer.make(lname, LT.SOFTMAX_LOSS, bottoms[:1], tops))
        elif ltype == "Accuracy":
            p = lmsg.get("accuracy_param", {})
            layers.append(Layer.make(lname, LT.ACCURACY, bottoms[:1], tops,
                                     top_k=int(p.get("top_k", 1))))
        elif ltype == "Flatten":
            layers.append(Layer.make(lname, LT.FLATTEN, bottoms, tops))
        elif ltype == "Concat":
            p = lmsg.get("concat_param", {})
            layers.append(Layer.make(lname, LT.CONCAT, bottoms, tops,
                                     axis=int(p.get("axis", 1))))
        elif ltype == "Filter":
            # Caffe-fork channel gate (builder.py:659-672); indices come from
            # the caffemodel blob via load_weights
            p = lmsg.get("filter_param", {})
            layers.append(Layer.make(lname, LT.SELECT, bottoms, tops,
                                     num_output=int(p.get("num_output", 0)),
                                     indices=()))
        elif ltype == "Split":
            # pure fan-out: alias every top to the bottom via identity relus?
            # -> model as SELECT of all channels is wasteful; rewire consumers
            for t in tops:
                layers.append(Layer.make(f"{lname}__{t}", LT.SELECT, bottoms,
                                         [t], indices=None, passthrough=True))
        else:
            raise NotImplementedError(f"layer type {ltype!r} ({lname})")

    g = Graph(name=str(name), inputs=tuple(inputs), layers=tuple(layers))
    g.validate()
    return g


def import_prototxt_file(path: str | Path, **kw) -> Graph:
    return import_prototxt(Path(path).read_text(), **kw)


# ---------------------------------------------------------------------------
# Graph -> prototxt
# ---------------------------------------------------------------------------

def export_prototxt(graph: Graph, data_layer: Mapping[str, Any] | None = None
                    ) -> str:
    """Render the graph as prototxt. By default net inputs become
    input/input_shape headers; with `data_layer` (e.g. {"source": "val.txt",
    "batch_size": 10, "new_dim": 256, "crop_size": 224, "mean_file":
    "bgr.binaryproto"}) an ImageData eval layer matching the fork's
    (temp/vgg.prototxt:7-21) is emitted instead, so `caffe test` can run the
    artifact directly."""
    msg: pt.Msg = {"name": graph.name}
    out_layers: list[pt.Msg] = []
    if data_layer is not None and graph.inputs:
        spec = graph.inputs[0]
        tp: pt.Msg = {"crop_size": int(data_layer.get("crop_size", spec.shape[2]))}
        if "mean_file" in data_layer:
            tp["mean_file"] = data_layer["mean_file"]
        idp: pt.Msg = {"source": data_layer.get("source", "val.txt"),
                       "batch_size": int(data_layer.get("batch_size", spec.shape[0])),
                       "new_dim": int(data_layer.get("new_dim", 256)),
                       "bicubic": True,
                       "shuffle": bool(data_layer.get("shuffle", False))}
        if "root_folder" in data_layer:
            idp["root_folder"] = data_layer["root_folder"]
        out_layers.append({"name": "data", "type": "ImageData",
                           "top": [spec.name, "label"],
                           "transform_param": tp, "image_data_param": idp})
    elif graph.inputs:
        msg["input"] = [s.name for s in graph.inputs]
        msg["input_shape"] = [{"dim": list(s.shape)} for s in graph.inputs]
    for l in graph.layers:
        lm: pt.Msg = {"name": l.name, "bottom": list(l.bottoms),
                      "top": list(l.tops)}
        a = l.attr_dict
        if l.type == LT.CONV:
            lm["type"] = "Convolution"
            geo = l.conv_geometry()
            cp: pt.Msg = {"num_output": int(a["num_output"])}
            if geo["kh"] == geo["kw"]:
                cp["kernel_size"] = geo["kh"]
            else:
                cp["kernel_h"], cp["kernel_w"] = geo["kh"], geo["kw"]
            if geo["ph"] or geo["pw"]:
                if geo["ph"] == geo["pw"]:
                    cp["pad"] = geo["ph"]
                else:
                    cp["pad_h"], cp["pad_w"] = geo["ph"], geo["pw"]
            if geo["sh"] != 1 or geo["sw"] != 1:
                if geo["sh"] == geo["sw"]:
                    cp["stride"] = geo["sh"]
                else:
                    cp["stride_h"], cp["stride_w"] = geo["sh"], geo["sw"]
            if geo["group"] != 1:
                cp["group"] = geo["group"]
            if not a.get("bias", True):
                cp["bias_term"] = False
            lm["convolution_param"] = cp
        elif l.type == LT.FC:
            lm["type"] = "InnerProduct"
            lm["inner_product_param"] = {"num_output": int(a["num_output"])}
        elif l.type == LT.POOL:
            lm["type"] = "Pooling"
            pp: pt.Msg = {"pool": str(a.get("pool", "max")).upper()}
            if a.get("global_pooling"):
                pp["global_pooling"] = True
            else:
                pp["kernel_size"] = int(a["kernel_size"])
                if a.get("stride", 1) != 1:
                    pp["stride"] = int(a["stride"])
                if a.get("pad", 0):
                    pp["pad"] = int(a["pad"])
            if not a.get("ceil_mode", True):
                pp["round_mode"] = "FLOOR"
            lm["pooling_param"] = pp
        elif l.type == LT.RELU:
            lm["type"] = "ReLU"
        elif l.type == LT.ELTWISE:
            lm["type"] = "Eltwise"
            op = a.get("operation", "sum")
            if op != "sum":
                lm["eltwise_param"] = {"operation": str(op).upper()}
        elif l.type == LT.BN:
            lm["type"] = "BatchNorm"
            lm["batch_norm_param"] = {"use_global_stats": True,
                                      "eps": float(a.get("eps", 1e-5))}
        elif l.type == LT.SCALE:
            lm["type"] = "Scale"
            lm["scale_param"] = {"bias_term": bool(a.get("bias", True))}
        elif l.type == LT.DROPOUT:
            lm["type"] = "Dropout"
            lm["dropout_param"] = {"dropout_ratio": float(a.get("dropout_ratio", 0.5))}
        elif l.type == LT.SOFTMAX:
            lm["type"] = "Softmax"
        elif l.type == LT.SOFTMAX_LOSS:
            lm["type"] = "SoftmaxWithLoss"
        elif l.type == LT.ACCURACY:
            lm["type"] = "Accuracy"
            if a.get("top_k", 1) != 1:
                lm["accuracy_param"] = {"top_k": int(a["top_k"])}
        elif l.type == LT.FLATTEN:
            lm["type"] = "Flatten"
        elif l.type == LT.CONCAT:
            lm["type"] = "Concat"
        elif l.type == LT.SELECT:
            lm["type"] = "Filter"  # Caffe-fork channel gate
            lm["filter_param"] = {"num_output": int(a.get("num_output", 0))}
        else:
            raise NotImplementedError(f"export of {l.type}")
        out_layers.append(lm)
    msg["layer"] = out_layers
    return pt.dump(msg) + "\n"


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

def load_weights(graph: Graph, model_path: str | Path
                 ) -> tuple[Graph, dict[str, dict[str, np.ndarray]]]:
    """Assign caffemodel blobs to the params pytree by layer name
    (pycaffe's net.params contract: conv/fc [W, b]; BN [mean, var, factor];
    Scale [W, b]; Filter [selection indices])."""
    _, records = cm.load_caffemodel(model_path)
    by_name = {r.name: r for r in records}
    params: dict[str, dict[str, np.ndarray]] = {}
    for l in graph.layers:
        r = by_name.get(l.name)
        if r is None or not r.blobs:
            continue
        if l.type in (LT.CONV, LT.FC):
            p: dict[str, np.ndarray] = {}
            W = np.asarray(r.blobs[0], np.float32)
            if l.type == LT.FC:
                W = W.reshape(W.shape[-2], W.shape[-1]) if W.ndim > 2 else W
            p["W"] = W
            if len(r.blobs) > 1:
                p["b"] = np.asarray(r.blobs[1], np.float32).reshape(-1)
            params[l.name] = p
        elif l.type == LT.BN:
            params[l.name] = {
                "mean": np.asarray(r.blobs[0], np.float32).reshape(-1),
                "var": np.asarray(r.blobs[1], np.float32).reshape(-1),
                "factor": np.asarray(r.blobs[2], np.float32).reshape(()),
            }
        elif l.type == LT.SCALE:
            params[l.name] = {"W": np.asarray(r.blobs[0], np.float32).reshape(-1)}
            if len(r.blobs) > 1:
                params[l.name]["b"] = np.asarray(r.blobs[1], np.float32).reshape(-1)
        elif l.type == LT.SELECT:
            pass  # indices are graph attrs, resolved below
    # resolve Filter/Select indices from blobs (fork stores the selection)
    new_graph = graph
    for l in graph.by_type(LT.SELECT):
        r = by_name.get(l.name)
        if r is not None and r.blobs:
            sel = np.asarray(r.blobs[0]).reshape(-1)
            idxs = np.where(sel > 0.5)[0] if set(np.unique(sel)) <= {0.0, 1.0} \
                else sel.astype(np.int64)
            new_graph = new_graph.replace_layer(
                l.name, l.with_attrs(indices=tuple(int(i) for i in idxs),
                                     num_output=int(len(idxs))))
    return new_graph, params


def _fetch_host(params: Mapping) -> Mapping:
    """One batched device->host fetch of every device-resident leaf.
    `jax.device_get` starts `copy_to_host_async()` on ALL leaves before
    converting any, so the transfers overlap on the link — a per-layer
    `np.asarray` would serialize them (fc6 alone is 410 MB on VGG-16)."""
    try:
        import jax
    except Exception:                                      # numpy-only caller
        return params
    if not any(isinstance(leaf, jax.Array)
               for leaf in jax.tree_util.tree_leaves(params)):
        return params
    return jax.device_get(params)


def save_weights(graph: Graph, params: Mapping[str, Mapping[str, np.ndarray]],
                 path: str | Path) -> None:
    params = _fetch_host(params)
    records: list[cm.CaffeLayerBlobs] = []
    for l in graph.layers:
        p = params.get(l.name)
        blobs: list[np.ndarray] = []
        if l.type in (LT.CONV, LT.FC) and p:
            blobs.append(np.asarray(p["W"], np.float32))
            if "b" in p:
                blobs.append(np.asarray(p["b"], np.float32))
        elif l.type == LT.BN and p:
            blobs = [np.asarray(p["mean"], np.float32),
                     np.asarray(p["var"], np.float32),
                     np.asarray(p.get("factor", 1.0), np.float32).reshape(1)]
        elif l.type == LT.SCALE and p:
            blobs = [np.asarray(p["W"], np.float32)]
            if "b" in p:
                blobs.append(np.asarray(p["b"], np.float32))
        elif l.type == LT.SELECT:
            idxs = l.attr("indices")
            if idxs:
                blobs = [np.asarray(idxs, np.float32)]
        if blobs:
            type_name = {LT.CONV: "Convolution", LT.FC: "InnerProduct",
                         LT.BN: "BatchNorm", LT.SCALE: "Scale",
                         LT.SELECT: "Filter"}[l.type]
            records.append(cm.CaffeLayerBlobs(name=l.name, type=type_name,
                                              blobs=blobs))
    cm.save_caffemodel(path, graph.name, records)


def import_model(prototxt_path: str | Path, caffemodel_path: str | Path | None = None,
                 batch: int | None = None) -> tuple[Graph, dict]:
    """One-call import: (Graph, params). The reference equivalent is
    `caffe.Net(pt, model, caffe.TEST)` (lib/net.py:62)."""
    g = import_prototxt_file(prototxt_path, batch=batch)
    if caffemodel_path:
        g, params = load_weights(g, caffemodel_path)
    else:
        params = {}
    return g, params


def export_model(graph: Graph, params: Mapping, prototxt_path: str | Path,
                 caffemodel_path: str | Path | None = None) -> None:
    Path(prototxt_path).write_text(export_prototxt(graph))
    if caffemodel_path is not None:
        save_weights(graph, params, caffemodel_path)


# ---------------------------------------------------------------------------
# solver export (parity with the reference's programmatic SolverParameter
# writer, lib/builder.py:15-117, and the shipped temp/solver.prototxt)
# ---------------------------------------------------------------------------

def export_solver(cfg, net_prototxt: str, snapshot_prefix: str = "snapshots/ft",
                  test_iter: int = 5000, test_interval: int = 10000,
                  display: int = 100) -> str:
    """Render a FinetuneConfig as a Caffe solver.prototxt so a stock-Caffe
    user can reproduce the finetune externally (temp/solver.prototxt:1-18)."""
    msg: pt.Msg = {
        "net": net_prototxt,
        "test_iter": test_iter,
        "test_interval": test_interval,
        "base_lr": cfg.base_lr,
        "lr_policy": cfg.lr_policy,
        "gamma": cfg.gamma,
        "stepsize": cfg.stepsize,
        "display": display,
        "max_iter": cfg.max_iter,
        "momentum": cfg.momentum,
        "weight_decay": cfg.weight_decay,
        "snapshot": cfg.snapshot_every,
        "snapshot_prefix": snapshot_prefix,
        "solver_mode": "GPU",
    }
    if getattr(cfg, "clip_gradients", 0.0):
        msg["clip_gradients"] = cfg.clip_gradients
    if cfg.nesterov:
        msg["type"] = "Nesterov"
    return pt.dump(msg) + "\n"
