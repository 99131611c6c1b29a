"""PlannerNet ↔ ONNX interchange: export flax checkpoints as real .onnx
artifacts and execute .onnx graphs in numpy.

The reference's deployment path is ONNX — nn_trainer.py:275-284 exports the
trained net and NNPlanner runs the file through onnxruntime at the flat
(1, W*H+24) → (1, 9) contract (nn_planner.py:87-111). Round 2 replaced the
artifact with jax.export, which meant the reference's own NNPlanner could
not consume a net trained here. This module closes the interchange: the
exported file is a standard opset-13 ONNX model (Slice/Reshape/Conv/
BatchNormalization/MaxPool/GlobalAveragePool/Gemm/LeakyRelu/Concat/Add)
with the exact reference I/O contract, serialized by io/onnx_proto (no onnx
package exists in this environment). `run_onnx` is a numpy executor for the
same op subset — the round-trip test (tests/test_onnx_interop.py) proves
the artifact is a faithful, executable model, not just a file.

Supported: backbone ∈ {smallconv, resnet18}, fusion_arch='mlp' (the
reference's deployed architecture, nn_trainer.py:109-155).
"""

from __future__ import annotations

import numpy as np

from neoplanner_tpu.config import NetParams
from neoplanner_tpu.io import onnx_proto as op

_BN_EPS = 1e-5   # flax nn.BatchNorm default (matches torchvision)


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

class _Builder:
    def __init__(self):
        self.nodes = []
        self.inits = []
        self._n = 0

    def uniq(self, base):
        self._n += 1
        return f"{base}_{self._n}"

    def init_tensor(self, base, array):
        name = self.uniq(base)
        self.inits.append(op.tensor(name, np.asarray(array)))
        return name

    def add(self, op_type, inputs, outputs=None, attrs=()):
        if outputs is None:
            outputs = [self.uniq(op_type.lower())]
        self.nodes.append(op.node(op_type, inputs, outputs, attrs=list(attrs)))
        return outputs[0]

    def gemm(self, x, kernel, bias, out=None):
        b = self.init_tensor("W", np.asarray(kernel, np.float32))
        c = self.init_tensor("b", np.asarray(bias, np.float32))
        return self.add("Gemm", [x, b, c], [out] if out else None)

    def conv(self, x, kernel_hwio, bias, strides, pads):
        """kernel (kh, kw, cin, cout) flax HWIO -> ONNX OIHW."""
        w = np.transpose(np.asarray(kernel_hwio, np.float32), (3, 2, 0, 1))
        inputs = [x, self.init_tensor("convW", w)]
        if bias is not None:
            inputs.append(self.init_tensor("convB",
                                           np.asarray(bias, np.float32)))
        kh, kw = w.shape[2], w.shape[3]
        return self.add("Conv", inputs, attrs=[
            op.attr_ints("kernel_shape", (kh, kw)),
            op.attr_ints("strides", strides),
            op.attr_ints("pads", pads),
        ])

    def batchnorm(self, x, bn_params, bn_stats):
        ins = [x,
               self.init_tensor("bnS", np.asarray(bn_params["scale"],
                                                  np.float32)),
               self.init_tensor("bnB", np.asarray(bn_params["bias"],
                                                  np.float32)),
               self.init_tensor("bnM", np.asarray(bn_stats["mean"],
                                                  np.float32)),
               self.init_tensor("bnV", np.asarray(bn_stats["var"],
                                                  np.float32))]
        return self.add("BatchNormalization", ins,
                        attrs=[op.attr_f("epsilon", _BN_EPS)])

    def slice(self, x, starts, ends, axes):
        return self.add("Slice", [
            x,
            self.init_tensor("starts", np.asarray(starts, np.int64)),
            self.init_tensor("ends", np.asarray(ends, np.int64)),
            self.init_tensor("axes", np.asarray(axes, np.int64)),
        ])

    def reshape(self, x, shape):
        return self.add("Reshape", [
            x, self.init_tensor("shape", np.asarray(shape, np.int64))])


def _same_pads(n, k, s):
    """TF/flax 'SAME' padding for one spatial dim -> (before, after)."""
    out = -(-n // s)
    total = max((out - 1) * s + k - n, 0)
    return total // 2, total - total // 2, out


def _smallconv(b: _Builder, params, x, h, w):
    for i in range(4):
        p = params[f"Conv_{i}"]
        pt, pb, h = _same_pads(h, 3, 2)
        pl_, pr, w = _same_pads(w, 3, 2)
        x = b.conv(x, p["kernel"], p["bias"], (2, 2), (pt, pl_, pb, pr))
        x = b.add("Relu", [x])
    x = b.add("GlobalAveragePool", [x])
    x = b.add("Flatten", [x], attrs=[op.attr_i("axis", 1)])
    d = params["Dense_0"]
    return b.gemm(x, d["kernel"], d["bias"])


def _resnet18(b: _Builder, params, stats, x):
    x = b.conv(x, params["Conv_0"]["kernel"], None, (2, 2), (3, 3, 3, 3))
    x = b.batchnorm(x, params["BatchNorm_0"], stats["BatchNorm_0"])
    x = b.add("Relu", [x])
    x = b.add("MaxPool", [x], attrs=[
        op.attr_ints("kernel_shape", (3, 3)),
        op.attr_ints("strides", (2, 2)),
        op.attr_ints("pads", (1, 1, 1, 1)),
    ])
    stage_sizes = (2, 2, 2, 2)
    blk = 0
    for i, count in enumerate(stage_sizes):
        for j in range(count):
            stride = 2 if i > 0 and j == 0 else 1
            bp = params[f"BasicBlock_{blk}"]
            bs = stats[f"BasicBlock_{blk}"]
            res = x
            y = b.conv(x, bp["Conv_0"]["kernel"], None, (stride, stride),
                       (1, 1, 1, 1))
            y = b.batchnorm(y, bp["BatchNorm_0"], bs["BatchNorm_0"])
            y = b.add("Relu", [y])
            y = b.conv(y, bp["Conv_1"]["kernel"], None, (1, 1), (1, 1, 1, 1))
            y = b.batchnorm(y, bp["BatchNorm_1"], bs["BatchNorm_1"])
            if "Conv_2" in bp:   # downsample path (shape change)
                res = b.conv(res, bp["Conv_2"]["kernel"], None,
                             (stride, stride), (0, 0, 0, 0))
                res = b.batchnorm(res, bp["BatchNorm_2"], bs["BatchNorm_2"])
            y = b.add("Add", [y, res])
            x = b.add("Relu", [y])
            blk += 1
    x = b.add("GlobalAveragePool", [x])
    x = b.add("Flatten", [x], attrs=[op.attr_i("axis", 1)])
    d = params["Dense_0"]
    return b.gemm(x, d["kernel"], d["bias"])


def export_planner_net(variables, np_cfg: NetParams, path: str) -> str:
    """Serialize a flax PlannerNet checkpoint as a reference-contract .onnx
    model (flat (1, W*H+24) float32 in, (1, 9) out)."""
    if np_cfg.fusion_arch != "mlp":
        raise NotImplementedError(
            "ONNX export covers the reference's deployed architecture "
            "(fusion_arch='mlp', nn_trainer.py:109-155)")
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    n_img = np_cfg.img_width * np_cfg.img_height
    b = _Builder()

    img_flat = b.slice("input", [0], [n_img], [1])
    motion = b.slice("input", [n_img], [n_img + np_cfg.motion_input_size],
                     [1])
    # (1, H*W) -> (1, 1, H, W): flax sees (B, H, W, 1); with a single channel
    # the NCHW reshape preserves element order exactly
    img = b.reshape(img_flat, (1, 1, np_cfg.img_height, np_cfg.img_width))

    if np_cfg.backbone == "smallconv":
        img_feat = _smallconv(b, params["img_backbone"], img,
                              np_cfg.img_height, np_cfg.img_width)
    elif np_cfg.backbone == "resnet18":
        img_feat = _resnet18(b, params["img_backbone"],
                             stats["img_backbone"], img)
    else:
        raise NotImplementedError(np_cfg.backbone)

    x = motion
    for i in range(4):
        p = params[f"motion_backbone_{i}"]
        x = b.gemm(x, p["kernel"], p["bias"])
        if i < 3:
            x = b.add("LeakyRelu", [x], attrs=[op.attr_f("alpha", 0.01)])
    fused = b.add("Concat", [img_feat, x], attrs=[op.attr_i("axis", 1)])
    y = fused
    for i in range(4):
        p = params[f"mlp_{i}"]
        y = b.gemm(y, p["kernel"], p["bias"],
                   out="output" if i == 3 else None)
        if i < 3:
            y = b.add("LeakyRelu", [y], attrs=[op.attr_f("alpha", 0.01)])

    g = op.graph(b.nodes, "planner_net", b.inits,
                 [op.value_info("input", (1, n_img
                                          + np_cfg.motion_input_size))],
                 [op.value_info("output", (1, np_cfg.output_size))])
    blob = op.model(g)
    with open(path, "wb") as f:
        f.write(blob)
    return path


# ---------------------------------------------------------------------------
# numpy executor
# ---------------------------------------------------------------------------

def _np_conv(x, w, bias, strides, pads):
    """x (1, C, H, W), w (O, C, kh, kw) -> (1, O, oh, ow)."""
    sh, sw = strides
    pt, pl_, pb, pr = pads
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl_, pr)))
    _, c, hp, wp = xp.shape
    o, _, kh, kw = w.shape
    oh = (hp - kh) // sh + 1
    ow = (wp - kw) // sw + 1
    out = np.zeros((1, o, oh, ow), np.float32)
    wf = w.reshape(o, -1)                             # (O, C*kh*kw)
    for yy in range(oh):
        rows = xp[0, :, yy * sh:yy * sh + kh, :]       # (C, kh, wp)
        patch = np.stack([rows[:, :, xx * sw:xx * sw + kw]
                          for xx in range(ow)])        # (ow, C, kh, kw)
        out[0, :, yy, :] = wf @ patch.reshape(ow, -1).T
    if bias is not None:
        out += bias[None, :, None, None]
    return out


def _np_maxpool(x, k, strides, pads):
    sh, sw = strides
    pt, pl_, pb, pr = pads
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl_, pr)),
                constant_values=-np.inf)
    _, c, hp, wp = xp.shape
    kh, kw = k
    oh = (hp - kh) // sh + 1
    ow = (wp - kw) // sw + 1
    out = np.full((1, c, oh, ow), -np.inf, np.float32)
    for dy in range(kh):
        for dx in range(kw):
            out = np.maximum(
                out, xp[:, :, dy:dy + oh * sh:sh, dx:dx + ow * sw:sw])
    return out


def run_onnx(path_or_bytes, feed: dict) -> dict:
    """Execute a model exported by export_planner_net. feed maps graph input
    names to numpy arrays; returns {output_name: array}."""
    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    m = op.parse_model(blob)
    vals = dict(m["initializers"])
    for k, v in feed.items():
        vals[k] = np.asarray(v, np.float32)

    for n in m["nodes"]:
        a = n["attrs"]
        x = [vals[i] for i in n["inputs"]]
        t = n["op"]
        if t == "Slice":
            starts, ends, axes = (x[1].astype(int), x[2].astype(int),
                                  x[3].astype(int))
            sl = [slice(None)] * x[0].ndim
            for s0, e0, ax in zip(starts, ends, axes):
                sl[ax] = slice(int(s0), int(e0))
            out = x[0][tuple(sl)]
        elif t == "Reshape":
            out = x[0].reshape([int(d) for d in x[1]])
        elif t == "Conv":
            bias = x[2] if len(x) > 2 else None
            out = _np_conv(x[0], x[1], bias, a["strides"], a["pads"])
        elif t == "BatchNormalization":
            scale, b_, mean, var = x[1], x[2], x[3], x[4]
            eps = a.get("epsilon", _BN_EPS)
            out = (x[0] - mean[None, :, None, None]) / np.sqrt(
                var[None, :, None, None] + eps) \
                * scale[None, :, None, None] + b_[None, :, None, None]
        elif t == "Relu":
            out = np.maximum(x[0], 0.0)
        elif t == "LeakyRelu":
            alpha = a.get("alpha", 0.01)
            out = np.where(x[0] > 0, x[0], alpha * x[0])
        elif t == "MaxPool":
            out = _np_maxpool(x[0], a["kernel_shape"], a["strides"],
                              a["pads"])
        elif t == "GlobalAveragePool":
            out = x[0].mean(axis=(2, 3), keepdims=True)
        elif t == "Flatten":
            out = x[0].reshape(x[0].shape[0], -1)
        elif t == "Gemm":
            out = x[0] @ x[1] + x[2]
        elif t == "Concat":
            out = np.concatenate(x, axis=a.get("axis", 1))
        elif t == "Add":
            out = x[0] + x[1]
        else:
            raise NotImplementedError(f"op {t}")
        vals[n["outputs"][0]] = out.astype(np.float32)

    return {name: vals[name] for name in m["outputs"]}
