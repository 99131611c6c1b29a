"""ONNX round-trip: exported flax PlannerNet == numpy execution of the
.onnx file (the reference's model-interchange contract, nn_planner.py:87-111)."""

import numpy as np
import jax
import jax.numpy as jnp

from neoplanner_tpu.config import NetParams
from neoplanner_tpu.learn import onnx_interop
from neoplanner_tpu.models import planner_net


def _roundtrip(cfg, tmp_path, atol):
    net = planner_net.create(cfg)
    variables = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.img_height, cfg.img_width, 1)), jnp.zeros((1, 24)))
    n_img = cfg.img_width * cfg.img_height
    flat = jax.random.uniform(jax.random.PRNGKey(1), (1, n_img + 24),
                              minval=0.0, maxval=255.0)
    flat = flat.at[0, n_img:].set(
        jax.random.normal(jax.random.PRNGKey(2), (24,)))

    want = np.asarray(net.apply(variables, flat, train=False,
                                method=planner_net.PlannerNet.apply_flat))

    path = str(tmp_path / "planner_net.onnx")
    onnx_interop.export_planner_net(variables, cfg, path)
    got = onnx_interop.run_onnx(path, {"input": np.asarray(flat)})["output"]

    assert got.shape == (1, cfg.output_size)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def test_roundtrip_smallconv(tmp_path):
    cfg = NetParams(img_width=32, img_height=24, backbone="smallconv")
    _roundtrip(cfg, tmp_path, atol=1e-4)


def test_roundtrip_resnet18(tmp_path):
    cfg = NetParams(img_width=64, img_height=48, backbone="resnet18")
    _roundtrip(cfg, tmp_path, atol=1e-3)


def test_proto_parse_inverts_build():
    """The wire-level reader inverts the writer on a nontrivial graph."""
    from neoplanner_tpu.io import onnx_proto as op

    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    n1 = op.node("Gemm", ["x", "W", "b"], ["y"],
                 attrs=[op.attr_f("alpha", 1.0)])
    n2 = op.node("Relu", ["y"], ["out"])
    g = op.graph([n1, n2], "g", [op.tensor("W", w)],
                 [op.value_info("x", (1, 3))], [op.value_info("out", (1, 4))])
    m = op.parse_model(op.model(g, opset=13))
    assert m["opset"] == 13
    assert [n["op"] for n in m["nodes"]] == ["Gemm", "Relu"]
    assert m["nodes"][0]["attrs"]["alpha"] == 1.0
    assert m["inputs"] == ["x"] and m["outputs"] == ["out"]
    np.testing.assert_array_equal(m["initializers"]["W"], w)
