"""ONNX export round-trip (VERDICT r4 #7).

The environment has no onnx/onnxruntime (docs/ONNX.md records the failing
recipes), so conformance is established structurally — the ModelProto is
serialized through a protoc-generated faithful subset of the public ONNX
schema — and numerically: the artifact is parsed back from its bytes and
executed by an independent evaluator, compared against the JAX forward.
Reference behavior: scripts/main.py:259-264 (save_onnx + artifact upload).
"""

import numpy as np
import pytest

from scenenet_tpu.models import SceneNet
from scenenet_tpu.utils.onnx_export import export_scenenet_onnx, load_onnx


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=3)
    path = str(tmp_path_factory.mktemp("onnx") / "scenenet.onnx")
    blob = export_scenenet_onnx(net, params, (16, 16, 16), path)
    return net, params, path, blob


class TestOnnxExport:
    def test_numeric_roundtrip(self, exported):
        net, params, path, _ = exported
        rng = np.random.default_rng(0)
        x = (rng.random((2, 1, 16, 16, 16)) > 0.9).astype(np.float32)
        run = load_onnx(path)
        got = run(x)
        want = np.asarray(net.apply(params, x))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_model_structure(self, exported):
        from scenenet_tpu.compat import onnx_pb2 as O

        _, _, path, blob = exported
        with open(path, "rb") as f:
            assert f.read() == blob
        m = O.ModelProto.FromString(blob)
        assert m.ir_version == 8
        assert m.opset_import[0].version == 13
        ops = [n.op_type for n in m.graph.node]
        assert ops == ["Conv", "Tanh", "Relu"]
        w = m.graph.initializer[0]
        assert tuple(w.dims) == (1, 1, 9, 5, 5)
        assert w.data_type == O.TensorProto.FLOAT
        # symbolic batch dim survives
        dim0 = m.graph.input[0].type.tensor_type.shape.dim[0]
        assert dim0.dim_param == "N"
        # torch-SAME asymmetric pads: low=(k-1)//2, high=k//2
        conv = m.graph.node[0]
        pads = [list(a.ints) for a in conv.attribute if a.name == "pads"][0]
        assert pads == [4, 2, 2, 4, 2, 2]

    def test_trained_params_are_baked(self, tmp_path):
        """Two different param draws must export different weights."""
        net1, p1 = SceneNet.create(kernel_size=(9, 5, 5), seed=1)
        net2, p2 = SceneNet.create(kernel_size=(9, 5, 5), seed=2)
        b1 = export_scenenet_onnx(net1, p1, (8, 8, 8), str(tmp_path / "a.onnx"))
        b2 = export_scenenet_onnx(net2, p2, (8, 8, 8), str(tmp_path / "b.onnx"))
        assert b1 != b2

    def test_wire_format_tags(self, exported):
        """Spot-check the raw protobuf wire bytes against the OFFICIAL
        onnx.proto field numbers (independent of the generated bindings):
        the file must start with field 1 varint (ir_version=8) and carry a
        field-7 length-delimited GraphProto."""
        _, _, _, blob = exported
        # tag = (field << 3) | wire_type; ir_version: field 1, varint → 0x08
        assert blob[0] == 0x08 and blob[1] == 8
        # find graph tag: field 7, wire type 2 → 0x3A
        assert bytes([0x3A]) in blob
