"""ONNX export for SceneNet (reference parity: ``scripts/main.py:259-264``
exports the trained model to ONNX and uploads it as a wandb artifact).

The environment ships neither ``onnx`` nor ``onnxscript``/``tf2onnx`` nor
``onnxruntime`` (zero egress — both torch exporters refuse:
``torch.onnx.export(dynamo=False)`` → "Module onnx is not installed",
``dynamo=True`` → missing ``onnxscript``). So the ModelProto is built
directly against a protoc-generated faithful subset of the public ONNX
schema (``compat/onnx.proto`` — same message/field numbers as
``onnx/onnx.proto``, hence byte-valid for any conformant consumer) and
verified numerically by :func:`load_onnx`, an independent evaluator that
parses the serialized file back and executes the graph with numpy/XLA
ops. See ``docs/ONNX.md`` for the toolchain receipt.

The exported graph is the inference contract of the trained net: the
GENEO kernels are synthesized from the trained scalars, combined with
the effective convex coefficients (exact by linearity — the same fusion
``SceneNet.apply`` performs), and baked as a single Conv initializer:

    x (N,1,Z,X,Y) → Conv(w=(1,1,k_z,k_x,k_y), pads=torch-SAME) → Tanh
      → Relu → y

Opset 13; batch dim is symbolic ("N").
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import numpy as np

from scenenet_tpu.compat import onnx_pb2 as O

_IR_VERSION = 8
_OPSET = 13


def _tensor(name: str, arr: np.ndarray) -> O.TensorProto:
    t = O.TensorProto(name=name, data_type=O.TensorProto.FLOAT)
    t.dims.extend(arr.shape)
    t.raw_data = np.ascontiguousarray(arr, dtype="<f4").tobytes()
    return t


def _value_info(name: str, shape) -> O.ValueInfoProto:
    vi = O.ValueInfoProto(name=name)
    vi.type.tensor_type.elem_type = O.TensorProto.FLOAT
    for d in shape:
        dim = vi.type.tensor_type.shape.dim.add()
        if isinstance(d, str):
            dim.dim_param = d
        else:
            dim.dim_value = int(d)
    return vi


def export_scenenet_onnx(model: Any, params: Any,
                         input_shape: Tuple[int, int, int],
                         path: str) -> bytes:
    """Serialize the trained SceneNet forward to ``path`` as ONNX.

    ``input_shape`` is the spatial (Z, X, Y); batch is symbolic. Returns
    the serialized bytes (also written to ``path``).
    """
    kernels = np.asarray(model.synthesize_kernels(params), np.float32)
    lams = np.asarray(model.effective_lambdas(params), np.float32)
    combined = np.einsum("g,gzxy->zxy", lams, kernels).astype(np.float32)
    k_z, k_x, k_y = combined.shape

    g = O.GraphProto(name="scenenet_forward")
    g.initializer.append(_tensor("w", combined[None, None]))
    g.input.append(_value_info("x", ("N", 1, *input_shape)))
    g.output.append(_value_info("y", ("N", 1, *input_shape)))

    conv = g.node.add(op_type="Conv", name="conv", input=["x", "w"],
                      output=["c"])
    a = conv.attribute.add(name="kernel_shape", type=O.AttributeProto.INTS)
    a.ints.extend([k_z, k_x, k_y])
    a = conv.attribute.add(name="pads", type=O.AttributeProto.INTS)
    # ONNX pads = [begin_z, begin_x, begin_y, end_z, end_x, end_y]; the
    # torch asymmetric SAME rule (low=(k-1)//2, high=k//2) matches
    # ops/conv3d.conv3d_same
    a.ints.extend([(k_z - 1) // 2, (k_x - 1) // 2, (k_y - 1) // 2,
                   k_z // 2, k_x // 2, k_y // 2])
    a = conv.attribute.add(name="strides", type=O.AttributeProto.INTS)
    a.ints.extend([1, 1, 1])
    a = conv.attribute.add(name="group", type=O.AttributeProto.INT)
    a.i = 1
    g.node.add(op_type="Tanh", name="tanh", input=["c"], output=["t"])
    g.node.add(op_type="Relu", name="relu", input=["t"], output=["y"])

    m = O.ModelProto(ir_version=_IR_VERSION, producer_name="scenenet_tpu",
                     producer_version="1.0",
                     doc_string="SceneNet fused GENEO forward "
                                "(kernels synthesized from trained scalars)")
    m.opset_import.add(domain="", version=_OPSET)
    m.graph.CopyFrom(g)
    blob = m.SerializeToString()
    with open(path, "wb") as f:
        f.write(blob)
    return blob


def load_onnx(path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Parse ``path`` back through the protobuf schema and return a
    callable evaluating the graph with numpy/XLA ops — the numeric
    round-trip check for the exported artifact (the env has no
    onnxruntime; this evaluator covers the exporter's op set:
    Conv / Tanh / Relu / Add / Mul)."""
    with open(path, "rb") as f:
        m = O.ModelProto.FromString(f.read())
    graph = m.graph
    inits = {}
    for t in graph.initializer:
        if t.data_type != O.TensorProto.FLOAT:
            raise NotImplementedError(f"initializer dtype {t.data_type}")
        if t.raw_data:
            arr = np.frombuffer(t.raw_data, "<f4")
        else:
            arr = np.asarray(t.float_data, np.float32)
        inits[t.name] = arr.reshape(tuple(t.dims))

    nodes = list(graph.node)
    in_name = graph.input[0].name
    out_name = graph.output[0].name

    def run(x: np.ndarray) -> np.ndarray:
        from jax import lax
        import jax.numpy as jnp

        env = dict(inits)
        env[in_name] = np.asarray(x, np.float32)
        for n in nodes:
            if n.op_type == "Conv":
                attrs = {a.name: list(a.ints) if a.ints else a.i
                         for a in n.attribute}
                pads = attrs["pads"]
                sp = len(pads) // 2
                pad_cfg = [(int(pads[i]), int(pads[i + sp]))
                           for i in range(sp)]
                out = lax.conv_general_dilated(
                    jnp.asarray(env[n.input[0]]),
                    jnp.asarray(env[n.input[1]]),
                    window_strides=attrs.get("strides", [1] * sp),
                    padding=pad_cfg,
                    dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
                    preferred_element_type=jnp.float32)
                env[n.output[0]] = np.asarray(out)
            elif n.op_type == "Tanh":
                env[n.output[0]] = np.tanh(env[n.input[0]])
            elif n.op_type == "Relu":
                env[n.output[0]] = np.maximum(env[n.input[0]], 0.0)
            elif n.op_type == "Add":
                env[n.output[0]] = env[n.input[0]] + env[n.input[1]]
            elif n.op_type == "Mul":
                env[n.output[0]] = env[n.input[0]] * env[n.input[1]]
            else:
                raise NotImplementedError(f"op {n.op_type}")
        return env[out_name]

    return run
