"""Independent conformance evidence for the ONNX layer.

Two kinds of evidence that the emitter/interpreter pair is not a closed
loop of shared assumptions:

1. **Golden byte fixtures**: complete models hand-assembled below from the
   protobuf wire format and onnx.proto field numbers (transcribed from the
   public specs — protobuf.dev/programming-guides/encoding and
   github.com/onnx/onnx/onnx/onnx.proto), with the exact expected bytes
   pinned as hex literals. The builder must reproduce the hex literals
   byte-for-byte, the decoder must parse them, and the interpreter must
   execute them correctly. None of the assembly here imports protowire.py.

2. **Structural checker** (deployment/onnx/checker.py — its own wire
   decoder, zero emitter imports) must accept the goldens and every
   emitted model (wired into the exporters and tests/test_onnx.py), and
   must reject each deliberately-invalid model assembled below: SSA
   violations, topological-order violations, dangling inputs, truncated
   initializer payloads, missing opset imports, undefined graph outputs,
   and subgraph names that shadow outer scopes.

Reference culture equivalent: onnx.checker + onnxruntime validation in
/root/reference/deployment/exporters/acoustic_exporter.py:104-113.
"""

import numpy as np
import pytest

from diffsinger_tpu.deployment.onnx.builder import GraphBuilder, parse_model
from diffsinger_tpu.deployment.onnx.checker import OnnxCheckError, check_model
from diffsinger_tpu.deployment.onnx.interpreter import run_model

# ---------------------------------------------------------------------------
# Local wire-format helpers, written from the protobuf spec (NOT imported
# from protowire.py): tag = (field_number << 3) | wire_type; wire type 0 is
# varint, wire type 2 is length-delimited.
# ---------------------------------------------------------------------------


def _v(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def _tag(field: int, wire_type: int) -> bytes:
    return _v((field << 3) | wire_type)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _v(len(payload)) + payload


def _s(field: int, text: str) -> bytes:
    return _ld(field, text.encode())


def _vi(name: str, dims, elem_type: int = 1) -> bytes:
    """ValueInfoProto{name=1, type=2}; TypeProto{tensor_type=1};
    TypeProto.Tensor{elem_type=1, shape=2}; TensorShapeProto{dim=1};
    Dimension{dim_value=1}. elem_type 1 = FLOAT, 9 = BOOL."""
    shape = b"".join(_ld(1, _tag(1, 0) + _v(d)) for d in dims)
    tensor_type = _tag(1, 0) + _v(elem_type) + _ld(2, shape)
    return _s(1, name) + _ld(2, _ld(1, tensor_type))


def _node(op: str, inputs, outputs, attrs=()) -> bytes:
    """NodeProto{input=1, output=2, op_type=4, attribute=5}."""
    return (b"".join(_s(1, i) for i in inputs)
            + b"".join(_s(2, o) for o in outputs)
            + _s(4, op) + b"".join(_ld(5, a) for a in attrs))


def _graph_attr(name: str, graph: bytes) -> bytes:
    """AttributeProto{name=1, g=6, type=20}; AttributeType.GRAPH = 5."""
    return _s(1, name) + _ld(6, graph) + _tag(20, 0) + _v(5)


def _model(graph: bytes, with_opset: bool = True) -> bytes:
    """ModelProto{ir_version=1, producer_name=2, producer_version=3,
    graph=7, opset_import=8}; OperatorSetIdProto{domain=1, version=2}."""
    parts = _tag(1, 0) + _v(8) + _s(2, "diffsinger_tpu") + _s(3, "1.0") + _ld(7, graph)
    if with_opset:
        parts += _ld(8, _s(1, "") + _tag(2, 0) + _v(17))
    return parts


# ---------------------------------------------------------------------------
# Golden fixtures (expected bytes pinned as hex literals)
# ---------------------------------------------------------------------------

# z = Add(x, y), x/y/z float32[2]
GOLDEN_ADD_HEX = (
    "0808120e6469666673696e6765725f7470751a03312e303a460a0e0a01780a0179"
    "12017a22034164641201675a0f0a0178120a0a08080112040a0208025a0f0a0179"
    "120a0a08080112040a020802620f0a017a120a0a08080112040a02080242040a00"
    "1011"
)

# y = Mul(x, w), w = float32[2] initializer {1.5, -2.0} carried as raw_data
GOLDEN_MUL_HEX = (
    "0808120e6469666673696e6765725f7470751a03312e303a4a0a0e0a01780a0177"
    "12017922034d756c120267322a120a010210014201774a080000c03f000000c05a"
    "0f0a0178120a0a08080112040a020802620f0a0179120a0a08080112040a020802"
    "42040a001011"
)


def _assemble_add() -> bytes:
    node = _node("Add", ["x", "y"], ["z"])
    graph = (_ld(1, node) + _s(2, "g")
             + _ld(11, _vi("x", [2])) + _ld(11, _vi("y", [2]))
             + _ld(12, _vi("z", [2])))
    return _model(graph)


def _assemble_mul() -> bytes:
    # TensorProto{dims=1, data_type=2, name=8, raw_data=9}; FLOAT = 1
    w = np.array([1.5, -2.0], np.float32)
    tensor = _ld(1, _v(2)) + _tag(2, 0) + _v(1) + _s(8, "w") + _ld(9, w.tobytes())
    node = _node("Mul", ["x", "w"], ["y"])
    graph = (_ld(1, node) + _s(2, "g2") + _ld(5, tensor)
             + _ld(11, _vi("x", [2])) + _ld(12, _vi("y", [2])))
    return _model(graph)


def test_golden_add_roundtrip():
    golden = bytes.fromhex(GOLDEN_ADD_HEX)
    assert _assemble_add() == golden  # in-test derivation matches the literal

    g = parse_model(golden)  # repo decoder parses spec-derived bytes
    assert g.name == "g" and g.inputs == ["x", "y"] and g.outputs == ["z"]
    assert [n.op_type for n in g.nodes] == ["Add"]
    assert g.input_types["x"] == (np.dtype(np.float32), (2,))

    (z,) = run_model(golden, {"x": np.array([1, 2], np.float32),
                              "y": np.array([10, 20], np.float32)})
    np.testing.assert_array_equal(z, [11.0, 22.0])

    stats = check_model(golden)
    assert stats == {"nodes": 1, "initializers": 0, "opset": 17, "ir_version": 8}

    # the builder must reproduce the hand-assembled bytes exactly
    gb = GraphBuilder("g")
    gb.add_input("x", np.float32, (2,))
    gb.add_input("y", np.float32, (2,))
    gb.add_node("Add", ["x", "y"], outputs=["z"])
    gb.add_output("z", np.float32, (2,))
    assert gb.model_bytes() == golden


def test_golden_mul_initializer_roundtrip():
    golden = bytes.fromhex(GOLDEN_MUL_HEX)
    assert _assemble_mul() == golden

    g = parse_model(golden)
    assert g.inputs == ["x"]
    np.testing.assert_array_equal(g.initializers["w"], [1.5, -2.0])

    (y,) = run_model(golden, {"x": np.array([2, 3], np.float32)})
    np.testing.assert_array_equal(y, [3.0, -6.0])

    assert check_model(golden)["initializers"] == 1

    gb = GraphBuilder("g2")
    gb.add_input("x", np.float32, (2,))
    gb.add_initializer("w", np.array([1.5, -2.0], np.float32))
    gb.add_node("Mul", ["x", "w"], outputs=["y"])
    gb.add_output("y", np.float32, (2,))
    assert gb.model_bytes() == golden


# ---------------------------------------------------------------------------
# Deliberately-invalid models: the checker must reject every one
# ---------------------------------------------------------------------------


def _simple_graph(nodes, inputs=("x",), outputs=("z",), initializers=b""):
    graph = b"".join(_ld(1, n) for n in nodes) + _s(2, "bad") + initializers
    graph += b"".join(_ld(11, _vi(i, [2])) for i in inputs)
    graph += b"".join(_ld(12, _vi(o, [2])) for o in outputs)
    return _model(graph)


def test_checker_rejects_topological_violation():
    # b = Relu(a) listed BEFORE a = Neg(x): valid dataflow, invalid order
    m = _simple_graph([_node("Relu", ["a"], ["z"]), _node("Neg", ["x"], ["a"])])
    with pytest.raises(OnnxCheckError, match="topologically sorted"):
        check_model(m)


def test_checker_rejects_ssa_violation():
    # node output redefines the graph input name "x"
    m = _simple_graph([_node("Neg", ["x"], ["x"]), _node("Relu", ["x"], ["z"])])
    with pytest.raises(OnnxCheckError, match="SSA"):
        check_model(m)


def test_checker_rejects_dangling_input():
    m = _simple_graph([_node("Add", ["x", "ghost"], ["z"])])
    with pytest.raises(OnnxCheckError, match="ghost"):
        check_model(m)


def test_checker_rejects_truncated_raw_data():
    # dims say 2 float32 (8 bytes) but raw_data carries only 4 bytes
    tensor = _ld(1, _v(2)) + _tag(2, 0) + _v(1) + _s(8, "w") + _ld(9, b"\x00" * 4)
    m = _simple_graph([_node("Mul", ["x", "w"], ["z"])],
                      initializers=_ld(5, tensor))
    with pytest.raises(OnnxCheckError, match="raw_data"):
        check_model(m)


def test_checker_rejects_negative_dim():
    # dims = [-1]: wire-encoded as a 10-byte two's-complement varint; the
    # checker must report the sign, not a bogus astronomical size mismatch
    neg_one = _v((1 << 64) - 1)  # int64 -1 on the wire
    tensor = (_tag(1, 0) + neg_one + _tag(2, 0) + _v(1) + _s(8, "w")
              + _ld(9, b"\x00" * 4))
    m = _simple_graph([_node("Mul", ["x", "w"], ["z"])],
                      initializers=_ld(5, tensor))
    with pytest.raises(OnnxCheckError, match="negative dim -1"):
        check_model(m)


def test_checker_rejects_missing_opset():
    node = _node("Relu", ["x"], ["z"])
    graph = _ld(1, node) + _s(2, "g") + _ld(11, _vi("x", [2])) + _ld(12, _vi("z", [2]))
    with pytest.raises(OnnxCheckError, match="opset"):
        check_model(_model(graph, with_opset=False))


def test_checker_rejects_undefined_graph_output():
    m = _simple_graph([_node("Neg", ["x"], ["a"])], outputs=("never",))
    with pytest.raises(OnnxCheckError, match="never defined"):
        check_model(m)


def test_checker_rejects_subgraph_shadowing():
    # If-branch defines a value named "x", shadowing the outer graph input —
    # the ONNX IR spec requires SSA across the lexical scope chain
    branch = (_ld(1, _node("Neg", ["x"], ["x2"]))
              + _ld(1, _node("Identity", ["x2"], ["x"]))  # shadows outer "x"
              + _s(2, "then") + _ld(12, _vi("x", [2])))
    ok_branch = (_ld(1, _node("Identity", ["x"], ["eb"]))
                 + _s(2, "else") + _ld(12, _vi("eb", [2])))
    if_node = _node("If", ["c"], ["z"],
                    attrs=[_graph_attr("then_branch", branch),
                           _graph_attr("else_branch", ok_branch)])
    graph = (_ld(1, if_node) + _s(2, "g")
             + _ld(11, _vi("x", [2])) + _ld(11, _vi("c", [], elem_type=9))
             + _ld(12, _vi("z", [2])))
    with pytest.raises(OnnxCheckError, match="SSA"):
        check_model(_model(graph))


def test_checker_rejects_undocumented_op_with_known_ops():
    m = _simple_graph([_node("MysteryOp", ["x"], ["z"])])
    with pytest.raises(OnnxCheckError, match="MysteryOp"):
        check_model(m, known_ops=["Add", "Relu"])
    # and passes when the op is allowed
    check_model(_simple_graph([_node("Relu", ["x"], ["z"])]),
                known_ops=["Add", "Relu"])


def test_checker_rejects_garbage_bytes():
    with pytest.raises(OnnxCheckError):
        check_model(b"\xff\xff\xff\xff not a model")


def test_docs_onnx_ops_table_matches_emitter():
    """docs/onnx_ops.md is the audit surface for external reviewers: its
    op table must list exactly lowering.EMITTED_OPS."""
    import pathlib
    import re

    from diffsinger_tpu.deployment.onnx.lowering import EMITTED_OPS

    from diffsinger_tpu.deployment.onnx.checker import op_table_ops

    doc = (pathlib.Path(__file__).resolve().parents[1] / "docs" / "onnx_ops.md").read_text()
    rows = op_table_ops(doc)  # the CLI whitelist uses the same parser
    assert len(rows) == len(set(rows)), "duplicate rows in docs/onnx_ops.md"
    documented = set(rows)
    assert documented == set(EMITTED_OPS), (
        f"undocumented: {sorted(set(EMITTED_OPS) - documented)}; "
        f"stale doc rows: {sorted(documented - set(EMITTED_OPS))}")


def test_checker_cli(tmp_path, capsys):
    """`python -m ...onnx.checker model.onnx --ops docs/onnx_ops.md`:
    external-auditor entry point — validates files, enforces the emitted-op
    audit doc, non-zero exit on an invalid model."""
    import pathlib

    from diffsinger_tpu.deployment.onnx.checker import _main

    good = tmp_path / "good.onnx"
    good.write_bytes(bytes.fromhex(GOLDEN_ADD_HEX))
    ops_doc = pathlib.Path(__file__).resolve().parents[1] / "docs" / "onnx_ops.md"

    assert _main([str(good), "--ops", str(ops_doc)]) == 0
    out = capsys.readouterr().out
    assert "ok — 1 nodes" in out and "opset 17" in out

    bad = tmp_path / "bad.onnx"
    bad.write_bytes(b"\x08\x01")  # ir_version only: no opset, no graph
    assert _main([str(good), str(bad)]) == 1
    assert "INVALID" in capsys.readouterr().out


def test_checker_wraps_decoder_crashes_as_check_errors(tmp_path, capsys):
    """Corrupt wire data must surface as OnnxCheckError / CLI INVALID, not
    TypeError/UnicodeDecodeError tracebacks (the documented contract)."""
    from diffsinger_tpu.deployment.onnx.checker import _main

    # graph field (7) encoded as a varint instead of length-delimited:
    # _check_graph would call _group(int) -> TypeError before the wrap
    wrong_wire = b"\x08\x08" + b"\x42\x04\x08\x00\x10\x11" + b"\x38\x01"
    with pytest.raises(OnnxCheckError):
        check_model(wrong_wire)
    # node op_type with invalid utf-8
    with pytest.raises(OnnxCheckError):
        check_model(b"\x3a\x02\xff\xfe")

    bad = tmp_path / "bad.onnx"
    bad.write_bytes(wrong_wire)
    missing = tmp_path / "nope.onnx"
    assert _main([str(bad), str(missing)]) == 1
    out = capsys.readouterr().out
    assert "INVALID" in out and "unreadable" in out
