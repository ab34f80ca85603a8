"""Self-contained ONNX emission (no onnx package required).

- protowire: raw protobuf wire-format codec
- builder: ONNX ModelProto/GraphProto construction + parsing
- lowering: jaxpr -> ONNX graph conversion
- interpreter: numpy evaluator used to validate emitted models
"""

from .lowering import LoweringError, export_onnx, lower  # noqa: F401
from .interpreter import run_model  # noqa: F401
