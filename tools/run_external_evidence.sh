#!/usr/bin/env bash
# One-command capture/verification of the two ENVIRONMENTAL debts that cannot
# execute in the build environment (no pip installs there). Run this on any
# machine with network access:
#
#     pip install pyworld numpy scipy onnxruntime
#     bash tools/run_external_evidence.sh
#
# It performs, in order:
#   1. pyworld golden capture  — writes tests/goldens/world_goldens.npz; the
#      20 skipped tests in tests/test_world_goldens.py then run and enforce
#      the documented tolerances (see that file's header for the bounds).
#   2. real-onnxruntime execution of the committed ONNX byte fixtures under
#      tests/fixtures/onnx_external (tolerances recorded inside the npz
#      files; documented in docs/onnx_ops.md "External verification").
#
# Exit code 0 iff both steps pass. Nothing to decide: tolerances are
# committed; this script only executes the already-packaged contracts.
# After step 1, commit the new tests/goldens/world_goldens.npz and re-run
#     python -m pytest tests/test_world_goldens.py -q
# in any environment to make the 20 skips permanent passes.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/2] pyworld golden capture (tests/goldens/world_goldens.npz) =="
if python -c "import pyworld" 2>/dev/null; then
    python tools/capture_world_goldens.py --out tests/goldens/world_goldens.npz
    echo "-- verifying captured goldens against the native implementations --"
    python -m pytest tests/test_world_goldens.py -q
else
    echo "SKIP: pyworld not installed (pip install pyworld)"; exit 1
fi

echo "== [2/2] ONNX fixtures under real onnxruntime =="
if python -c "import onnxruntime" 2>/dev/null; then
    python tools/verify_onnx_external.py --dir tests/fixtures/onnx_external
else
    echo "SKIP: onnxruntime not installed (pip install onnxruntime)"; exit 1
fi

echo "ALL EXTERNAL EVIDENCE PASSED"
