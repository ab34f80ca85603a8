"""Artifact runtime: run exported StableHLO bundles without model code.

The reference's exported ONNX bundles are consumed by OpenUTAU; the
equivalent consumer here loads a ``dsconfig.yaml`` manifest written by the
exporters (exporters.py), picks the smallest exported shape bucket that fits
the input, pads, executes the deserialized artifact on any PJRT backend, and
trims the output. Only the manifest, the artifacts, and the checkpoint params
are needed — no hparams, no model classes.
"""

from __future__ import annotations

import pathlib
from typing import Dict, Optional, Tuple

import numpy as np
import yaml


def _pad_axis1(arr: np.ndarray, length: int, value=0):
    pad = length - arr.shape[1]
    if pad < 0:
        raise ValueError(f"input length {arr.shape[1]} exceeds bucket {length}")
    if pad == 0:
        return arr
    widths = [(0, 0), (0, pad)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, widths, constant_values=value)


def _check_stablehlo_flavor(manifest: dict):
    """These runtimes deserialize jax.export artifacts only; a bundle
    exported with --format onnx records flavor 'onnx' and must be served by
    an ONNX runtime instead — fail with a clear message, not a KeyError."""
    flavor = manifest.get("flavor", "stablehlo")
    if flavor not in ("stablehlo", "both"):
        raise ValueError(
            f"bundle flavor is {flavor!r}; the artifact runtimes load "
            "StableHLO bundles only — re-export with --format stablehlo "
            "(or 'both'), or serve the .onnx graphs with an ONNX runtime."
        )


class AcousticArtifactRuntime:
    """Serve an exported acoustic bundle: (tokens, mel2ph, f0) -> mel.

    :param bundle_dir: directory containing ``dsconfig.yaml`` and the
        ``*.stablehlo`` artifacts produced by DiffSingerAcousticExporter
    :param params: the model pytree the artifacts were exported with
        (artifacts close over the parameter *structure*, not the values)
    """

    def __init__(self, bundle_dir, params):
        from jax import export as jexport

        self.dir = pathlib.Path(bundle_dir)
        with open(self.dir / "dsconfig.yaml") as f:
            self.manifest = yaml.safe_load(f)
        _check_stablehlo_flavor(self.manifest)
        self.params = params
        self._loaded: Dict[str, object] = {}
        buckets = self.manifest.get("buckets") or {}
        if not buckets:
            raise ValueError("manifest has no bucket table; re-export with this framework")
        # [(t_txt, t_mel, files), ...] sorted by mel length then txt length
        self.buckets = sorted(
            (tuple(int(d) for d in key.split("x")) + (files,)
             for key, files in buckets.items()),
            key=lambda b: (b[1], b[0]),
        )
        self._jexport = jexport

    def _pick_bucket(self, t_txt: int, t_mel: int) -> Tuple[int, int, dict]:
        for bt, bm, files in self.buckets:
            if t_txt <= bt and t_mel <= bm:
                return bt, bm, files
        raise ValueError(
            f"no exported bucket fits (t_txt={t_txt}, t_mel={t_mel}); "
            f"available: {[(b[0], b[1]) for b in self.buckets]}"
        )

    def _artifact(self, filename: str):
        if filename not in self._loaded:
            path = self.dir / filename
            self._loaded[filename] = self._jexport.deserialize(path.read_bytes())
        return self._loaded[filename]

    def synthesize_mel(self, tokens: np.ndarray, mel2ph: np.ndarray, f0: np.ndarray,
                       seed: int = 0, depth: Optional[float] = None,
                       steps: Optional[int] = None,
                       gender: Optional[np.ndarray] = None,
                       velocity: Optional[np.ndarray] = None) -> np.ndarray:
        """tokens [1, T_txt] int32; mel2ph [1, T_mel] int32; f0 [1, T_mel]
        float32 -> mel [1, T_mel, M] float32 (trimmed to the input length).

        ``depth``/``steps`` are runtime inputs of the exported sampler
        (the reference's deployed ONNX contract) — defaulting to the
        manifest's ``max_depth`` and ``sampling_steps``. ``gender``/
        ``velocity`` curves [1, T_mel] feed models exported without
        --freeze_gender/--freeze_velocity (manifest use_key_shift_embed /
        use_speed_embed); neutral defaults otherwise."""
        import jax

        if depth is None:
            depth = float(self.manifest.get("max_depth", 1.0))
        if steps is None:
            steps = int(self.manifest.get("sampling_steps", 20))
        t_txt, t_mel = tokens.shape[1], mel2ph.shape[1]
        bt, bm, files = self._pick_bucket(t_txt, t_mel)
        exp = self._artifact(files["acoustic"])
        # the manifest records the ordered conditioning inputs appended to
        # the graph signature; this runtime can default gender/velocity
        # (neutral values exist) but not inputs whose neutral is undefined
        extras = []
        for name in self.manifest.get("extra_inputs", []):
            if name == "gender":
                g = np.zeros((1, t_mel), np.float32) if gender is None else \
                    np.asarray(gender, np.float32)
                extras.append(_pad_axis1(g, bm))
            elif name == "velocity":
                v = np.ones((1, t_mel), np.float32) if velocity is None else \
                    np.asarray(velocity, np.float32)
                extras.append(_pad_axis1(v, bm, value=1.0))
            else:
                raise NotImplementedError(
                    f"bundle expects a '{name}' input this runtime cannot "
                    "default; drive the artifact directly via jax.export")
        out = exp.call(
            self.params,
            jax.random.PRNGKey(seed),
            _pad_axis1(np.asarray(tokens, np.int32), bt),
            _pad_axis1(np.asarray(mel2ph, np.int32), bm),
            _pad_axis1(np.asarray(f0, np.float32), bm, value=220.0),
            np.float32(depth),
            np.int32(steps),
            *extras,
        )
        return np.asarray(out)[:, :t_mel]


class VocoderArtifactRuntime:
    """Serve an exported vocoder bundle: (mel, f0) -> waveform."""

    def __init__(self, bundle_dir, params):
        from jax import export as jexport

        self.dir = pathlib.Path(bundle_dir)
        with open(self.dir / "vocoder.yaml") as f:
            self.manifest = yaml.safe_load(f)
        _check_stablehlo_flavor(self.manifest)
        self.params = params
        self.hop_size = int(self.manifest["hop_size"])
        self._loaded: Dict[str, object] = {}
        buckets = self.manifest.get("buckets") or {"512": self.manifest["model"]}
        # bucket values are {"model": file, ...} dicts (legacy: bare filename)
        self.buckets = sorted(
            (int(k), v["model"] if isinstance(v, dict) else v)
            for k, v in buckets.items())
        self._jexport = jexport

    def vocode(self, mel: np.ndarray, f0: np.ndarray) -> np.ndarray:
        """mel [1, T, M], f0 [1, T] -> waveform [1, T * hop_size]."""
        t_mel = mel.shape[1]
        for bm, filename in self.buckets:
            if t_mel <= bm:
                break
        else:
            raise ValueError(f"no exported vocoder bucket fits T={t_mel}")
        if filename not in self._loaded:
            self._loaded[filename] = self._jexport.deserialize(
                (self.dir / filename).read_bytes()
            )
        wav = self._loaded[filename].call(
            self.params,
            _pad_axis1(np.asarray(mel, np.float32), bm),
            _pad_axis1(np.asarray(f0, np.float32), bm, value=220.0),
        )
        return np.asarray(wav)[:, : t_mel * self.hop_size]
