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
        import jax
        from jax import export as jexport

        self.dir = pathlib.Path(bundle_dir)
        with open(self.dir / "dsconfig.yaml") as f:
            self.manifest = yaml.safe_load(f)
        _check_stablehlo_flavor(self.manifest)
        # commit once: a host-numpy checkpoint pytree would otherwise be
        # re-uploaded on every artifact call (seconds per dispatch on
        # remote-TPU runtimes)
        self.params = jax.device_put(params)
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


class VarianceArtifactRuntime:
    """Serve an exported variance bundle through the deployed contract:
    linguistic (tokens -> encoder_out + dur), pitch, and variance views
    (reference deployment/modules/toplevel.py:201-302). The sampling views
    take the linguistic view's ``encoder_out`` plus the deployed inputs
    (frame durations, note sequence, current pitch/curves, retake mask,
    optional expr) with in-graph alignment and base-pitch smoothing."""

    def __init__(self, bundle_dir, params):
        import jax
        from jax import export as jexport

        self.dir = pathlib.Path(bundle_dir)
        with open(self.dir / "dsconfig.yaml") as f:
            self.manifest = yaml.safe_load(f)
        _check_stablehlo_flavor(self.manifest)
        if "linguistic" not in self.manifest:
            raise ValueError("not a variance bundle: manifest has no 'linguistic'")
        # commit once — see AcousticArtifactRuntime.__init__
        self.params = jax.device_put(params)
        self._loaded: Dict[str, object] = {}
        buckets = self.manifest.get("buckets") or {}
        if not buckets:
            raise ValueError("manifest has no bucket table; re-export with this framework")
        self.buckets = sorted(
            (tuple(int(d) for d in key.split("x")) + (files,)
             for key, files in buckets.items()),
            key=lambda b: (b[1], b[0]),
        )
        self.inputs = self.manifest.get("inputs") or {}
        self._jexport = jexport

    def _pick_bucket(self, t_ph: int, t_mel: int) -> Tuple[int, int, dict]:
        for bp, bm, files in self.buckets:
            if t_ph <= bp and t_mel <= bm:
                return bp, bm, files
        raise ValueError(
            f"no exported bucket fits (t_ph={t_ph}, t_mel={t_mel}); "
            f"available: {[(b[0], b[1]) for b in self.buckets]}"
        )

    def _artifact(self, filename: str):
        if filename not in self._loaded:
            self._loaded[filename] = self._jexport.deserialize(
                (self.dir / filename).read_bytes())
        return self._loaded[filename]

    def _collect(self, view: str, provided: dict, bp: int, bm: int):
        """Assemble the view's positional inputs from the manifest's ordered
        name list, padding to the bucket and defaulting what has a neutral
        value (retake=all, expr=1, note_rest/glide=0)."""
        hidden = int(self.manifest["hidden_size"])
        pads = {  # name -> (bucket length, pad value, dtype)
            "tokens": (bp, 0, np.int32), "midi": (bp, 0, np.int32),
            "ph2word": (bp, 0, np.int32), "word_dur": (bp, 0, np.float32),
            "languages": (bp, 0, np.int32),
            "encoder_out": (bp, 0, np.float32), "ph_dur": (bp, 0, np.int32),
            "note_midi": (bp, 0, np.float32), "note_rest": (bp, True, bool),
            "note_dur": (bp, 0, np.int32), "note_glide": (bp, 0, np.int32),
            "pitch": (bm, 0, np.float32), "expr": (bm, 1.0, np.float32),
            "retake": (bm, True, bool),
            "ph_spk_embed": (bp, 0, np.float32), "spk_embed": (bm, 0, np.float32),
        }
        args = []
        for name in self.inputs[view]:
            if name == "steps":
                continue  # appended by the caller
            val = provided.get(name)
            if val is None:
                t_mel = provided["pitch"].shape[1] if "pitch" in provided else bm
                if name == "retake":
                    shape = ((1, t_mel) if view == "pitch"
                             else (1, t_mel, self._n_variances()))
                    val = np.ones(shape, bool)
                elif name == "expr":
                    val = np.ones((1, t_mel), np.float32)
                elif name == "note_rest":
                    val = np.zeros((1, provided["note_midi"].shape[1]), bool)
                elif name == "note_glide":
                    val = np.zeros((1, provided["note_midi"].shape[1]), np.int32)
                elif name in [v for v in ("energy", "breathiness", "voicing", "tension")]:
                    val = np.zeros((1, t_mel), np.float32)
                else:
                    raise ValueError(
                        f"view '{view}' requires input '{name}' (no neutral default)")
            length, fill, dtype = pads.get(name, (bm, 0, np.float32))
            if name in ("spk_embed", "ph_spk_embed"):
                val = np.asarray(val, np.float32)
                if val.ndim == 1:
                    val = val[None, None, :]
                assert val.shape[-1] == hidden
                if val.shape[1] > 1:
                    val = _pad_axis1(val, length)
                args.append(val)
                continue
            args.append(_pad_axis1(np.asarray(val, dtype), length, value=fill))
        return args

    def _n_variances(self) -> int:
        return sum(bool(self.manifest.get(f"predict_{v}", False))
                   for v in ("energy", "breathiness", "voicing", "tension"))

    def variance_names(self):
        return [v for v in ("energy", "breathiness", "voicing", "tension")
                if self.manifest.get(f"predict_{v}", False)]

    def encode(self, tokens: np.ndarray, midi: np.ndarray, ph2word: np.ndarray,
               word_dur: np.ndarray, t_mel: int, **extra):
        """-> (encoder_out [1, bp, H] at bucket size, ph_dur_pred [1, T_ph],
        (bp, bm, files)). encoder_out stays bucket-padded so the sampling
        views can consume it directly."""
        t_ph = tokens.shape[1]
        bp, bm, files = self._pick_bucket(t_ph, t_mel)
        exp = self._artifact(files["linguistic"])
        args = self._collect("linguistic", dict(
            tokens=tokens, midi=midi, ph2word=ph2word, word_dur=word_dur,
            **extra), bp, bm)
        enc, dur = exp.call(self.params, *args)
        return np.asarray(enc), np.asarray(dur)[:, :t_ph], (bp, bm, files)

    def predict_pitch(self, encoder_out: np.ndarray, ph_dur: np.ndarray,
                      note_midi: np.ndarray, note_dur: np.ndarray,
                      pitch: np.ndarray, bucket, seed: int = 0,
                      steps: Optional[int] = None, **extra) -> np.ndarray:
        """-> absolute pitch curve [1, T_mel] (midi). ``bucket`` is the tuple
        returned by :meth:`encode`; retake defaults to all-frames."""
        import jax

        bp, bm, files = bucket
        if steps is None:
            steps = int(self.manifest.get("sampling_steps", 20))
        t_mel = pitch.shape[1]
        exp = self._artifact(files["pitch"])
        args = self._collect("pitch", dict(
            encoder_out=encoder_out, ph_dur=ph_dur, note_midi=note_midi,
            note_dur=note_dur, pitch=pitch, **extra), bp, bm)
        out = exp.call(self.params, jax.random.PRNGKey(seed), *args,
                       np.int32(steps))
        return np.asarray(out)[:, :t_mel]

    def predict_variances(self, encoder_out: np.ndarray, ph_dur: np.ndarray,
                          pitch: np.ndarray, bucket, seed: int = 0,
                          steps: Optional[int] = None, **extra) -> dict:
        """-> {variance name: curve [1, T_mel]}. Input curves + a [1, T, F]
        retake mask may be passed via kwargs; defaults regenerate all."""
        import jax

        bp, bm, files = bucket
        if steps is None:
            steps = int(self.manifest.get("sampling_steps", 20))
        t_mel = pitch.shape[1]
        exp = self._artifact(files["variance"])
        args = self._collect("variance", dict(
            encoder_out=encoder_out, ph_dur=ph_dur, pitch=pitch, **extra),
            bp, bm)
        outs = exp.call(self.params, jax.random.PRNGKey(seed), *args,
                        np.int32(steps))
        return {v: np.asarray(o)[:, :t_mel]
                for v, o in zip(self.variance_names(), outs)}


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
