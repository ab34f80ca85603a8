"""NSF-HiFiGAN vocoder wrapper (reference modules/vocoders/nsf_hifigan.py).

Loads the torch vocoder checkpoint (+config.json) and converts it to JAX
params; `spec2wav` is a jitted mel[B,T,M]+f0[B,T] -> wav[B,T*hop] program.
If the checkpoint is absent, falls back to random init with a loud warning so
the pipeline stays runnable in asset-free environments.
"""

from __future__ import annotations

import json
import pathlib
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.vocoders.nsf_hifigan_model import Generator, NsfHifiGanConfig
from diffsinger_tpu.vocoders.registry import register_vocoder

_PARAM_WARN_KEYS = [
    ("sampling_rate", "audio_sample_rate"),
    ("num_mels", "audio_num_mel_bins"),
]


@register_vocoder
class NsfHifiGAN:
    def __init__(self, hparams: dict):
        self.hparams = hparams
        model_path = pathlib.Path(hparams["vocoder_ckpt"])
        config_path = model_path.with_name("config.json")
        if config_path.exists():
            with open(config_path) as f:
                self.config = NsfHifiGanConfig.from_json(json.load(f))
        else:
            self.config = NsfHifiGanConfig(
                num_mels=hparams.get("audio_num_mel_bins", 128),
                sampling_rate=hparams.get("audio_sample_rate", 44100),
            )
        for cfg_key, hp_key in _PARAM_WARN_KEYS:
            if hp_key in hparams and getattr(self.config, cfg_key) != hparams[hp_key]:
                print(
                    f"Mismatch parameters: hparams[{hp_key!r}]={hparams[hp_key]} != "
                    f"{getattr(self.config, cfg_key)} (vocoder)"
                )
        from diffsinger_tpu.training.base_task import resolve_precision

        # infer_precision: bf16 speeds the (bandwidth-bound) vocoder too;
        # phase math stays fp32 inside the source generators
        self.model = Generator(
            self.config, dtype=resolve_precision(hparams.get("infer_precision"))
        )

        if model_path.exists():
            from diffsinger_tpu.utils.torch_convert import convert_nsf_hifigan, load_torch_file

            ckpt = load_torch_file(model_path)
            self.params = jax.tree.map(
                jnp.asarray, convert_nsf_hifigan(ckpt["generator"], self.config)
            )
            print(f"| Load HifiGAN: {model_path}")
        else:
            warnings.warn(
                f"NSF-HiFiGAN checkpoint not found at '{model_path}'; "
                "using RANDOM weights — output will be noise. "
                "See docs/BestPractices.md#vocoders in the reference for checkpoints."
            )
            self.params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 16, self.config.num_mels)),
                jnp.zeros((1, 16)),
            )
        self._jitted = jax.jit(self.spec2wav_traced)

    def spec2wav_traced(self, params, mel, f0):
        """Traceable body (mel_base handling + generator): callers fuse this
        into their own jitted programs so sampler+vocoder is one dispatch."""
        mel_base = self.hparams.get("mel_base", 10)
        if mel_base != "e":
            assert mel_base in (10, "10"), "mel_base must be 'e', '10' or 10."
            mel = 2.30259 * mel  # log10 -> ln
        return self.model.apply(params, mel, f0, rng=jax.random.PRNGKey(0))

    def spec2wav_jax(self, mel: jnp.ndarray, f0: jnp.ndarray) -> jnp.ndarray:
        """mel [B, T, M] in the configured mel_base; f0 [B, T] -> wav [B, T*hop]."""
        from diffsinger_tpu.utils.profiling import trace_annotation

        with trace_annotation("vocoder/nsf_hifigan"):
            return self._jitted(self.params, mel, f0)

    def spec2wav(self, mel: np.ndarray, *, f0: np.ndarray, **kwargs) -> np.ndarray:
        """Single-item host API: mel [T, M], f0 [T] -> wav [T*hop] numpy."""
        wav = self.spec2wav_jax(jnp.asarray(mel)[None], jnp.asarray(f0)[None])
        return np.asarray(wav[0])
