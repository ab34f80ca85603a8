"""DDSP vocoder (reference modules/vocoders/ddsp.py).

The reference executes a pc-ddsp TorchScript ``.jit`` bundle with torch. Here
the bundle's weights are **converted once** into the native CombSub pytree
(``<bundle>.dsckpt``, see :mod:`diffsinger_tpu.vocoders.ddsp_convert` — torch
runs on the host only at convert time) and synthesis runs as jitted JAX
(:class:`~diffsinger_tpu.vocoders.ddsp_combsub.CombSub`) — the TPU path.

I/O contract matches the reference: mel [T, M] (mel_base-aware: log-e input is
scaled by 0.434294 to log10, ddsp.py:79-80), f0 [T] -> wav [T*hop]. Parameter
mismatch warnings mirror ddsp.py:51-73.
"""

from __future__ import annotations

import pathlib
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.vocoders.registry import register_vocoder


@register_vocoder
class DDSP:
    def __init__(self, hparams: dict):
        self.hparams = hparams
        model_path = pathlib.Path(hparams["vocoder_ckpt"])
        native_path = (
            model_path if model_path.suffix == ".dsckpt"
            else model_path.with_suffix(model_path.suffix + ".dsckpt")
        )
        if not native_path.exists():
            if not model_path.exists():
                raise FileNotFoundError(f"DDSP model file is not found at '{model_path}'!")
            from diffsinger_tpu.vocoders.ddsp_convert import convert_torchscript_ddsp

            print(f"| converting DDSP TorchScript bundle '{model_path}' to native params")
            native_path = convert_torchscript_ddsp(model_path)

        from flax import serialization

        from diffsinger_tpu.vocoders.ddsp_combsub import CombSub

        blob = serialization.msgpack_restore(bytearray(native_path.read_bytes()))
        meta = blob["meta"]
        self.meta = meta
        self._check_mismatch(meta)
        self.model = CombSub(
            sampling_rate=int(meta["sampling_rate"]),
            block_size=int(meta["block_size"]),
            win_length=int(meta["win_length"]),
            n_mag_harmonic=int(meta["n_mag_harmonic"]),
            n_mag_noise=int(meta["n_mag_noise"]),
        )
        # msgpack_restore yields host numpy; commit once so repeated jitted
        # calls don't re-upload the pytree (remote-TPU transfer cost)
        self.params = jax.device_put({"params": blob["params"]})
        self._jitted = jax.jit(
            lambda p, mel, f0, rng: self.model.apply(p, mel, f0, rng=rng)
        )

    def _check_mismatch(self, meta):
        hp = self.hparams
        for hp_key, meta_key in (
            ("audio_sample_rate", "sampling_rate"),
            ("audio_num_mel_bins", "n_mels"),
            ("hop_size", "block_size"),
            ("win_size", "win_length"),
        ):
            if hp.get(hp_key) is not None and int(hp[hp_key]) != int(meta[meta_key]):
                print(f"Mismatch parameters: hparams['{hp_key}']=", hp[hp_key],
                      "!=", meta[meta_key], "(vocoder)")

    def _mel_to_log10(self, mel):
        mel_base = self.hparams.get("mel_base", 10)
        if mel_base == "e":
            return 0.434294 * mel  # ln -> log10
        assert mel_base in (10, "10"), "mel_base must be 'e', '10' or 10."
        return mel

    def spec2wav_traced(self, params, mel, f0):
        """Traceable body (mel_base handling + CombSub): callers fuse this
        into their own jitted programs so sampler+vocoder is one dispatch."""
        mel = self._mel_to_log10(mel.astype(jnp.float32))
        return self.model.apply(params, mel, f0, rng=jax.random.PRNGKey(0))

    def spec2wav_jax(self, mel, f0, rng=None):
        """mel [B, T, M] in the configured ``mel_base`` (same contract as
        NsfHifiGAN.spec2wav_jax — the batched server calls this directly),
        f0 [B, T] -> wav [B, T*hop] (device arrays)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        mel = self._mel_to_log10(jnp.asarray(mel, dtype=jnp.float32))
        return self._jitted(self.params, mel, f0, rng)

    def spec2wav(self, mel: np.ndarray, *, f0: np.ndarray, **kwargs) -> np.ndarray:
        wav = self.spec2wav_jax(jnp.asarray(mel, jnp.float32)[None],
                                jnp.asarray(f0, jnp.float32)[None])
        return np.asarray(wav[0])
