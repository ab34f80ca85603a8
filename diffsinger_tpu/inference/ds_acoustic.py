"""Acoustic inference driver: .ds segments -> mel -> waveform
(reference inference/ds_acoustic.py:21-271).

TPU adaptations:
* segment frame counts are padded to bucket boundaries so the jitted
  forward+sampler+vocoder program is reused across segments;
* per-segment seeds map to `jax.random.PRNGKey` (randomness parity with torch
  is impossible by construction — validated on mel statistics instead,
  SURVEY.md §7.2#4).
"""

from __future__ import annotations

import pathlib
from collections import OrderedDict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.inference.base_svs_infer import BaseSVSInfer, bucket_length
from diffsinger_tpu.models.toplevel import VARIANCE_CHECKLIST, DiffSingerAcoustic
from diffsinger_tpu.utils import pad_to
from diffsinger_tpu.utils.ckpt import load_params_for_inference
from diffsinger_tpu.utils.infer_utils import cross_fade, resample_align_curve, save_wav
from diffsinger_tpu.utils.text import load_phoneme_dictionary
from diffsinger_tpu.vocoders.registry import get_vocoder_cls


class DiffSingerAcousticInfer(BaseSVSInfer):
    def __init__(self, hparams: dict, load_model: bool = True, load_vocoder: bool = True,
                 ckpt_steps: Optional[int] = None):
        super().__init__(hparams)
        self.variances_to_embed = {
            v for v in VARIANCE_CHECKLIST if hparams.get(f"use_{v}_embed", False)
        }
        if load_model:
            self.phoneme_dictionary = load_phoneme_dictionary(hparams)
            self.load_maps()
            # fp32 by default (matches the reference's CUDA inference);
            # `infer_precision: bf16` opts serving into bf16 compute
            # (~12% faster sampling on TPU, params stay fp32). Shares the
            # training side's resolver so every precision spelling it
            # accepts works here too.
            from diffsinger_tpu.training.base_task import resolve_precision

            dtype = resolve_precision(hparams.get("infer_precision"))
            self.model = DiffSingerAcoustic(
                hparams,
                vocab_size=len(self.phoneme_dictionary),
                out_dims=hparams["audio_num_mel_bins"],
                dtype=dtype,
            )
            try:
                template = self.model.init(jax.random.PRNGKey(0))
                self.params, _ = load_params_for_inference(
                    hparams["work_dir"], template, category="acoustic", ckpt_steps=ckpt_steps, hparams=hparams
                )
            except FileNotFoundError:
                import warnings

                warnings.warn(
                    f"No checkpoint in '{hparams['work_dir']}'; using RANDOM weights."
                )
                self.params = self.model.init(jax.random.PRNGKey(0))
            # checkpoint loading yields HOST numpy leaves; committing the
            # pytree to device once keeps every jitted segment call from
            # re-uploading the full parameter set (on the remote-TPU tunnel
            # that re-upload costs seconds per dispatch)
            self.params = jax.device_put(self.params)
            self._jit_cache: Dict = {}
        if load_vocoder:
            self.vocoder = get_vocoder_cls(hparams)(hparams)

    # ------------------------------------------------------------------
    def preprocess_input(self, param: dict, idx: int = 0) -> Dict[str, np.ndarray]:
        """One .ds segment -> model inputs (ds_acoustic.py:70-181)."""
        hp = self.hparams
        batch: Dict[str, np.ndarray] = {}
        summary = OrderedDict()

        lang = param.get("lang")
        if lang is None:
            assert len(self.lang_map) <= 1, (
                "This is a multilingual model. Please specify a language by --lang option."
            )
        elif self.lang_map:
            assert lang in self.lang_map, f"Unrecognized language name: '{lang}'."
        if hp.get("use_lang_id", False):
            batch["languages"] = self.encode_languages(
                param["ph_seq"], lang, self.phoneme_dictionary
            )[None]

        tokens = np.asarray(
            self.phoneme_dictionary.encode(param["ph_seq"], lang=lang), np.int32
        )[None]
        batch["tokens"] = tokens

        ph_dur = np.asarray(param["ph_dur"].split(), np.float32)
        ph_acc = np.round(np.cumsum(ph_dur) / self.timestep + 0.5).astype(np.int64)
        durations = np.diff(ph_acc, prepend=0)
        mel2ph = np.repeat(np.arange(1, len(durations) + 1), durations).astype(np.int32)[None]
        batch["mel2ph"] = mel2ph
        length = mel2ph.shape[1]

        summary["tokens"] = tokens.shape[1]
        summary["frames"] = length
        summary["seconds"] = "%.2f" % (length * self.timestep)

        if hp.get("use_spk_id", False):
            spk_mix_id, spk_mix_value = self.load_speaker_mix(
                param_src=param, summary_dst=summary, mix_mode="frame", mix_length=length
            )
            batch["spk_mix_id"] = spk_mix_id
            batch["spk_mix_value"] = spk_mix_value

        batch["f0"] = resample_align_curve(
            np.asarray(param["f0_seq"].split(), np.float32),
            original_timestep=float(param["f0_timestep"]),
            target_timestep=self.timestep,
            align_length=length,
        )[None]

        for v_name in VARIANCE_CHECKLIST:
            if v_name in self.variances_to_embed:
                batch[v_name] = resample_align_curve(
                    np.asarray(param[v_name].split(), np.float32),
                    original_timestep=float(param[f"{v_name}_timestep"]),
                    target_timestep=self.timestep,
                    align_length=length,
                )[None]
                summary[v_name] = "manual"

        if hp.get("use_key_shift_embed", False):
            shift_min, shift_max = hp["augmentation_args"]["random_pitch_shifting"]["range"]
            gender = param.get("gender", 0.0)
            if isinstance(gender, (int, float, bool)):
                summary["gender"] = f"static({float(gender):.3f})"
                value = gender * shift_max if gender >= 0 else gender * abs(shift_min)
                batch["key_shift"] = np.full((1, length), value, np.float32)
            else:
                summary["gender"] = "dynamic"
                gender_seq = resample_align_curve(
                    np.asarray(gender.split(), np.float32),
                    original_timestep=float(param["gender_timestep"]),
                    target_timestep=self.timestep,
                    align_length=length,
                )
                mask = gender_seq >= 0
                key_shift_seq = gender_seq * (mask * shift_max + (1 - mask) * abs(shift_min))
                batch["key_shift"] = np.clip(
                    key_shift_seq.astype(np.float32), shift_min, shift_max
                )[None]

        if hp.get("use_speed_embed", False):
            if param.get("velocity") is None:
                summary["velocity"] = "default"
                batch["speed"] = np.full((1, length), 1.0, np.float32)
            else:
                summary["velocity"] = "manual"
                speed_min, speed_max = hp["augmentation_args"]["random_time_stretching"]["range"]
                speed_seq = resample_align_curve(
                    np.asarray(param["velocity"].split(), np.float32),
                    original_timestep=float(param["velocity_timestep"]),
                    target_timestep=self.timestep,
                    align_length=length,
                )
                batch["speed"] = np.clip(speed_seq.astype(np.float32), speed_min, speed_max)[None]

        print(f"[{idx}]\t" + ", ".join(f"{k}: {v}" for k, v in summary.items()))
        return batch

    # ------------------------------------------------------------------
    def _pad_batch(self, batch: Dict[str, np.ndarray]):
        """Pad frame/token axes up to bucket lengths for compile reuse."""
        length = batch["mel2ph"].shape[1]
        t_mel = bucket_length(length)
        t_txt = bucket_length(batch["tokens"].shape[1], step=16, minimum=16)
        out = dict(batch)
        out["tokens"] = pad_to(batch["tokens"], t_txt, axis=1)
        for key in ("mel2ph", "f0", "key_shift", "speed", *self.variances_to_embed):
            if key in out:
                out[key] = pad_to(out[key], t_mel, axis=1)
        if "languages" in out:
            out["languages"] = pad_to(out["languages"], t_txt, axis=1)
        if "spk_mix_value" in out and out["spk_mix_value"].shape[1] > 1:
            out["spk_mix_value"] = pad_to(out["spk_mix_value"], t_mel, axis=1)
        return out, length

    @staticmethod
    def _spk_mix_embed(params, spk_mix_id, spk_mix_value):
        """Mix speaker embeddings in-graph (ds_acoustic.py:190-197):
        [1,1,N],[1,T,N] -> [1,T,H]."""
        table = params["params"]["fs2"]["spk_embed"]["embedding"]
        emb = jnp.take(table, spk_mix_id, axis=0)  # [1,1,N,H]
        return jnp.sum(emb * spk_mix_value[..., None], axis=2)

    def _build_inputs(self, padded: Dict[str, np.ndarray]):
        """Model kwargs as host arrays; the speaker-mix embedding is computed
        inside the jitted program from the raw ids/values."""
        kwargs: Dict[str, np.ndarray] = {}
        for key in ("languages", "key_shift", "speed"):
            if key in padded:
                kwargs[key] = padded[key]
        variances = {v: padded[v] for v in self.variances_to_embed if v in padded}
        if variances:
            kwargs["variances"] = variances
        spk_mix = None
        if "spk_mix_id" in padded:
            spk_mix = {"id": padded["spk_mix_id"], "value": padded["spk_mix_value"]}
        return kwargs, spk_mix

    def _mixed_kwargs(self, params, kw, mix):
        """(traced) resolve the spk-mix arrays into the embed kwarg."""
        if mix is not None:
            kw = dict(kw, spk_mix_embed=self._spk_mix_embed(
                params, mix["id"], mix["value"]))
        return kw

    def forward_model(self, batch: Dict[str, np.ndarray], rng: jax.Array,
                      steps: Optional[int] = None, depth: Optional[int] = None):
        """Padded-bucket jitted sampler -> (mel [1, T, M] numpy, f0 [1, T])."""
        padded, length = self._pad_batch(batch)
        kwargs, spk_mix = self._build_inputs(padded)

        key = ("mel", padded["tokens"].shape[1], padded["mel2ph"].shape[1],
               tuple(sorted(kwargs)), spk_mix is not None, steps, depth)
        if key not in self._jit_cache:

            def fn(params, rng, tokens, mel2ph, f0, kw, mix):
                return self.model.forward_infer(
                    params, rng, tokens, mel2ph, f0, steps=steps, depth=depth,
                    **self._mixed_kwargs(params, kw, mix),
                ).diff_out

            self._jit_cache[key] = jax.jit(fn)
        mel = self._jit_cache[key](
            self.params, rng, padded["tokens"], padded["mel2ph"], padded["f0"],
            kwargs, spk_mix,
        )
        return np.asarray(mel)[:, :length], padded["f0"][:, :length]

    def forward_wav(self, batch: Dict[str, np.ndarray], rng: jax.Array,
                    steps: Optional[int] = None, depth: Optional[int] = None) -> np.ndarray:
        """Fused sampler+vocoder: ONE jitted program per bucket shape, one
        device dispatch per segment -> wav [T*hop] numpy.

        The vocoder runs on the bucket-padded mel (pad frames are zero-masked
        by ``forward_infer`` and pad f0 is 0) and the waveform is sliced to
        the true length on host; within the vocoder's receptive field of the
        segment tail this differs from vocoding the exact-length mel by edge
        effects only.  On remote-tunnel runtimes this path is ~5x fewer round
        trips than sampler-then-vocoder dispatching.
        """
        padded, length = self._pad_batch(batch)
        kwargs, spk_mix = self._build_inputs(padded)

        key = ("wav", padded["tokens"].shape[1], padded["mel2ph"].shape[1],
               tuple(sorted(kwargs)), spk_mix is not None, steps, depth)
        if key not in self._jit_cache:

            def fn(params, voc_params, rng, tokens, mel2ph, f0, kw, mix):
                out = self.model.forward_infer(
                    params, rng, tokens, mel2ph, f0, steps=steps, depth=depth,
                    **self._mixed_kwargs(params, kw, mix),
                )
                return self.vocoder.spec2wav_traced(voc_params, out.diff_out, f0)

            self._jit_cache[key] = jax.jit(fn)
        wav = self._jit_cache[key](
            self.params, self.vocoder.params, rng,
            padded["tokens"], padded["mel2ph"], padded["f0"], kwargs, spk_mix,
        )
        return np.asarray(wav)[0, : length * self.hparams["hop_size"]]

    def run_vocoder(self, mel, f0) -> np.ndarray:
        wav = self.vocoder.spec2wav_jax(jnp.asarray(mel), jnp.asarray(f0))
        return np.asarray(wav[0])

    # ------------------------------------------------------------------
    def _concat_segments(self, params: List[dict], wavs: List[np.ndarray]) -> np.ndarray:
        """Offset-based concatenation with cross-fade on overlap
        (ds_acoustic.py:252-259)."""
        sr = self.hparams["audio_sample_rate"]
        result = np.zeros(0)
        current_length = 0
        for param, wav in zip(params, wavs):
            silent_length = round(param.get("offset", 0) * sr) - current_length
            if silent_length >= 0:
                result = np.append(result, np.zeros(silent_length))
                result = np.append(result, wav)
            else:
                result = cross_fade(result, wav, current_length + silent_length)
            current_length = current_length + silent_length + wav.shape[0]
        return result

    def run_inference(
        self,
        params: List[dict],
        out_dir: pathlib.Path = None,
        title: str = None,
        num_runs: int = 1,
        spk_mix: Dict[str, float] = None,
        seed: int = -1,
        save_mel: bool = False,
        steps: Optional[int] = None,
        depth: Optional[int] = None,
    ):
        """Synthesize all segments and concatenate by offsets
        (ds_acoustic.py:214-271)."""
        batches = [self.preprocess_input(p, idx=i) for i, p in enumerate(params)]
        out_dir = pathlib.Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        suffix = ".wav" if not save_mel else ".mel.npz"
        hp = self.hparams
        for run in range(num_runs):
            result = []
            wavs = []
            for i, (param, batch) in enumerate(zip(params, batches)):
                if "seed" in param:
                    rng = jax.random.PRNGKey(param["seed"] & 0xFFFF_FFFF)
                elif seed >= 0:
                    rng = jax.random.PRNGKey(seed & 0xFFFF_FFFF)
                else:
                    rng = jax.random.PRNGKey((hash((title, run, i)) & 0xFFFF_FFFF))
                if save_mel:
                    mel_pred, f0 = self.forward_model(batch, rng, steps=steps, depth=depth)
                    result.append({
                        "offset": param.get("offset", 0.0),
                        "mel": np.asarray(mel_pred[0]),
                        "f0": np.asarray(f0[0]),
                    })
                else:
                    if hasattr(self.vocoder, "spec2wav_traced"):
                        wav = self.forward_wav(batch, rng, steps=steps, depth=depth)
                    else:
                        mel_pred, f0 = self.forward_model(batch, rng, steps=steps, depth=depth)
                        wav = self.run_vocoder(mel_pred, f0)
                    wavs.append(wav)
            if not save_mel:
                result = self._concat_segments(params, wavs)
            filename = (
                f"{title}-{str(run).zfill(3)}{suffix}" if num_runs > 1 else f"{title}{suffix}"
            )
            save_path = out_dir / filename
            if save_mel:
                np.savez(
                    save_path,
                    **{
                        f"{k}_{j}": seg[k]
                        for j, seg in enumerate(result)
                        for k in ("offset", "mel", "f0")
                    },
                    num_segments=len(result),
                )
                print(f"| save mel: {save_path}")
            else:
                print(f"| save audio: {save_path}")
                save_wav(result, save_path, hp["audio_sample_rate"])
