"""Variance inference driver: .ds -> predicted ph_dur / f0 / variance curves
written back into a new .ds (reference inference/ds_variance.py:29-468).

Per-segment predictor flags (the auto-completion cascade, ds_variance.py:370-394)
become *static* arguments of the jitted forward, so each (flags, bucket-shape)
combination compiles once and is reused.
"""

from __future__ import annotations

import copy
import json
import pathlib
from collections import OrderedDict
from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.dsp.common import interp_f0, sinusoidal_smooth_np
from diffsinger_tpu.inference.base_svs_infer import BaseSVSInfer, bucket_length
from diffsinger_tpu.models.toplevel import VARIANCE_CHECKLIST, DiffSingerVariance
from diffsinger_tpu.utils import pad_to
from diffsinger_tpu.utils.ckpt import load_params_for_inference
from diffsinger_tpu.utils.infer_utils import hz_to_midi, midi_to_hz, resample_align_curve
from diffsinger_tpu.utils.seq import rhythm_regulator
from diffsinger_tpu.utils.text import load_phoneme_dictionary


def note_to_midi_float(note: str) -> float:
    """librosa.note_to_midi(round_midi=False)-compatible for plain note names
    with optional cents (e.g. 'C4', 'A#3', 'C4-25')."""
    cents = 0.0
    for sep in ("+", "-"):
        idx = note.find(sep, 1)
        if idx > 0 and note[idx + 1:].isdigit():
            cents = float(note[idx:])
            note = note[:idx]
            break
    from diffsinger_tpu.utils.infer_utils import note_to_midi

    return note_to_midi(note) + cents / 100.0


def _nearest_interp_rests(note_midi: np.ndarray, note_rest: np.ndarray) -> np.ndarray:
    """Fill rest positions with the nearest non-rest midi
    (ds_variance.py:136-145, scipy interp1d kind='nearest')."""
    if note_rest.all():
        return np.full_like(note_midi, 60.0)
    idx_known = np.where(~note_rest)[0]
    idx_rest = np.where(note_rest)[0]
    # nearest: for ties scipy 'nearest' rounds half down (takes the left point)
    pos = np.searchsorted(idx_known, idx_rest)
    pos = np.clip(pos, 1, len(idx_known) - 1) if len(idx_known) > 1 else np.zeros_like(pos)
    if len(idx_known) == 1:
        note_midi[idx_rest] = note_midi[idx_known[0]]
        return note_midi
    left = idx_known[pos - 1]
    right = idx_known[pos]
    nearest = np.where(idx_rest - left <= right - idx_rest, left, right)
    note_midi[idx_rest] = note_midi[nearest]
    return note_midi


def _expand(dur: np.ndarray) -> np.ndarray:
    """Host-side length regulator: [T] int -> 1-based frame map [sum(dur)]."""
    return np.repeat(np.arange(1, len(dur) + 1), dur).astype(np.int32)


class DiffSingerVarianceInfer(BaseSVSInfer):
    def __init__(self, hparams: dict, ckpt_steps: Optional[int] = None,
                 predictions: Set[str] = frozenset()):
        super().__init__(hparams)
        self.phoneme_dictionary = load_phoneme_dictionary(hparams)
        self.load_maps()
        from diffsinger_tpu.training.base_task import resolve_precision

        self.model = DiffSingerVariance(
            hparams, vocab_size=len(self.phoneme_dictionary),
            dtype=resolve_precision(hparams.get("infer_precision")))
        try:
            template = self.model.init(jax.random.PRNGKey(0))
            self.params, _ = load_params_for_inference(
                hparams["work_dir"], template, category="variance", ckpt_steps=ckpt_steps, hparams=hparams
            )
        except FileNotFoundError:
            import warnings

            warnings.warn(f"No checkpoint in '{hparams['work_dir']}'; using RANDOM weights.")
            self.params = self.model.init(jax.random.PRNGKey(0))
        # commit the (host-numpy) checkpoint pytree to device once — see
        # DiffSingerAcousticInfer.__init__ (per-dispatch re-upload otherwise)
        self.params = jax.device_put(self.params)

        self.smooth_kernel_size = max(1, round(hparams["midi_smooth_width"] / self.timestep))

        glide_types = hparams.get("glide_types", [])
        assert "none" not in glide_types, (
            "Type name 'none' is reserved and should not appear in glide_types."
        )
        self.glide_map = {"none": 0, **{t: i + 1 for i, t in enumerate(glide_types)}}

        predictions = set(predictions)
        self.auto_completion_mode = len(predictions) == 0
        self.global_predict_dur = "dur" in predictions and hparams["predict_dur"]
        self.global_predict_pitch = "pitch" in predictions and hparams["predict_pitch"]
        self.variance_prediction_set = predictions.intersection(VARIANCE_CHECKLIST)
        self.global_predict_variances = len(self.variance_prediction_set) > 0

    # ------------------------------------------------------------------
    def preprocess_input(self, param: dict, idx: int = 0, load_dur: bool = False,
                         load_pitch: bool = False) -> Dict[str, np.ndarray]:
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
        t_ph = tokens.shape[1]

        ph_num = np.asarray(param["ph_num"].split(), np.int64)
        ph2word = _expand(ph_num)[None]  # [1, T_ph]
        assert ph2word.shape[1] == t_ph, "ph_num does not sum to token count"
        t_w = int(ph2word.max())
        batch["ph2word"] = ph2word.astype(np.int32)

        note_midi = np.asarray(
            [note_to_midi_float(n) if n != "rest" else -1 for n in param["note_seq"].split()],
            np.float32,
        )
        note_rest = note_midi < 0
        note_midi = _nearest_interp_rests(note_midi, note_rest)
        t_n = len(note_midi)

        note_dur_sec = np.asarray(param["note_dur"].split(), np.float32)
        note_acc = np.round(np.cumsum(note_dur_sec) / self.timestep + 0.5).astype(np.int64)
        note_dur = np.diff(note_acc, prepend=0)
        mel2note = _expand(note_dur)[None]
        t_s = mel2note.shape[1]

        summary.update(words=t_w, notes=t_n, tokens=t_ph, frames=t_s,
                       seconds="%.2f" % (t_s * self.timestep))

        if hp.get("use_spk_id", False):
            ph_id, ph_val = self.load_speaker_mix(param, summary, "token", t_ph)
            fr_id, fr_val = self.load_speaker_mix(param, summary, "frame", t_s)
            batch.update(ph_spk_mix_id=ph_id, ph_spk_mix_value=ph_val,
                         spk_mix_id=fr_id, spk_mix_value=fr_val)

        if load_dur:
            ph_dur_sec = np.asarray(param["ph_dur"].split(), np.float32)
            ph_acc = np.round(np.cumsum(ph_dur_sec) / self.timestep + 0.5).astype(np.int64)
            ph_dur = np.diff(ph_acc, prepend=0)
            mel2ph = _expand(ph_dur)[None]
            if mel2ph.shape[1] != t_s:  # align phones with notes
                if mel2ph.shape[1] < t_s:
                    mel2ph = np.pad(mel2ph, ((0, 0), (0, t_s - mel2ph.shape[1])),
                                    constant_values=mel2ph[0, -1])
                else:
                    mel2ph = mel2ph[:, :t_s]
                ph_dur = np.bincount(mel2ph[0], minlength=t_ph + 1)[1: t_ph + 1]
            word_dur = np.zeros(t_w + 1, np.int64)
            np.add.at(word_dur, ph2word[0], ph_dur[: t_ph])
            word_dur = word_dur[1:][None]
            batch["ph_dur"] = np.asarray(ph_dur, np.int32)[None]
            batch["mel2ph"] = mel2ph.astype(np.int32)
        else:
            is_slur = np.asarray([int(s) for s in param["note_slur"].split()], bool)
            note2word = np.cumsum(~is_slur)
            word_dur = np.zeros(t_w + 1, np.int64)
            np.add.at(word_dur, note2word, note_dur)
            word_dur = word_dur[1:][None]

        mel2word = _expand(word_dur[0])[None]
        if mel2word.shape[1] != t_s:
            if mel2word.shape[1] < t_s:
                mel2word = np.pad(mel2word, ((0, 0), (0, t_s - mel2word.shape[1])),
                                  constant_values=mel2word[0, -1])
            else:
                mel2word = mel2word[:, :t_s]
            word_dur = np.bincount(mel2word[0], minlength=t_w + 1)[1: t_w + 1][None]
        batch["word_dur"] = np.asarray(word_dur, np.int32)

        batch["note_midi"] = note_midi[None]
        batch["note_dur"] = np.asarray(note_dur, np.int32)[None]
        batch["note_rest"] = note_rest[None]
        if hp.get("use_glide_embed", False) and param.get("note_glide") is not None:
            batch["note_glide"] = np.asarray(
                [[self.glide_map.get(x, 0) for x in param["note_glide"].split()]], np.int32
            )
        else:
            batch["note_glide"] = np.zeros((1, t_n), np.int32)
        batch["mel2note"] = mel2note.astype(np.int32)

        # frame-level MIDI (step function) -> smoothed base pitch
        # (ds_variance.py:219-224); host conv — preprocessing must not
        # dispatch to the device (tunnel round trips dominate short segments)
        frame_midi = np.pad(note_midi, (1, 0))[mel2note[0]][None]
        batch["base_pitch"] = sinusoidal_smooth_np(frame_midi, self.smooth_kernel_size)

        # phoneme-level MIDI (ds_variance.py:226-241)
        if load_dur:
            mel2pdur = np.pad(batch["ph_dur"][0], (1, 0), constant_values=1)[batch["mel2ph"][0]]
            ph_midi = np.zeros(t_ph + 1, np.float64)
            np.add.at(ph_midi, batch["mel2ph"][0], frame_midi[0] / np.maximum(mel2pdur, 1))
            ph_midi = ph_midi[1:]
        else:
            mel2wdur = np.pad(word_dur[0], (1, 0), constant_values=1)[mel2word[0]]
            w_midi = np.zeros(t_w + 1, np.float64)
            np.add.at(w_midi, mel2word[0], frame_midi[0] / np.maximum(mel2wdur, 1))
            w_midi = np.pad(w_midi[1:], (1, 0))
            ph_midi = w_midi[ph2word[0]]
        batch["midi"] = np.clip(np.round(ph_midi), 0, 127).astype(np.int32)[None]

        if load_pitch:
            f0 = resample_align_curve(
                np.asarray(param["f0_seq"].split(), np.float32),
                original_timestep=float(param["f0_timestep"]),
                target_timestep=self.timestep,
                align_length=t_s,
            )
            batch["pitch"] = hz_to_midi(interp_f0(f0)[0]).astype(np.float32)[None]

        if self.model.predict_dur:
            summary["ph_dur"] = ("manual" if load_dur else
                                 "auto" if self.auto_completion_mode or self.global_predict_dur
                                 else "ignored")
        if self.model.predict_pitch:
            if load_pitch:
                summary["pitch"] = "manual"
            elif self.auto_completion_mode or self.global_predict_pitch:
                summary["pitch"] = "auto"
                expr = param.get("expr", 1.0)
                if isinstance(expr, (int, float, bool)):
                    summary["expr"] = f"static({float(expr):.3f})"
                    batch["expr"] = np.full((1, t_s), float(expr), np.float32)
                else:
                    summary["expr"] = "dynamic"
                    batch["expr"] = resample_align_curve(
                        np.asarray(expr.split(), np.float32),
                        original_timestep=float(param["expr_timestep"]),
                        target_timestep=self.timestep,
                        align_length=t_s,
                    ).astype(np.float32)[None]
            else:
                summary["pitch"] = "ignored"
        if self.model.var_list:
            for v_name in self.model.var_list:
                auto = (self.auto_completion_mode and param.get(v_name) is None) or (
                    v_name in self.variance_prediction_set
                )
                summary[v_name] = "auto" if auto else "ignored"

        print(f"[{idx}]\t" + ", ".join(f"{k}: {v}" for k, v in summary.items()))
        return batch

    # ------------------------------------------------------------------
    @staticmethod
    def _spk_mix_embed(params, ids, values):
        """Mix speaker embeddings in-graph: [1,1,N]/[1,T,N] -> [1,T,H]."""
        table = params["params"]["spk_embed"]["embedding"]
        emb = jnp.take(table, ids, axis=0)
        return jnp.sum(emb * values[..., None], axis=2)

    def bucket_shapes(self, batch: Dict[str, np.ndarray]) -> Tuple[int, int, int, int]:
        """(t_ph, t_w, t_n, t_s) bucket-padded lengths for one segment."""
        return (
            bucket_length(batch["tokens"].shape[1], step=16, minimum=16),
            bucket_length(batch["word_dur"].shape[1], step=16, minimum=16),
            bucket_length(batch["note_midi"].shape[1], step=16, minimum=16),
            bucket_length(batch["base_pitch"].shape[1]),
        )

    def padded_arrays(self, batch: Dict[str, np.ndarray],
                      buckets: Tuple[int, int, int, int]):
        """Pad one segment's arrays to the given bucket lengths. Returns
        (tokens, midi, ph2word, base_pitch, array_kwargs, spk_mix) — single
        [1, T] rows, stackable along axis 0 within a bucket group."""
        t_ph_pad, t_w_pad, t_n_pad, t_s_pad = buckets

        def pad(key, length, value=0):
            if key in batch and batch[key] is not None:
                return pad_to(batch[key], length, pad_value=value, axis=1)
            return None

        kwargs = dict(
            ph_dur=pad("ph_dur", t_ph_pad),
            word_dur=pad("word_dur", t_w_pad),
            mel2ph=pad("mel2ph", t_s_pad),
            pitch=pad("pitch", t_s_pad),
            pitch_expr=pad("expr", t_s_pad),
            note_midi=pad("note_midi", t_n_pad),
            note_rest=pad_to(batch["note_rest"], t_n_pad, pad_value=True, axis=1),
            note_dur=pad("note_dur", t_n_pad),
            note_glide=pad("note_glide", t_n_pad),
            mel2note=pad("mel2note", t_s_pad),
            languages=pad("languages", t_ph_pad),
        )
        spk_mix = None
        if "ph_spk_mix_id" in batch:
            ph_val = batch["ph_spk_mix_value"]
            if ph_val.shape[1] > 1:
                ph_val = pad_to(ph_val, t_ph_pad, axis=1)
            fr_val = batch["spk_mix_value"]
            if fr_val.shape[1] > 1:
                fr_val = pad_to(fr_val, t_s_pad, axis=1)
            # ids/values go in as arrays; the embedding mix happens inside the
            # jitted program (no separate device dispatches per segment)
            spk_mix = {
                "ph_id": batch["ph_spk_mix_id"], "ph_value": ph_val,
                "frame_id": batch["spk_mix_id"], "frame_value": fr_val,
            }

        tokens = pad_to(batch["tokens"], t_ph_pad, axis=1)
        midi = pad_to(batch["midi"], t_ph_pad, axis=1)
        ph2word = pad_to(batch["ph2word"], t_ph_pad, axis=1)
        base_pitch = pad_to(batch["base_pitch"], t_s_pad, axis=1)

        array_kwargs = {k: v for k, v in kwargs.items() if v is not None}
        return tokens, midi, ph2word, base_pitch, array_kwargs, spk_mix

    def forward_model(self, batch: Dict[str, np.ndarray],
                      flags: Tuple[bool, bool, bool], rng: jax.Array,
                      steps: Optional[int] = None):
        """Returns (dur_pred frames | None, pitch_pred midi | None, variance dict)."""
        predict_dur, predict_pitch, predict_variances = flags
        t_s = batch["base_pitch"].shape[1]
        tokens, midi, ph2word, base_pitch, array_kwargs, spk_mix = (
            self.padded_arrays(batch, self.bucket_shapes(batch)))
        dur_pred, pitch_pred, variance_pred = self._run_padded(
            tokens, midi, ph2word, base_pitch, array_kwargs, spk_mix,
            flags, rng, steps,
        )
        t_ph = batch["tokens"].shape[1]
        out_dur = None
        if dur_pred is not None and predict_dur:
            out_dur = np.asarray(dur_pred)[0, :t_ph]
        out_pitch = None
        if pitch_pred is not None:
            out_pitch = np.asarray(pitch_pred)[0, :t_s]
        out_vars = {k: np.asarray(v)[0, :t_s] for k, v in (variance_pred or {}).items()}
        return out_dur, out_pitch, out_vars

    def _run_padded(self, tokens, midi, ph2word, base_pitch, array_kwargs,
                    spk_mix, flags, rng, steps):
        """Dispatch one jitted forward on already-padded arrays (any batch
        size — the per-segment driver uses B=1, VarianceServer stacks rows).

        One jitted program per (bucket shapes, predictor flags, arg set,
        steps); None-valued kwargs are dropped (forward_infer defaults them to
        None), so the traced pytree structure stays static per cache key.  The
        rhythm regulator, delta-pitch add, and speaker-embedding mix run
        INSIDE the program: a dispatch costs exactly one device round trip."""
        predict_dur, predict_pitch, predict_variances = flags
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        key = (
            tuple(sorted((k, np.shape(v)) for k, v in array_kwargs.items())),
            spk_mix is not None,
            np.shape(tokens), np.shape(base_pitch), flags, steps,
        )
        if key not in self._jit_cache:

            def fn(params, rng, tokens, midi, ph2word, base_pitch, kw, mix):
                if mix is not None:
                    kw = dict(
                        kw,
                        ph_spk_mix_embed=self._spk_mix_embed(
                            params, mix["ph_id"], mix["ph_value"]),
                        spk_mix_embed=self._spk_mix_embed(
                            params, mix["frame_id"], mix["frame_value"]),
                    )
                dur_pred, pitch_pred, variance_pred = self.model.forward_infer(
                    params, rng, tokens, midi, ph2word, base_pitch,
                    predict_pitch=predict_pitch, predict_variances=predict_variances,
                    steps=steps, **kw,
                )
                if dur_pred is not None and predict_dur:
                    dur_pred = rhythm_regulator(dur_pred, ph2word, kw["word_dur"])
                if pitch_pred is not None:
                    pitch_pred = base_pitch + pitch_pred
                return dur_pred, pitch_pred, variance_pred

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](
            self.params, rng, tokens, midi, ph2word, base_pitch,
            array_kwargs, spk_mix,
        )

    # ------------------------------------------------------------------
    def segment_flags(self, param: dict) -> Tuple[bool, bool, bool]:
        """The predictor-flag cascade (ds_variance.py:370-394)."""
        if self.auto_completion_mode:
            return (
                self.model.predict_dur and param.get("ph_dur") is None,
                self.model.predict_pitch and param.get("f0_seq") is None,
                bool(self.model.var_list) and any(
                    param.get(v) is None for v in self.model.var_list
                ),
            )
        predict_variances = bool(self.model.var_list) and self.global_predict_variances
        predict_pitch = self.model.predict_pitch and (
            self.global_predict_pitch or (param.get("f0_seq") is None and predict_variances)
        )
        predict_dur = self.model.predict_dur and (
            self.global_predict_dur or (
                param.get("ph_dur") is None and (predict_pitch or predict_variances)
            )
        )
        return predict_dur, predict_pitch, predict_variances

    def _apply_predictions(self, param: dict, dur_pred, pitch_pred,
                           variance_pred) -> dict:
        """Write one segment's predictions back into a copy of its .ds params
        (the writeback contract, reference ds_variance.py:427-457)."""
        param_copy = copy.deepcopy(param)
        if dur_pred is not None and (self.auto_completion_mode or self.global_predict_dur):
            param_copy["ph_dur"] = " ".join(
                str(round(float(d) * self.timestep, 6)) for d in dur_pred
            )
        if pitch_pred is not None and (
            self.auto_completion_mode or self.global_predict_pitch
        ):
            f0_pred = midi_to_hz(pitch_pred)
            param_copy["f0_seq"] = " ".join(str(round(float(f), 1)) for f in f0_pred)
            param_copy["f0_timestep"] = str(self.timestep)
        variance_pred = {
            k: v for k, v in (variance_pred or {}).items()
            if (self.auto_completion_mode and param.get(k) is None)
            or k in self.variance_prediction_set
        }
        for v_name, v_pred in variance_pred.items():
            param_copy[v_name] = " ".join(str(round(float(v), 4)) for v in v_pred)
            param_copy[f"{v_name}_timestep"] = str(self.timestep)

        # restore original spk mixes (ds_variance.py:444-457)
        if "ph_spk_mix" in param_copy and "spk_mix" in param_copy:
            if "ph_spk_mix_backup" in param_copy:
                backup = param_copy.pop("ph_spk_mix_backup")
                if backup is None:
                    param_copy.pop("ph_spk_mix", None)
                else:
                    param_copy["ph_spk_mix"] = backup
            if "spk_mix_backup" in param_copy:
                backup = param_copy.pop("spk_mix_backup")
                if backup is None:
                    param_copy.pop("spk_mix", None)
                else:
                    param_copy["spk_mix"] = backup
        return param_copy

    def run_inference(self, params: List[dict], out_dir: pathlib.Path = None,
                      title: str = None, num_runs: int = 1, seed: int = -1,
                      steps: Optional[int] = None):
        flags_list = [self.segment_flags(p) for p in params]
        batches = [
            self.preprocess_input(
                p, idx=i,
                load_dur=not f[0] and (f[1] or f[2]),
                load_pitch=not f[1] and f[2],
            )
            for i, (p, f) in enumerate(zip(params, flags_list))
        ]
        out_dir = pathlib.Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for run in range(num_runs):
            results = []
            for i, (param, flags, batch) in enumerate(zip(params, flags_list, batches)):
                if "seed" in param:
                    rng = jax.random.PRNGKey(param["seed"] & 0xFFFF_FFFF)
                elif seed >= 0:
                    rng = jax.random.PRNGKey(seed & 0xFFFF_FFFF)
                else:
                    rng = jax.random.PRNGKey(hash((title, run, i)) & 0xFFFF_FFFF)
                dur_pred, pitch_pred, variance_pred = self.forward_model(
                    batch, flags, rng, steps=steps
                )
                results.append(self._apply_predictions(
                    param, dur_pred, pitch_pred, variance_pred))

            filename = f"{title}-{str(run).zfill(3)}.ds" if num_runs > 1 else f"{title}.ds"
            save_path = out_dir / filename
            with open(save_path, "w", encoding="utf8") as f:
                print(f"| save params: {save_path}")
                json.dump(results, f, ensure_ascii=False, indent=2)
