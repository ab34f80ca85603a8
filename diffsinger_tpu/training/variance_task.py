"""Variance training task (reference training/variance_task.py:83-337):
loss function with random retake masks, over the dur/pitch/variance branches.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from diffsinger_tpu.models.losses import diffusion_loss, dur_loss, reflow_loss
from diffsinger_tpu.models.toplevel import DiffSingerVariance, variance_prediction_list


def random_retake_masks(rng: jax.Array, b: int, t: int) -> jnp.ndarray:
    """Retake masks (variance_task.py:74-80): 1/4 of items fully retaken,
    plus a random continuous span per item (~1/3 frames) -> ~1/2 overall."""
    rng_b, rng_lo, rng_hi = jax.random.split(rng, 3)
    b_masks = jax.random.randint(rng_b, (b, 1), 0, 4) == 0
    bounds = jnp.sort(
        jnp.stack(
            [
                jax.random.randint(rng_lo, (b,), 0, t + 1),
                jax.random.randint(rng_hi, (b,), 0, t + 1),
            ],
            axis=1,
        ),
        axis=1,
    )
    pos = jnp.arange(t)[None, :]
    t_masks = (pos >= bounds[:, :1]) & (pos < bounds[:, 1:])
    return b_masks | t_masks


class VarianceTask:
    """Variance training task; see diffsinger_tpu.training.base_task.BaseTask."""

    category = "variance"

    def __new__(cls, hp: dict):
        from diffsinger_tpu.data.dataset import VarianceDataset
        from diffsinger_tpu.training.base_task import BaseTask

        class _Task(BaseTask):
            category = "variance"

            def build_model(self, dtype=None):
                return DiffSingerVariance(
                    self.hp, vocab_size=len(self.phoneme_dictionary), dtype=dtype
                )

            def build_loss_fn(self, model):
                return make_variance_loss_fn(model)

            def build_datasets(self):
                d = self.hp["binary_data_dir"]
                return (
                    VarianceDataset(d, self.hp, "train"),
                    VarianceDataset(d, self.hp, "valid"),
                )

            def validation_extras(self, state, valid_ds, batch, metrics):
                """Objective metrics + dur/pitch/curve figures
                (reference training/variance_task.py:251-337)."""
                import jax as _jax
                import jax.numpy as _jnp
                import numpy as _np

                from diffsinger_tpu.models.metrics import (
                    MetricState, PhonemeDurationAccuracy, R2State, RawCurveAccuracy,
                    RawCurveR2Score, RhythmCorrectness,
                )
                from diffsinger_tpu.utils.plot import curve_to_figure, dur_to_figure, pitch_note_to_figure

                hp = self.hp
                indices = batch.get("indices", [])
                var_list = [v for v in ("energy", "breathiness", "voicing", "tension")
                            if hp.get(f"predict_{v}", False)]
                if not hasattr(self, "_jit_infer"):
                    # fp32 eval model; jax.jit caches per (bucket shape,
                    # kwarg-structure / None-pattern) signature
                    em = self.eval_model
                    self._jit_infer = _jax.jit(
                        lambda p, rng, tokens, midi, ph2word, base_pitch, kw:
                        em.forward_infer(
                            p, rng, tokens, midi, ph2word, base_pitch, **kw)
                    )

                def _j(x):
                    # midi/ph2word are absent when predict_dur is false
                    # (dataset.py collater) — None must pass through, not
                    # reach jnp.asarray
                    return _jnp.asarray(x) if x is not None else None

                # every enabled conditioning input (spk/lang ids, melody-
                # encoder note arrays) — inferring without them crashes the
                # encoder at the first validation of such configs
                infer_kwargs = {
                    k: _j(batch.get(src))
                    for k, src in (
                        ("ph_dur", "ph_dur"), ("mel2ph", "mel2ph"),
                        ("spk_id", "spk_ids"), ("languages", "languages"),
                        ("note_midi", "note_midi"), ("note_rest", "note_rest"),
                        ("note_dur", "note_dur"), ("note_glide", "note_glide"),
                        ("mel2note", "mel2note"),
                    )
                    if batch.get(src) is not None
                }
                if var_list and batch.get("pitch") is not None:
                    infer_kwargs["pitch"] = _j(batch["pitch"])
                dur_pred, pitch_pred, var_pred = self._jit_infer(
                    state.params, _jax.random.PRNGKey(0),
                    _j(batch["tokens"]), _j(batch.get("midi")),
                    _j(batch.get("ph2word")), _j(batch.get("base_pitch")),
                    infer_kwargs,
                )
                from diffsinger_tpu.training.train_state import optimizer_step

                step = optimizer_step(state)
                if not hasattr(self, "_metric_states"):
                    self._metric_states = {}
                ms = self._metric_states
                nonpad = _jnp.asarray(batch["tokens"] > 0)
                if dur_pred is not None and hp["predict_dur"]:
                    ph2word = _jnp.asarray(batch["ph2word"])
                    gt = _jnp.asarray(batch["ph_dur"]).astype(_jnp.float32)
                    pred = _jnp.round(dur_pred).astype(_jnp.float32)
                    ms["rhythm_corr"] = RhythmCorrectness(0.05).update(
                        ms.get("rhythm_corr", MetricState()), pred, gt, ph2word, nonpad)
                    ms["ph_dur_acc"] = PhonemeDurationAccuracy(0.2).update(
                        ms.get("ph_dur_acc", MetricState()), pred, gt, ph2word, nonpad)
                if pitch_pred is not None and batch.get("pitch") is not None:
                    mask = _jnp.asarray(batch["mel2ph"] > 0) & ~_jnp.asarray(batch["uv"])
                    # forward_infer returns the pitch delta; absolute = base + delta
                    pred_abs = _jnp.asarray(batch["base_pitch"]) + pitch_pred
                    gt_pitch = _jnp.asarray(batch["pitch"])
                    ms["pitch_acc"] = RawCurveAccuracy(0.5).update(
                        ms.get("pitch_acc", MetricState()), pred_abs, gt_pitch, mask)
                    ms["pitch_r2"] = RawCurveR2Score().update(
                        ms.get("pitch_r2", R2State()), pred_abs, gt_pitch, mask)
                for v in var_list:
                    if v in (var_pred or {}):
                        mask = _jnp.asarray(batch["mel2ph"] > 0)
                        ms[f"{v}_r2"] = RawCurveR2Score().update(
                            ms.get(f"{v}_r2", R2State()), var_pred[v], _jnp.asarray(batch[v]), mask)
                # streaming states only UPDATE here; base_task logs each
                # metric's final value once after the last validation batch
                # (per-batch logging would average prefix values — a biased
                # mean — and rewrite the same TB step repeatedly)

                for j, data_idx in enumerate(indices):
                    if data_idx >= hp.get("num_valid_plots", 10):
                        continue
                    if dur_pred is not None and hp["predict_dur"]:
                        n_ph = int(valid_ds.metadata["tokens"][data_idx])
                        self.logger.add_figure(
                            f"dur_{data_idx}",
                            dur_to_figure(_np.asarray(batch["ph_dur"][j][:n_ph]),
                                          _np.asarray(dur_pred[j][:n_ph]),
                                          [""] * n_ph),
                            step,
                        )
                    if pitch_pred is not None:
                        t = int(valid_ds.metadata["pitch"][data_idx])
                        self.logger.add_figure(
                            f"pitch_{data_idx}",
                            pitch_note_to_figure(
                                _np.asarray(batch["pitch"][j][:t]),
                                _np.asarray(batch["base_pitch"][j][:t]) + _np.asarray(pitch_pred[j][:t]),
                            ),
                            step,
                        )
                    for v in var_list:
                        if v in (var_pred or {}):
                            t = int(valid_ds.metadata[v][data_idx])
                            self.logger.add_figure(
                                f"{v}_{data_idx}",
                                curve_to_figure(_np.asarray(batch[v][j][:t]),
                                                _np.asarray(var_pred[v][j][:t])),
                                step,
                            )

        return _Task(hp)


def make_variance_loss_fn(model: DiffSingerVariance):
    """loss_fn(params, batch, rng) -> (loss, metrics)
    (run_model semantics, variance_task.py:162-249)."""
    hp = model.hp
    var_list = variance_prediction_list(hp)
    diffusion_type = hp.get("diffusion_type", "ddpm")
    loss_type = hp.get("main_loss_type", "l2")
    log_norm = hp.get("main_loss_log_norm", False)
    dur_hp = hp.get("dur_prediction_args", {})

    def loss_fn(params, batch: Dict, rng: jax.Array):
        b = batch["tokens"].shape[0]
        rng_model, rng_p, rng_v = jax.random.split(rng, 3)
        mel2ph = batch.get("mel2ph")
        pitch_retake = None
        variance_retake = None
        if mel2ph is not None:
            t = mel2ph.shape[1]
            if hp["predict_pitch"]:
                pitch_retake = random_retake_masks(rng_p, b, t)
            if var_list:
                variance_retake = {
                    v: random_retake_masks(jax.random.fold_in(rng_v, i), b, t)
                    for i, v in enumerate(var_list)
                }

        dur_pred, pitch_out, var_out = model.forward_train(
            params, rng_model,
            batch["tokens"], batch.get("midi"), batch.get("ph2word"), batch["ph_dur"],
            mel2ph, batch.get("base_pitch"), batch.get("pitch"),
            {v: batch[v] for v in var_list},
            pitch_retake=pitch_retake, variance_retake=variance_retake,
            spk_id=batch.get("spk_ids"), languages=batch.get("languages"),
            note_midi=batch.get("note_midi"), note_rest=batch.get("note_rest"),
            note_dur=batch.get("note_dur"), note_glide=batch.get("note_glide"),
            mel2note=batch.get("mel2note"),
        )
        losses = {}
        if dur_pred is not None and hp["predict_dur"]:
            nonpadding_ph = (batch["tokens"] > 0).astype(jnp.float32)
            losses["dur_loss"] = hp.get("lambda_dur_loss", 1.0) * dur_loss(
                dur_pred, batch["ph_dur"], batch["ph2word"], nonpadding_ph,
                offset=dur_hp.get("log_offset", 1.0),
                loss_type=dur_hp.get("loss_type", "mse"),
                lambda_pdur=dur_hp.get("lambda_pdur_loss", 0.3),
                lambda_wdur=dur_hp.get("lambda_wdur_loss", 1.0),
                lambda_sdur=dur_hp.get("lambda_sdur_loss", 3.0),
            )
        nonpadding = (mel2ph > 0).astype(jnp.float32) if mel2ph is not None else None
        for name, out, lam in (
            ("pitch_loss", pitch_out, hp.get("lambda_pitch_loss", 1.0)),
            ("var_loss", var_out, hp.get("lambda_var_loss", 1.0)),
        ):
            if out is None:
                continue
            pred, target, t = out
            if diffusion_type == "ddpm":
                losses[name] = lam * diffusion_loss(pred, target, nonpadding, loss_type=loss_type)
            else:
                losses[name] = lam * reflow_loss(
                    pred, target, t, nonpadding, loss_type=loss_type, log_norm=log_norm
                )
        total = sum(losses.values())
        return total, losses

    return loss_fn
