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

            def build_model(self):
                return DiffSingerVariance(self.hp, vocab_size=len(self.phoneme_dictionary))

            def build_loss_fn(self):
                return make_variance_loss_fn(self.model)

            def build_datasets(self):
                d = self.hp["binary_data_dir"]
                return (
                    VarianceDataset(d, self.hp, "train"),
                    VarianceDataset(d, self.hp, "valid"),
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
