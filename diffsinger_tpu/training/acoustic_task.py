"""Acoustic training task (reference training/acoustic_task.py:70-242).

Provides the loss function consumed by the generic SPMD train step and the
batch collater contract (AcousticDataset.collater, acoustic_task.py:40-67).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from diffsinger_tpu.models.losses import aux_mel_loss, diffusion_loss, reflow_loss
from diffsinger_tpu.models.toplevel import VARIANCE_CHECKLIST, DiffSingerAcoustic


def required_variances(hp: dict) -> list:
    return [v for v in VARIANCE_CHECKLIST if hp.get(f"use_{v}_embed", False)]


def encoder_kwargs_from_batch(hp: dict, batch: Dict) -> Dict:
    """The conditioning kwargs the acoustic encoder needs from a collated
    batch (spk/lang ids, key-shift/speed aug embeds, variance curves) —
    shared by the training loss and validation inference so both paths feed
    every enabled embed."""
    kwargs = {}
    if hp.get("use_spk_id", False):
        kwargs["spk_embed_id"] = batch["spk_ids"]
    if hp.get("use_lang_id", False):
        kwargs["languages"] = batch["languages"]
    if hp.get("use_key_shift_embed", False):
        kwargs["key_shift"] = batch["key_shift"]
    if hp.get("use_speed_embed", False):
        kwargs["speed"] = batch["speed"]
    variances = {v: batch[v] for v in required_variances(hp)}
    if variances:
        kwargs["variances"] = variances
    return kwargs


class AcousticTask:
    """Acoustic training task; see diffsinger_tpu.training.base_task.BaseTask."""

    category = "acoustic"

    def __new__(cls, hp: dict):
        from diffsinger_tpu.data.dataset import AcousticDataset
        from diffsinger_tpu.training.base_task import BaseTask

        class _Task(BaseTask):
            category = "acoustic"

            def build_model(self, dtype=None):
                return DiffSingerAcoustic(
                    self.hp,
                    vocab_size=len(self.phoneme_dictionary),
                    out_dims=self.hp["audio_num_mel_bins"],
                    dtype=dtype,
                )

            def build_loss_fn(self, model):
                return make_acoustic_loss_fn(model)

            def build_datasets(self):
                d = self.hp["binary_data_dir"]
                return (
                    AcousticDataset(d, self.hp, "train"),
                    AcousticDataset(d, self.hp, "valid"),
                )

            def validation_extras(self, state, valid_ds, batch, metrics):
                """Mel figures + vocoded audio for the first num_valid_plots items
                (reference training/acoustic_task.py:179-242)."""
                import jax as _jax
                import numpy as _np

                hp = self.hp
                indices = batch.get("indices", [])
                if not any(i < hp.get("num_valid_plots", 10) for i in indices):
                    return
                if not hasattr(self, "_jit_infer"):
                    # fp32 eval model; jax.jit caches per (bucket shape,
                    # kwarg-structure) signature
                    em = self.eval_model
                    self._jit_infer = _jax.jit(
                        lambda p, rng, tokens, mel2ph, f0, mel, kw: em.forward_infer(
                            p, rng, tokens, mel2ph, f0, gt_mel=mel, **kw
                        )
                    )
                out = self._jit_infer(
                    state.params, _jax.random.PRNGKey(0),
                    batch["tokens"], batch["mel2ph"], batch["f0"], batch["mel"],
                    # every enabled conditioning embed (spk/lang/key_shift/
                    # speed/variances) — inferring without them crashes the
                    # encoder at the first validation of an augmented config
                    encoder_kwargs_from_batch(hp, batch),
                )
                if not hasattr(self, "_vocoder"):
                    self._vocoder = None
                    if hp.get("val_with_vocoder", True):
                        try:
                            from diffsinger_tpu.vocoders.registry import get_vocoder_cls

                            self._vocoder = get_vocoder_cls(hp)(hp)
                        except Exception as e:
                            print(f"| validation vocoder unavailable: {e}")
                from diffsinger_tpu.utils.plot import spec_to_figure
                from diffsinger_tpu.training.train_state import optimizer_step

                # figures align with the validation/* scalars, which log at
                # the applied-update count (state.step counts micro-batches
                # under gradient accumulation)
                step = optimizer_step(state)
                for j, data_idx in enumerate(indices):
                    if data_idx >= hp.get("num_valid_plots", 10):
                        continue
                    mel_len = valid_ds.metadata["mel"][data_idx]
                    gt = _np.asarray(batch["mel"][j][:mel_len])
                    pred = _np.asarray(out.diff_out[j][:mel_len])
                    spec_cat = _np.concatenate(
                        [_np.abs(pred - gt) + hp.get("mel_vmin", -14), gt, pred], axis=-1
                    )
                    self.logger.add_figure(
                        f"diffmel_{data_idx}",
                        spec_to_figure(spec_cat, hp.get("mel_vmin", -14), hp.get("mel_vmax", 4)),
                        step,
                    )
                    if out.aux_out is not None:
                        aux = _np.asarray(out.aux_out[j][:mel_len])
                        self.logger.add_figure(
                            f"auxmel_{data_idx}",
                            spec_to_figure(
                                _np.concatenate([_np.abs(aux - gt) + hp.get("mel_vmin", -14), gt, aux], -1),
                                hp.get("mel_vmin", -14), hp.get("mel_vmax", 4),
                            ),
                            step,
                        )
                    if self._vocoder is not None:
                        f0 = _np.asarray(batch["f0"][j][:mel_len])
                        wav = self._vocoder.spec2wav(pred, f0=f0)
                        self.logger.add_audio(f"diff_{data_idx}", wav, step,
                                              hp["audio_sample_rate"])

        return _Task(hp)


def make_acoustic_loss_fn(model: DiffSingerAcoustic):
    """loss_fn(params, batch, rng) -> (loss, metrics) for the acoustic model
    (run_model semantics, acoustic_task.py:119-169)."""
    hp = model.hp
    diffusion_type = hp.get("diffusion_type", "ddpm")
    use_shallow = hp.get("use_shallow_diffusion", False)
    shallow_args = hp.get("shallow_diffusion_args", {}) if use_shallow else {}
    if use_shallow and not (shallow_args.get("train_aux_decoder", True)
                            or shallow_args.get("train_diffusion", True)):
        raise ValueError(
            "shallow_diffusion_args: train_aux_decoder and train_diffusion "
            "are both false — nothing would train")
    lambda_aux = hp.get("lambda_aux_mel_loss", 0.2)
    loss_type = hp.get("main_loss_type", "l2")
    log_norm = hp.get("main_loss_log_norm", False)

    def loss_fn(params, batch: Dict, rng: jax.Array):
        kwargs = encoder_kwargs_from_batch(hp, batch)

        aux_out, diff_out = model.forward_train(
            params, rng, batch["tokens"], batch["mel2ph"], batch["f0"], batch["mel"], **kwargs
        )
        nonpadding = (batch["mel2ph"] > 0).astype(jnp.float32)
        losses = {}
        if aux_out is not None:
            norm_gt = model.spec_transform.norm(batch["mel"])
            losses["aux_mel_loss"] = lambda_aux * aux_mel_loss(aux_out, norm_gt, nonpadding)
        if diff_out is not None:  # None when train_diffusion: false (staged)
            pred, target, t = diff_out
            if diffusion_type == "ddpm":
                losses["mel_loss"] = diffusion_loss(pred, target, nonpadding, loss_type=loss_type)
            else:
                losses["mel_loss"] = reflow_loss(
                    pred, target, t, nonpadding, loss_type=loss_type, log_norm=log_norm
                )
        total = sum(losses.values())
        return total, losses

    return loss_fn
