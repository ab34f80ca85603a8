"""Training losses (reference modules/losses/: diff_loss.py, reflow_loss.py,
dur_loss.py), as pure JAX functions over flat [B, T, D] tensors.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(err: jnp.ndarray, nonpadding: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over non-padded positions. ``nonpadding``: [B, T] float or None."""
    if nonpadding is None:
        return err.mean()
    mask = nonpadding[:, :, None]
    return (err * mask).sum() / jnp.maximum(mask.sum() * err.shape[-1], 1.0)


def diffusion_loss(
    x_recon: jnp.ndarray,
    noise: jnp.ndarray,
    nonpadding: Optional[jnp.ndarray] = None,
    loss_type: str = "l2",
) -> jnp.ndarray:
    """Epsilon-prediction loss (diff_loss.py:5-34). Inputs are cast to fp32
    so bf16-compute training reduces losses in full precision (the mixed-
    precision analogue of the reference's autocast behavior)."""
    x_recon = x_recon.astype(jnp.float32)
    noise = noise.astype(jnp.float32)
    if loss_type == "l1":
        err = jnp.abs(x_recon - noise)
    elif loss_type == "l2":
        err = jnp.square(x_recon - noise)
    else:
        raise NotImplementedError(loss_type)
    return _masked_mean(err, nonpadding)


def reflow_loss(
    v_pred: jnp.ndarray,
    v_gt: jnp.ndarray,
    t: jnp.ndarray,
    nonpadding: Optional[jnp.ndarray] = None,
    loss_type: str = "l2",
    log_norm: bool = False,
) -> jnp.ndarray:
    """Velocity-prediction loss with optional logit-normal time weighting
    (reflow_loss.py:6-50): w(t) = 1/(eps + sqrt(2*pi)*t*(1-t)) * exp(-0.5*logit(t)^2),
    normalized to mean 1 over the batch. fp32 reduction (see diffusion_loss)."""
    v_pred = v_pred.astype(jnp.float32)
    v_gt = v_gt.astype(jnp.float32)
    t = t.astype(jnp.float32)
    if loss_type == "l1":
        err = jnp.abs(v_pred - v_gt)
    elif loss_type == "l2":
        err = jnp.square(v_pred - v_gt)
    else:
        raise NotImplementedError(loss_type)
    if log_norm:
        eps = 1e-7
        t = jnp.clip(t, eps, 1 - eps)
        w = 1.0 / (eps + jnp.sqrt(2 * jnp.pi) * t * (1 - t)) * jnp.exp(
            -0.5 * jnp.square(jnp.log(t / (1 - t)))
        )
        w = w / w.mean()
        err = err * w[:, None, None]
    return _masked_mean(err, nonpadding)


def dur_loss(
    dur_pred_log: jnp.ndarray,
    dur_gt: jnp.ndarray,
    ph2word: jnp.ndarray,
    nonpadding: jnp.ndarray,
    *,
    offset: float = 1.0,
    loss_type: str = "mse",
    lambda_pdur: float = 0.3,
    lambda_wdur: float = 1.0,
    lambda_sdur: float = 3.0,
) -> jnp.ndarray:
    """Log-domain duration loss on phoneme, word, and sentence levels
    (dur_loss.py:6-56).

    :param dur_pred_log: [B, T_ph] raw predictor output (log domain)
    :param dur_gt: [B, T_ph] linear-domain target durations (frames)
    :param ph2word: [B, T_ph] 1-based word ids
    :param nonpadding: [B, T_ph] float mask
    """
    dur_pred_log = dur_pred_log.astype(jnp.float32)
    if loss_type == "mse":
        err_fn = lambda a, b: jnp.square(a - b)
    elif loss_type == "huber":
        err_fn = lambda a, b: jnp.where(
            jnp.abs(a - b) < 1.0, 0.5 * jnp.square(a - b), jnp.abs(a - b) - 0.5
        )
    else:
        raise NotImplementedError(loss_type)

    dur_gt = dur_gt.astype(jnp.float32) * nonpadding
    log_gt = jnp.log(dur_gt + offset)
    pdur = _weighted(err_fn(dur_pred_log, log_gt), nonpadding)

    # linear-domain predictions for word/sentence aggregation; clamp to >=0
    # like the reference's dur_pred.clamp(min=0.) ("clip to avoid NaN loss"):
    # exp(log_pred)-offset can sum below -offset, making log(wdur_pred+offset)
    # a log of a negative number (dur_loss.py:30-36).
    dur_pred = jnp.clip(jnp.exp(dur_pred_log) - offset, 0.0, None) * nonpadding
    b, t_ph = ph2word.shape
    t_w = t_ph  # word count bounded by phoneme count
    idx = jnp.arange(b)[:, None]
    wdur_pred = jnp.zeros((b, t_w + 1), jnp.float32).at[idx, ph2word].add(dur_pred)[:, 1:]
    wdur_gt = jnp.zeros((b, t_w + 1), jnp.float32).at[idx, ph2word].add(dur_gt)[:, 1:]
    word_nonpadding = (wdur_gt > 0).astype(jnp.float32)
    wdur = _weighted(
        err_fn(jnp.log(wdur_pred + offset), jnp.log(wdur_gt + offset)), word_nonpadding
    )

    sdur_pred = dur_pred.sum(axis=1)
    sdur_gt = dur_gt.sum(axis=1)
    # mean over REAL rows only: pad_batch_rows' duplicate rows have an all-
    # zero mask (sdur error exactly 0) and must not dilute the sentence term
    # (the reference's plain .mean() is identical on unpadded batches)
    row_valid = (nonpadding.sum(axis=1) > 0).astype(jnp.float32)
    sdur_err = err_fn(jnp.log(sdur_pred + offset), jnp.log(sdur_gt + offset))
    sdur = (sdur_err * row_valid).sum() / jnp.maximum(row_valid.sum(), 1.0)

    return lambda_pdur * pdur + lambda_wdur * wdur + lambda_sdur * sdur


def _weighted(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return (err * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def aux_mel_loss(aux_out: jnp.ndarray, norm_gt_mel: jnp.ndarray,
                 nonpadding: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """L1 between the aux decoder's normalized output and the normalized gt mel
    (aux loss registered per AUX_LOSSES['convnext'] = L1). fp32 reduction."""
    err = jnp.abs(aux_out.astype(jnp.float32) - norm_gt_mel.astype(jnp.float32))
    return _masked_mean(err, nonpadding)
