"""Top-level DiffSinger models (reference modules/toplevel.py).

Architecture note (TPU-first): parameters live in Flax modules
(:class:`AcousticModule` / :class:`VarianceModule`) which expose *pure methods*
(encode / denoise / aux). The diffusion & flow algorithms are pure functions in
:mod:`diffsinger_tpu.core` that close over ``module.apply``; the wrapper classes
here assemble full training/inference computations that callers jit (or pjit)
as single programs — sampler loops are `lax.scan`, never Python-side loops.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from diffsinger_tpu.core import ddpm as ddpm_core
from diffsinger_tpu.core import reflow as reflow_core
from diffsinger_tpu.core.schedule import DiffusionSchedule
from diffsinger_tpu.core.spec_transform import (
    MultiVarianceTransform,
    PitchTransform,
    SpecTransform,
)
from diffsinger_tpu.models import compat
from diffsinger_tpu.models.acoustic_encoder import FastSpeech2Acoustic
from diffsinger_tpu.models.aux_decoder import AuxDecoderAdaptor
from diffsinger_tpu.models.backbones import build_backbone, precompute_cond_projections
from diffsinger_tpu.models.commons import Embedding, Linear
from diffsinger_tpu.models.variance_encoder import FastSpeech2Variance, MelodyEncoder
from diffsinger_tpu.utils.seq import gather_frames, length_regulator, rhythm_regulator

VARIANCE_CHECKLIST = ["energy", "breathiness", "voicing", "tension"]


_warned_max_beta = False


def _warn_unread_max_beta(hp: dict) -> None:
    """One-time notice that max_beta is accepted but unread (reference
    parity — see the schedule construction below).  DDPM checkpoints trained
    by THIS codebase before 2026-08 used the config endpoint (0.02 by
    default); their samplers now run the reference's fixed 0.01 schedule."""
    global _warned_max_beta
    mb = hp.get("max_beta")
    if (_warned_max_beta or mb is None
            or hp.get("schedule_type", "linear") != "linear"
            or abs(float(mb) - 0.01) < 1e-12):
        return
    _warned_max_beta = True
    import warnings

    warnings.warn(
        f"max_beta={mb} is accepted but UNREAD: the reference never forwards "
        "it into its beta schedule, so for checkpoint/sample parity the "
        "linear schedule always ends at 0.01. DDPM checkpoints trained by "
        "this codebase before 2026-08 used the configured endpoint and need "
        "retraining or a schedule override for exact self-parity."
    )


def variance_prediction_list(hp: dict) -> list:
    return [v for v in VARIANCE_CHECKLIST if hp.get(f"predict_{v}", False)]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShallowDiffusionOutput:
    aux_out: Optional[jnp.ndarray] = None
    diff_out: Optional[jnp.ndarray] = None


# ---------------------------------------------------------------------------
# Acoustic
# ---------------------------------------------------------------------------


class AcousticModule(nn.Module):
    """Parameter container: fs2 encoder + aux decoder + denoiser backbone."""

    hp: FrozenDict
    vocab_size: int
    out_dims: int
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        hp = self.hp
        self.fs2 = FastSpeech2Acoustic.from_hparams(hp, self.vocab_size, dtype=self.dtype)
        if hp.get("use_shallow_diffusion", False):
            shallow = hp["shallow_diffusion_args"]
            self.aux_decoder = AuxDecoderAdaptor(
                in_dims=hp["hidden_size"],
                out_dims=self.out_dims,
                num_feats=1,
                spec_min=tuple(hp["spec_min"]),
                spec_max=tuple(hp["spec_max"]),
                aux_decoder_arch=shallow["aux_decoder_arch"],
                aux_decoder_args=dict(shallow["aux_decoder_args"]),
                dtype=self.dtype,
            )
        backbone_type = compat.get_backbone_type(hp)
        backbone_args = compat.get_backbone_args(hp, backbone_type)
        self.denoiser = build_backbone(
            self.out_dims, 1, backbone_type, backbone_args,
            cond_dims=hp["hidden_size"], dtype=self.dtype,
            remat=hp.get("recompute_grads", False),
        )

    def encode(self, txt_tokens, mel2ph, f0, **kwargs) -> jnp.ndarray:
        return self.fs2(txt_tokens, mel2ph, f0, **kwargs)

    def denoise(self, x, t, cond, cond_proj=None) -> jnp.ndarray:
        return self.denoiser(x, t, cond, cond_proj=cond_proj)

    def aux(self, cond, infer: bool = True, deterministic: bool = True) -> jnp.ndarray:
        return self.aux_decoder(cond, infer=infer, deterministic=deterministic)

    def __call__(self, txt_tokens, mel2ph, f0, **kwargs):
        """Init-path only: touches every submodule so init() creates all params."""
        cond = self.encode(txt_tokens, mel2ph, f0, **kwargs)
        aux = None
        if self.hp.get("use_shallow_diffusion", False):
            aux = self.aux(cond, infer=False)
        b, t = mel2ph.shape
        x = jnp.zeros((b, t, self.out_dims), dtype=jnp.float32)
        out = self.denoise(x, jnp.zeros((b,), jnp.float32), cond)
        return cond, aux, out


class DiffSingerAcoustic:
    """Orchestrates the acoustic model: shallow aux + diffusion/reflow core
    (reference modules/toplevel.py:32-122). Pure given (params, rng, inputs)."""

    category = "acoustic"

    def __init__(self, hp: dict, vocab_size: int, out_dims: int, dtype=None):
        self.hp = dict(hp)
        self.out_dims = out_dims
        self.module = AcousticModule(
            hp=FrozenDict(hp), vocab_size=vocab_size, out_dims=out_dims, dtype=dtype
        )
        self.spec_transform = SpecTransform(hp["spec_min"], hp["spec_max"], out_dims)
        self.diffusion_type = hp.get("diffusion_type", "ddpm")
        self.use_shallow_diffusion = hp.get("use_shallow_diffusion", False)
        self.timesteps = hp.get("timesteps", 1000)
        self.k_step = hp.get("K_step", self.timesteps) if self.use_shallow_diffusion else self.timesteps
        self.t_start = hp.get("T_start", 0.0) if self.use_shallow_diffusion else 0.0
        self.time_scale_factor = hp.get("time_scale_factor", 1000)
        if self.diffusion_type == "ddpm":
            # The reference never forwards hparams['max_beta'] into the β
            # schedule — linear_beta_schedule always runs at its default 0.01
            # (ddpm.py:28,67; GaussianDiffusion is constructed without betas,
            # toplevel.py:60-69) — so checkpoint/sample parity requires
            # ignoring the config key the same way.
            _warn_unread_max_beta(hp)
            self.schedule = DiffusionSchedule.create(
                hp.get("schedule_type", "linear"), self.timesteps
            )
        elif self.diffusion_type == "reflow":
            self.schedule = None
        else:
            raise NotImplementedError(self.diffusion_type)

    def init(self, rng: jax.Array, t_txt: int = 16, t_mel: int = 64):
        """Initialize all parameters with tiny dummy shapes."""
        hp = self.hp
        kwargs = {}
        if hp.get("use_spk_id", False):
            kwargs["spk_embed_id"] = jnp.zeros((1,), jnp.int32)
        if hp.get("use_lang_id", False):
            kwargs["languages"] = jnp.zeros((1, t_txt), jnp.int32)
        if hp.get("use_key_shift_embed", False):
            kwargs["key_shift"] = jnp.zeros((1, t_mel), jnp.float32)
        if hp.get("use_speed_embed", False):
            kwargs["speed"] = jnp.ones((1, t_mel), jnp.float32)
        variances = {
            v: jnp.zeros((1, t_mel), jnp.float32)
            for v in VARIANCE_CHECKLIST
            if hp.get(f"use_{v}_embed", False)
        }
        if variances:
            kwargs["variances"] = variances
        return self.module.init(
            rng,
            jnp.ones((1, t_txt), jnp.int32),
            jnp.ones((1, t_mel), jnp.int32),
            jnp.full((1, t_mel), 440.0, jnp.float32),
            **kwargs,
        )

    # --- forward passes -------------------------------------------------

    def forward_train(self, params, rng: jax.Array, txt_tokens, mel2ph, f0, gt_mel, **kwargs):
        """Training forward (toplevel.py:106-122): returns
        (aux_out_normed|None, (pred, target, t)) for the losses."""
        hp = self.hp
        rng_drop, rng_t, rng_noise = jax.random.split(rng, 3)
        cond = self.module.apply(
            params, txt_tokens, mel2ph, f0, deterministic=False,
            rngs={"dropout": rng_drop}, method="encode", **kwargs,
        )
        aux_out = None
        if self.use_shallow_diffusion and hp["shallow_diffusion_args"]["train_aux_decoder"]:
            g = hp["shallow_diffusion_args"]["aux_decoder_grad"]
            aux_cond = cond * g + jax.lax.stop_gradient(cond) * (1 - g)
            aux_out = self.module.apply(
                params, aux_cond, infer=False, deterministic=False,
                rngs={"dropout": rng_drop}, method="aux",
            )

        if self.use_shallow_diffusion and not hp["shallow_diffusion_args"].get(
                "train_diffusion", True):
            # staged training STEP 2 (reference docs/BestPractices.md "Train
            # auxiliary decoder and diffusion decoder separately"): the
            # sampler branch is excluded from the training graph; only the
            # aux L1 trains (usually with the encoder frozen via
            # frozen_params).
            return aux_out, None

        spec = self.spec_transform.norm(gt_mel)  # [B, T, M]
        b = spec.shape[0]

        def denoise(x, t):
            return self.module.apply(params, x, t, cond, method="denoise")

        if self.diffusion_type == "ddpm":
            t = jax.random.randint(rng_t, (b,), 0, self.k_step)
            x_noisy, noise = ddpm_core.p_losses_inputs(self.schedule, spec, t, rng_noise)
            pred = denoise(x_noisy, t.astype(jnp.float32))
            return aux_out, (pred, noise, t)
        else:
            t = self.t_start + (1.0 - self.t_start) * jax.random.uniform(rng_t, (b,))
            x_t, v_gt = reflow_core.p_losses_inputs(spec, t, rng_noise)
            v_pred = denoise(x_t, t * self.time_scale_factor)
            return aux_out, (v_pred, v_gt, t)

    def forward_infer(
        self, params, rng: jax.Array, txt_tokens, mel2ph, f0,
        *, steps: Optional[int] = None, depth: Optional[int] = None,
        t_start_infer: Optional[float] = None, gt_mel=None,
        noise: Optional[jnp.ndarray] = None, **kwargs,
    ) -> ShallowDiffusionOutput:
        """Inference forward (toplevel.py:93-105): aux draft + sampler."""
        from diffsinger_tpu.utils.profiling import trace_annotation

        hp = self.hp
        with trace_annotation("acoustic/encode"):
            cond = self.module.apply(params, txt_tokens, mel2ph, f0, method="encode", **kwargs)
        frame_mask = (mel2ph > 0).astype(jnp.float32)[:, :, None]

        aux_mel = None
        src_spec = None
        if self.use_shallow_diffusion:
            with trace_annotation("acoustic/aux_draft"):
                aux_mel = self.module.apply(params, cond, infer=True, method="aux") * frame_mask
            if gt_mel is not None and hp["shallow_diffusion_args"].get("val_gt_start", False):
                src_spec = self.spec_transform.norm(gt_mel)
            else:
                src_spec = self.spec_transform.norm(aux_mel)

        # the condition is step-invariant: hoist the per-layer projections out
        # of the sampler scan (see backbones.precompute_cond_projections)
        cond_projs = precompute_cond_projections(
            params["params"]["denoiser"], cond, dtype=self.module.dtype
        )

        def denoise(x, t):
            return self.module.apply(
                params, x, t, cond, cond_proj=cond_projs, method="denoise"
            )

        with trace_annotation("acoustic/sampler"):
            if self.diffusion_type == "ddpm":
                x = ddpm_core.inference(
                    denoise,
                    self.schedule,
                    jnp.zeros(cond.shape[:2] + (self.out_dims,)),
                    k_step=self.k_step,
                    depth=depth if depth is not None else hp.get("K_step_infer", self.k_step),
                    speedup=hp.get("diff_speedup", 10),
                    algorithm=hp.get("diff_accelerator", "ddim"),
                    rng=rng,
                    x_start=src_spec,
                    use_shallow_diffusion=self.use_shallow_diffusion,
                    noise=noise,
                )
            else:
                t0 = t_start_infer if t_start_infer is not None else hp.get("T_start_infer", self.t_start)
                x = reflow_core.inference(
                    denoise,
                    jnp.zeros(cond.shape[:2] + (self.out_dims,)),
                    t_start=t0,
                    steps=steps if steps is not None else hp.get("sampling_steps", 20),
                    algorithm=hp.get("sampling_algorithm", "euler"),
                    time_scale_factor=self.time_scale_factor,
                    rng=rng,
                    x_end=src_spec,
                    use_shallow_diffusion=self.use_shallow_diffusion,
                    noise=noise,
                )
        mel = self.spec_transform.denorm(x) * frame_mask
        return ShallowDiffusionOutput(aux_out=aux_mel, diff_out=mel)

    def forward_infer_dynamic(
        self, params, rng: Optional[jax.Array], txt_tokens, mel2ph, f0,
        *, depth, steps, noise: Optional[jnp.ndarray] = None, **kwargs,
    ) -> ShallowDiffusionOutput:
        """Deployment-contract inference: ``depth`` (f32 scalar) and ``steps``
        (i32 scalar) are runtime tensors, so one exported graph serves every
        depth/steps combination — the reference's deployed ONNX contract
        (deployment/modules/toplevel.py:83-102, rectified_flow.py:37-69,
        diffusion.py:107-155). ``noise`` overrides the PRNG draw (RNG-free
        ONNX export); otherwise ``rng`` is required."""
        hp = self.hp
        cond = self.module.apply(params, txt_tokens, mel2ph, f0, method="encode", **kwargs)
        frame_mask = (mel2ph > 0).astype(jnp.float32)[:, :, None]

        aux_mel = None
        src_spec = None
        if self.use_shallow_diffusion:
            aux_mel = self.module.apply(params, cond, infer=True, method="aux") * frame_mask
            src_spec = self.spec_transform.norm(aux_mel)

        if noise is None:
            noise = jax.random.normal(
                rng, cond.shape[:2] + (self.out_dims,), jnp.float32
            )

        cond_projs = precompute_cond_projections(
            params["params"]["denoiser"], cond, dtype=self.module.dtype
        )

        def denoise(x, t):
            return self.module.apply(
                params, x, t, cond, cond_proj=cond_projs, method="denoise"
            )

        if self.diffusion_type == "ddpm":
            x = ddpm_core.inference_dynamic(
                denoise, self.schedule, noise, depth=depth, steps=steps,
                k_step=self.k_step,
                x_start=src_spec if self.use_shallow_diffusion else None,
            )
        else:
            x = reflow_core.inference_dynamic(
                denoise, noise, depth=depth, steps=steps,
                t_start_min=self.t_start,
                time_scale_factor=self.time_scale_factor,
                x_end=src_spec if self.use_shallow_diffusion else None,
            )
        mel = self.spec_transform.denorm(x) * frame_mask
        return ShallowDiffusionOutput(aux_out=aux_mel, diff_out=mel)


# ---------------------------------------------------------------------------
# Variance
# ---------------------------------------------------------------------------


class VarianceModule(nn.Module):
    """Parameter container for the variance model (toplevel.py:125-197)."""

    hp: FrozenDict
    vocab_size: int
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        hp = self.hp
        h = hp["hidden_size"]
        self.predict_dur = hp["predict_dur"]
        self.predict_pitch = hp["predict_pitch"]
        self.var_list = variance_prediction_list(hp)
        if hp["use_spk_id"]:
            self.spk_embed = Embedding(hp["num_spk"], h)
        self.fs2 = FastSpeech2Variance.from_hparams(hp, self.vocab_size, dtype=self.dtype)

        if self.predict_pitch:
            pitch_hp = hp["pitch_prediction_args"]
            self.use_melody_encoder = hp.get("use_melody_encoder", False)
            if self.use_melody_encoder:
                self.melody_encoder = MelodyEncoder.from_hparams(hp, dtype=self.dtype)
                self.delta_pitch_embed = Linear(h)
            else:
                self.base_pitch_embed = Linear(h)
            self.pitch_retake_embed = Embedding(2, h)
            backbone_type = compat.get_backbone_type(hp, nested_config=pitch_hp)
            backbone_args = compat.get_backbone_args(pitch_hp, backbone_type)
            self.pitch_denoiser = build_backbone(
                pitch_hp["repeat_bins"], 1, backbone_type, backbone_args,
                cond_dims=h, dtype=self.dtype,
                remat=hp.get("recompute_grads", False),
            )
        if self.var_list:
            self.pitch_embed = Linear(h)
            self.variance_embeds = {v: Linear(h, name=f"variance_embeds_{v}") for v in self.var_list}
            var_hp = hp["variances_prediction_args"]
            backbone_type = compat.get_backbone_type(hp, nested_config=var_hp)
            backbone_args = compat.get_backbone_args(var_hp, backbone_type)
            repeat_bins = var_hp["total_repeat_bins"] // len(self.var_list)
            self.variance_denoiser = build_backbone(
                repeat_bins, len(self.var_list), backbone_type, backbone_args,
                cond_dims=h, dtype=self.dtype,
                remat=hp.get("recompute_grads", False),
            )

    # --- parameterized pieces, exposed as apply methods ---

    def encode(self, txt_tokens, midi, ph2word, ph_dur=None, word_dur=None,
               spk_id=None, ph_spk_mix_embed=None, languages=None, infer=True,
               deterministic=True):
        """fs2 encoder (+ token-level spk embed). Returns
        (encoder_out, dur_pred, spk_embed_frameless)."""
        if self.hp["use_spk_id"]:
            if ph_spk_mix_embed is not None:
                ph_spk = ph_spk_mix_embed
            else:
                ph_spk = self.spk_embed(spk_id)[:, None, :]
        else:
            ph_spk = None
        encoder_out, dur_pred = self.fs2(
            txt_tokens, midi, ph2word, ph_dur=ph_dur, word_dur=word_dur,
            spk_embed=ph_spk, languages=languages, infer=infer, deterministic=deterministic,
        )
        return encoder_out, dur_pred

    def frame_condition(self, encoder_out, mel2ph, spk_id=None, spk_mix_embed=None):
        condition = gather_frames(encoder_out, mel2ph)
        if self.hp["use_spk_id"]:
            spk = spk_mix_embed if spk_mix_embed is not None else self.spk_embed(spk_id)[:, None, :]
            condition = condition + spk
        return condition

    def melody_encode(self, note_midi, note_rest, note_dur, note_glide=None, deterministic=True):
        return self.melody_encoder(
            note_midi, note_rest, note_dur, glide=note_glide, deterministic=deterministic
        )

    def pitch_condition(
        self, condition, mel2ph, base_pitch, pitch=None, pitch_expr=None, pitch_retake=None,
        melody_frame=None, delta_pitch_in=None,
    ):
        """Pitch-branch conditioning (toplevel.py:239-278).

        ``pitch_retake`` may be None (generate from scratch -> all-retake).
        """
        pitch_cond = condition
        if melody_frame is not None:
            pitch_cond = pitch_cond + melody_frame
        retake_unset = pitch_retake is None
        if retake_unset:
            pitch_retake = jnp.ones_like(mel2ph, dtype=bool)
        if pitch_expr is None:
            retake_embed = self.pitch_retake_embed(pitch_retake.astype(jnp.int32))
        else:
            true_embed = self.pitch_retake_embed(jnp.ones((1, 1), jnp.int32))
            false_embed = self.pitch_retake_embed(jnp.zeros((1, 1), jnp.int32))
            expr = (pitch_expr * pitch_retake)[:, :, None]
            retake_embed = expr * true_embed + (1.0 - expr) * false_embed
        pitch_cond = pitch_cond + retake_embed
        if self.use_melody_encoder:
            if delta_pitch_in is None:
                delta_pitch_in = jnp.zeros_like(base_pitch)
            pitch_cond = pitch_cond + self.delta_pitch_embed(delta_pitch_in[:, :, None])
        else:
            if not retake_unset:
                base_pitch = base_pitch * pitch_retake + pitch * (~pitch_retake)
            pitch_cond = pitch_cond + self.base_pitch_embed(base_pitch[:, :, None])
        return pitch_cond, base_pitch

    def variance_condition(self, condition, pitch, variances: Dict, variance_retake: Optional[Dict]):
        """Variance-branch conditioning (toplevel.py:287-301)."""
        var_cond = condition + self.pitch_embed(pitch[:, :, None])
        if variance_retake is not None:
            for v_name in self.var_list:
                keep = (~variance_retake[v_name])[:, :, None]
                var_cond = var_cond + self.variance_embeds[v_name](
                    variances[v_name][:, :, None]
                ) * keep
        return var_cond

    def denoise_pitch(self, x, t, cond, cond_proj=None):
        return self.pitch_denoiser(x, t, cond, cond_proj=cond_proj)

    def denoise_variance(self, x, t, cond, cond_proj=None):
        return self.variance_denoiser(x, t, cond, cond_proj=cond_proj)

    def __call__(self, txt_tokens, midi, ph2word, ph_dur, mel2ph, base_pitch, pitch, variances):
        """Init-path: touch every parameterized branch."""
        hp = self.hp
        spk_id = jnp.zeros((txt_tokens.shape[0],), jnp.int32) if hp["use_spk_id"] else None
        encoder_out, dur_pred = self.encode(
            txt_tokens, midi, ph2word, ph_dur=ph_dur, spk_id=spk_id, infer=False,
            languages=jnp.zeros_like(txt_tokens) if hp.get("use_lang_id") else None,
        )
        condition = self.frame_condition(encoder_out, mel2ph, spk_id=spk_id)
        outs = [dur_pred]
        b, t_mel = mel2ph.shape
        if self.predict_pitch:
            melody_frame = None
            if self.use_melody_encoder:
                n = jnp.ones((b, 4), jnp.float32) * 60.0
                mel_out = self.melody_encode(
                    n, jnp.zeros((b, 4), bool), jnp.ones((b, 4), jnp.int32),
                    note_glide=jnp.zeros((b, 4), jnp.int32) if hp.get("use_glide_embed") else None,
                )
                melody_frame = gather_frames(mel_out, jnp.ones((b, t_mel), jnp.int32))
            pitch_cond, _ = self.pitch_condition(condition, mel2ph, base_pitch, pitch=pitch,
                                                 melody_frame=melody_frame)
            rb = hp["pitch_prediction_args"]["repeat_bins"]
            outs.append(self.denoise_pitch(
                jnp.zeros((b, t_mel, rb)), jnp.zeros((b,), jnp.float32), pitch_cond
            ))
        if self.var_list:
            var_cond = self.variance_condition(
                condition, pitch, variances, {v: jnp.zeros((b, t_mel), bool) for v in self.var_list}
            )
            total_rb = hp["variances_prediction_args"]["total_repeat_bins"]
            outs.append(self.denoise_variance(
                jnp.zeros((b, t_mel, total_rb)), jnp.zeros((b,), jnp.float32), var_cond
            ))
        return outs


class DiffSingerVariance:
    """Variance model orchestration (reference modules/toplevel.py:125-309)."""

    category = "variance"

    def __init__(self, hp: dict, vocab_size: int, dtype=None):
        self.hp = dict(hp)
        self.module = VarianceModule(hp=FrozenDict(hp), vocab_size=vocab_size, dtype=dtype)
        self.predict_dur = hp["predict_dur"]
        self.predict_pitch = hp["predict_pitch"]
        self.var_list = variance_prediction_list(hp)
        self.use_melody_encoder = hp.get("use_melody_encoder", False)
        self.diffusion_type = hp.get("diffusion_type", "ddpm")
        self.timesteps = hp.get("timesteps", 1000)
        self.k_step = hp.get("K_step", self.timesteps)
        self.time_scale_factor = hp.get("time_scale_factor", 1000)
        if self.diffusion_type == "ddpm":
            # max_beta deliberately not forwarded — reference parity (see the
            # acoustic model's schedule construction above)
            _warn_unread_max_beta(hp)
            self.schedule = DiffusionSchedule.create(
                hp.get("schedule_type", "linear"), self.timesteps
            )
        else:
            self.schedule = None

        if self.predict_pitch:
            p = hp["pitch_prediction_args"]
            self.pitch_transform = PitchTransform(
                vmin=p["pitd_norm_min"], vmax=p["pitd_norm_max"],
                cmin=p["pitd_clip_min"], cmax=p["pitd_clip_max"],
                repeat_bins=p["repeat_bins"],
            )
        if self.var_list:
            ranges, clamps = [], []
            for v in self.var_list:
                if v == "tension":
                    ranges.append((hp["tension_logit_min"], hp["tension_logit_max"]))
                    clamps.append((hp["tension_logit_min"], hp["tension_logit_max"]))
                else:
                    ranges.append((hp[f"{v}_db_min"], hp[f"{v}_db_max"]))
                    clamps.append((hp[f"{v}_db_min"], 0.0))
            total_rb = hp["variances_prediction_args"]["total_repeat_bins"]
            self.variance_transform = MultiVarianceTransform(
                ranges=ranges, clamps=clamps, repeat_bins=total_rb // len(self.var_list)
            )

    def init(self, rng: jax.Array, t_txt: int = 16, t_mel: int = 64):
        b = 1
        return self.module.init(
            rng,
            jnp.ones((b, t_txt), jnp.int32),
            jnp.full((b, t_txt), 60, jnp.int32),
            jnp.cumsum(jnp.ones((b, t_txt), jnp.int32), axis=1),  # ph2word 1..T
            jnp.ones((b, t_txt), jnp.float32) * 4,
            jnp.ones((b, t_mel), jnp.int32),
            jnp.full((b, t_mel), 60.0, jnp.float32),
            jnp.full((b, t_mel), 60.0, jnp.float32),
            {v: jnp.zeros((b, t_mel), jnp.float32) for v in self.var_list},
        )

    # ------------------------------------------------------------------
    # Samplers operate on flat [B, T, F*R]; (un)flattening happens only at the
    # transform boundary (SpecTransform.flatten/unflatten).
    def _denoise_fns(self, params):
        def pitch_fn(x, t, cond):
            return self.module.apply(params, x, t, cond, method="denoise_pitch")

        def var_fn(x, t, cond):
            return self.module.apply(params, x, t, cond, method="denoise_variance")

        return pitch_fn, var_fn

    def forward_train(
        self, params, rng: jax.Array, txt_tokens, midi, ph2word, ph_dur, mel2ph,
        base_pitch, pitch, variances: Dict, pitch_retake=None, variance_retake: Dict = None,
        spk_id=None, languages=None, note_midi=None, note_rest=None, note_dur=None,
        note_glide=None, mel2note=None,
    ):
        """Training forward (toplevel.py:198-309 train path). Returns
        (dur_pred_log, pitch_(pred,target,t)|None, var_(pred,target,t)|None)."""
        rng_drop, rng_tp, rng_np, rng_tv, rng_nv = jax.random.split(rng, 5)
        rngs = {"dropout": rng_drop}
        encoder_out, dur_pred = self.module.apply(
            params, txt_tokens, midi, ph2word, ph_dur=ph_dur, spk_id=spk_id,
            languages=languages, infer=False, deterministic=False, rngs=rngs, method="encode",
        )
        condition = self.module.apply(
            params, encoder_out, mel2ph, spk_id=spk_id, method="frame_condition"
        )

        pitch_out = None
        if self.predict_pitch:
            melody_frame = None
            delta_pitch_in = None
            if self.use_melody_encoder:
                mel_out = self.module.apply(
                    params, note_midi, note_rest, note_dur, note_glide=note_glide,
                    deterministic=False, rngs=rngs, method="melody_encode",
                )
                melody_frame = gather_frames(mel_out, mel2note)
                delta_pitch_in = (pitch - base_pitch) * (~pitch_retake)
            pitch_cond, _ = self.module.apply(
                params, condition, mel2ph, base_pitch, pitch=pitch, pitch_retake=pitch_retake,
                melody_frame=melody_frame, delta_pitch_in=delta_pitch_in, method="pitch_condition",
            )
            x0 = self.pitch_transform.norm(pitch - base_pitch)  # [B, T, R]
            pitch_fn, _ = self._denoise_fns(params)
            pitch_out = self._train_core(pitch_fn, pitch_cond, x0, rng_tp, rng_np)

        var_out = None
        if self.var_list:
            var_cond = self.module.apply(
                params, condition, pitch, variances, variance_retake, method="variance_condition"
            )
            xs = [variances[v] for v in self.var_list]
            x0 = self.variance_transform.flatten(self.variance_transform.norm(xs))  # [B, T, F*R]
            _, var_fn = self._denoise_fns(params)
            var_out = self._train_core(var_fn, var_cond, x0, rng_tv, rng_nv)

        return dur_pred, pitch_out, var_out

    def _train_core(self, denoise_fn, cond, x0, rng_t, rng_noise):
        """x0: flat [B, T, D]. Returns (pred, target, t)."""
        b = x0.shape[0]
        if self.diffusion_type == "ddpm":
            t = jax.random.randint(rng_t, (b,), 0, self.k_step)
            x_noisy, noise = ddpm_core.p_losses_inputs(self.schedule, x0, t, rng_noise)
            pred = denoise_fn(x_noisy, t.astype(jnp.float32), cond)
            return pred, noise, t
        else:
            t = jax.random.uniform(rng_t, (b,))
            x_t, v_gt = reflow_core.p_losses_inputs(x0, t, rng_noise)
            v_pred = denoise_fn(x_t, t * self.time_scale_factor, cond)
            return v_pred, v_gt, t

    def forward_infer(
        self, params, rng: jax.Array, txt_tokens, midi, ph2word, base_pitch,
        *, ph_dur=None, word_dur=None, mel2ph=None, pitch=None, pitch_expr=None,
        pitch_retake=None, variances: Dict = None, variance_retake: Dict = None,
        spk_id=None, spk_mix_embed=None, ph_spk_mix_embed=None, languages=None,
        note_midi=None, note_rest=None, note_dur=None, note_glide=None, mel2note=None,
        steps: Optional[int] = None,
        predict_pitch: Optional[bool] = None, predict_variances: Optional[bool] = None,
        noise_pitch: Optional[jnp.ndarray] = None,
        noise_variances: Optional[jnp.ndarray] = None,
    ):
        """Inference forward. Returns (dur_pred, pitch_pred, variances_pred dict).

        ``predict_pitch``/``predict_variances`` can statically disable branches
        for a particular segment (the reference toggles model attributes,
        ds_variance.py:408-425; here they are static jit arguments).
        ``noise_pitch``/``noise_variances`` override the PRNG draws (injected-
        noise regression testing and RNG-free ONNX export).
        """
        hp = self.hp
        do_pitch = self.predict_pitch and (predict_pitch is not False)
        do_vars = bool(self.var_list) and (predict_variances is not False)
        encoder_out, dur_pred = self.module.apply(
            params, txt_tokens, midi, ph2word, ph_dur=ph_dur, word_dur=word_dur,
            spk_id=spk_id, ph_spk_mix_embed=ph_spk_mix_embed,
            languages=languages, infer=True, method="encode",
        )
        if not do_pitch and not do_vars:
            return dur_pred, None, {}

        if mel2ph is None and word_dur is not None:
            dur_align = rhythm_regulator(dur_pred, ph2word, word_dur)
            mel2ph = length_regulator(dur_align, base_pitch.shape[1])

        condition = self.module.apply(
            params, encoder_out, mel2ph, spk_id=spk_id, spk_mix_embed=spk_mix_embed,
            method="frame_condition",
        )

        rng_p, rng_v = jax.random.split(rng)
        pitch_pred = None
        if do_pitch:
            melody_frame = None
            delta_pitch_in = None
            if self.use_melody_encoder:
                mel_out = self.module.apply(
                    params, note_midi, note_rest, note_dur, note_glide=note_glide,
                    method="melody_encode",
                )
                melody_frame = gather_frames(mel_out, mel2note)
                if pitch_retake is not None:
                    delta_pitch_in = (pitch - base_pitch) * (~pitch_retake)
            pitch_cond, base_pitch = self.module.apply(
                params, condition, mel2ph, base_pitch, pitch=pitch, pitch_expr=pitch_expr,
                pitch_retake=pitch_retake, melody_frame=melody_frame,
                delta_pitch_in=delta_pitch_in, method="pitch_condition",
            )
            pitch_proj = precompute_cond_projections(
                params["params"]["pitch_denoiser"], pitch_cond, dtype=self.module.dtype
            )

            def pitch_step(x, t):
                return self.module.apply(
                    params, x, t, pitch_cond, cond_proj=pitch_proj, method="denoise_pitch"
                )

            shape = jnp.zeros(pitch_cond.shape[:2] + (self.pitch_transform.repeat_bins,))
            x = self._infer_core(pitch_step, shape, rng_p, steps, noise=noise_pitch)
            pitch_pred = self.pitch_transform.denorm(x)

        variances_pred = {}
        if do_vars:
            if pitch is None:
                pitch = base_pitch + pitch_pred
            var_cond = self.module.apply(
                params, condition, pitch, variances or {}, variance_retake,
                method="variance_condition",
            )
            var_proj = precompute_cond_projections(
                params["params"]["variance_denoiser"], var_cond, dtype=self.module.dtype
            )

            def var_step(x, t):
                return self.module.apply(
                    params, x, t, var_cond, cond_proj=var_proj, method="denoise_variance"
                )

            f = len(self.var_list)
            rb = self.variance_transform.repeat_bins
            shape = jnp.zeros(var_cond.shape[:2] + (f * rb,))
            x = self._infer_core(var_step, shape, rng_v, steps, noise=noise_variances)
            outs = self.variance_transform.denorm(self.variance_transform.unflatten(x))
            variances_pred = {v: o for v, o in zip(self.var_list, outs)}

        return dur_pred, pitch_pred, variances_pred

    # ------------------------------------------------------------------
    # Deployed views (reference deployment/modules/toplevel.py:224-302):
    # OpenUTAU-style graphs that start from the linguistic view's encoder_out
    # and compute frame alignment, the smoothed base pitch, and retake/expr
    # blending IN-GRAPH from the deployed inputs.

    def _deployed_frame_condition(self, params, encoder_out, ph_dur, t_mel,
                                  spk_mix_embed):
        mel2ph = length_regulator(ph_dur, t_mel)
        condition = self.module.apply(
            params, encoder_out, mel2ph, spk_mix_embed=spk_mix_embed,
            method="frame_condition",
        )
        return condition, mel2ph

    def forward_pitch_deployed(
        self, params, rng, encoder_out, ph_dur, note_midi, note_dur, pitch, retake,
        *, note_rest=None, note_glide=None, expr=None, spk_mix_embed=None,
        steps=None, noise=None,
    ):
        """Deployed pitch predictor (reference forward_pitch_{pre,post}process,
        deployment/modules/toplevel.py:224-271).

        ``ph_dur``/``note_dur`` are integer frame counts; ``mel2ph``/``mel2note``
        and the smoothed base pitch come from them in-graph. ``retake`` [B, T]
        blends the input ``pitch`` into non-retaken spans; ``expr`` (if given)
        interpolates the retake embedding. Returns the ABSOLUTE pitch curve
        (delta prediction + blended base pitch)."""
        from diffsinger_tpu.dsp.common import sinusoidal_smooth

        hp = self.hp
        t_mel = pitch.shape[1]
        condition, mel2ph = self._deployed_frame_condition(
            params, encoder_out, ph_dur, t_mel, spk_mix_embed)
        mel2note = length_regulator(note_dur, t_mel)
        frame_midi = gather_frames(
            note_midi.astype(jnp.float32)[:, :, None], mel2note)[:, :, 0]
        timestep = hp["hop_size"] / hp["audio_sample_rate"]
        kernel = max(1, round(hp["midi_smooth_width"] / timestep))
        base_pitch = sinusoidal_smooth(frame_midi, kernel)
        melody_frame = None
        delta_pitch_in = None
        if self.use_melody_encoder:
            mel_out = self.module.apply(
                params, note_midi, note_rest, note_dur, note_glide=note_glide,
                method="melody_encode",
            )
            melody_frame = gather_frames(mel_out, mel2note)
            delta_pitch_in = (pitch - base_pitch) * (~retake)
        pitch_cond, base_pitch = self.module.apply(
            params, condition, mel2ph, base_pitch, pitch=pitch, pitch_expr=expr,
            pitch_retake=retake, melody_frame=melody_frame,
            delta_pitch_in=delta_pitch_in, method="pitch_condition",
        )
        proj = precompute_cond_projections(
            params["params"]["pitch_denoiser"], pitch_cond, dtype=self.module.dtype)

        def step_fn(x, t):
            return self.module.apply(
                params, x, t, pitch_cond, cond_proj=proj, method="denoise_pitch")

        shape = jnp.zeros(pitch_cond.shape[:2] + (self.pitch_transform.repeat_bins,))
        x = self._infer_core(step_fn, shape, rng, steps, noise=noise)
        return self.pitch_transform.denorm(x) + base_pitch

    def forward_variance_deployed(
        self, params, rng, encoder_out, ph_dur, pitch, variances: Dict, retake,
        *, spk_mix_embed=None, steps=None, noise=None,
    ):
        """Deployed multi-variance predictor (reference
        forward_variance_{pre,post}process, deployment/modules/toplevel.py:273-302).

        ``retake`` is [B, T, F] over ``self.var_list`` order; non-retaken spans
        keep the input curves via the per-variance embeds. Returns a tuple of
        predicted curves in ``self.var_list`` order."""
        t_mel = pitch.shape[1]
        condition, _ = self._deployed_frame_condition(
            params, encoder_out, ph_dur, t_mel, spk_mix_embed)
        variance_retake = {v: retake[:, :, i] for i, v in enumerate(self.var_list)}
        var_cond = self.module.apply(
            params, condition, pitch, variances, variance_retake,
            method="variance_condition",
        )
        proj = precompute_cond_projections(
            params["params"]["variance_denoiser"], var_cond, dtype=self.module.dtype)

        def step_fn(x, t):
            return self.module.apply(
                params, x, t, var_cond, cond_proj=proj, method="denoise_variance")

        f = len(self.var_list)
        rb = self.variance_transform.repeat_bins
        shape = jnp.zeros(var_cond.shape[:2] + (f * rb,))
        x = self._infer_core(step_fn, shape, rng, steps, noise=noise)
        return tuple(self.variance_transform.denorm(self.variance_transform.unflatten(x)))

    def _infer_core(self, denoise_fn, shape_like, rng, steps, noise=None):
        """Sample a flat [B, T, D] tensor with the configured core. ``noise``
        overrides the PRNG draw (regression testing / RNG-free export).

        ``steps`` may be a *traced* scalar (jnp int32) instead of a Python int:
        that selects the deployment-contract dynamic samplers, so exported
        graphs accept the reference's runtime ``steps`` input
        (deployment/modules/{diffusion,rectified_flow}.py — pitch/variance
        predictors sample from pure noise with a runtime step count)."""
        hp = self.hp
        if steps is not None and not isinstance(steps, (int, np.integer)):
            if noise is None:
                noise = jax.random.normal(rng, shape_like.shape, jnp.float32)
            if self.diffusion_type == "ddpm":
                return ddpm_core.inference_dynamic(
                    denoise_fn, self.schedule, noise,
                    depth=jnp.float32(1.0), steps=steps, k_step=self.k_step,
                )
            return reflow_core.inference_dynamic(
                denoise_fn, noise, depth=jnp.float32(1.0), steps=steps,
                t_start_min=0.0, time_scale_factor=self.time_scale_factor,
            )
        if self.diffusion_type == "ddpm":
            return ddpm_core.inference(
                denoise_fn, self.schedule, shape_like,
                k_step=self.k_step, depth=hp.get("K_step_infer", self.k_step),
                speedup=hp.get("diff_speedup", 10),
                algorithm=hp.get("diff_accelerator", "ddim"), rng=rng, noise=noise,
            )
        nsteps = steps if steps is not None else hp.get("sampling_steps", 20)
        if noise is None:
            noise = jax.random.normal(rng, shape_like.shape, jnp.float32)
        return reflow_core.sample_ode(
            denoise_fn, noise, t_start=0.0, steps=nsteps,
            algorithm=hp.get("sampling_algorithm", "euler"),
            time_scale_factor=self.time_scale_factor,
        )
