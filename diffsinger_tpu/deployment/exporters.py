"""Deployment exporters (reference deployment/exporters/*, basics/base_exporter.py).

The reference ships ONNX graphs for OpenUTAU. The TPU-native deployment format
here is **StableHLO** via ``jax.export``: each exported sub-model view is a
serialized, portable, shape-polymorphic-free artifact runnable by any PJRT
runtime (TPU/CPU/GPU), with the same sub-model decomposition as the reference:

* acoustic: ``fs2_aux`` (encoder + aux draft) and ``diffusion`` (full sampler at
  a fixed step count) views (deployment/modules/toplevel.py:20-55);
* variance: linguistic / dur / pitch / variance views
  (deployment/exporters/variance_exporter.py:190-624);
* vocoder: mel+f0 -> waveform.

Attachments keep the reference's ecosystem contract: ``dsconfig.yaml`` manifest,
``phonemes.json``, per-speaker ``.emb`` files, dictionaries
(acoustic_exporter.py:117-…).
"""

from __future__ import annotations

import json
import pathlib
import shutil
from typing import Optional

import numpy as np
import yaml


class BaseExporter:
    def __init__(self, hparams: dict, export_dir: pathlib.Path, fmt: str = "stablehlo"):
        if fmt not in ("stablehlo", "onnx", "both"):
            raise ValueError(f"unknown export format {fmt!r}")
        # exported artifacts are fp32 regardless of the serving-time
        # infer_precision opt-in: ONNX consumers have no bfloat16, and
        # reference-parity artifacts are fp32 (runtimes may still run a
        # StableHLO artifact in bf16 via their own execution options)
        if hparams.get("infer_precision"):
            hparams = dict(hparams, infer_precision=None)
        self.hparams = hparams
        self.fmt = fmt
        self.export_dir = pathlib.Path(export_dir)
        self.export_dir.mkdir(parents=True, exist_ok=True)

    @property
    def want_stablehlo(self):
        return self.fmt in ("stablehlo", "both")

    @property
    def want_onnx(self):
        return self.fmt in ("onnx", "both")

    def export(self):
        self.export_model()
        self.export_attachments()

    def export_model(self):
        raise NotImplementedError()

    def export_attachments(self):
        raise NotImplementedError()

    # ------------------------------------------------------------------
    def _serialize(self, fn, args, path: pathlib.Path):
        import jax
        from jax import export as jexport

        exp = jexport.export(jax.jit(fn))(*args)
        path.write_bytes(exp.serialize())
        print(f"| export: {path} ({path.stat().st_size / 1e6:.2f} MB)")

    def _serialize_onnx(self, fn, args, path: pathlib.Path, *, input_names,
                        output_names, internal_noise=(), internal_constants=None):
        """Emit an ONNX graph (self-contained emitter, deployment/onnx/) for
        OpenUTAU-style consumption (reference acoustic_exporter.py:104-113).
        `internal_noise` names inputs replaced by in-graph RandomNormalLike
        sources; `internal_constants` maps input names to baked values — both
        keep the public signature aligned with the reference's ONNX."""
        from diffsinger_tpu.deployment.onnx import lower

        gb = lower(fn, args, name=path.stem, input_names=list(input_names),
                   output_names=list(output_names))
        for noise_name in internal_noise:
            gb.internalize_noise(noise_name)
        for const_name, value in (internal_constants or {}).items():
            gb.internalize_constant(const_name, value)
        data = gb.model_bytes()
        # export-time validation with the independent structural checker —
        # the stand-in for the reference's onnx.checker/onnxruntime pass
        # (acoustic_exporter.py:104-113); checker.py shares no code with
        # the emitter.
        from diffsinger_tpu.deployment.onnx.checker import check_model
        from diffsinger_tpu.deployment.onnx.lowering import EMITTED_OPS
        check_model(data, known_ops=EMITTED_OPS)
        path.write_bytes(data)
        print(f"| export: {path} ({path.stat().st_size / 1e6:.2f} MB)")

    def _export_dictionaries(self):
        hp = self.hparams
        for lang, dict_path in (hp.get("dictionaries") or {}).items():
            shutil.copy(dict_path, self.export_dir / f"dictionary-{lang}.txt")
        if hp.get("dictionary"):
            shutil.copy(hp["dictionary"], self.export_dir / "dictionary.txt")

    def _export_phonemes(self, phoneme_dictionary):
        path = self.export_dir / "phonemes.json"
        phoneme_dictionary.dump(path)
        print(f"| export: {path}")

    def _export_languages(self, lang_map: dict):
        """languages.json for multi-lingual models (reference
        acoustic_exporter.py:127-129 emits it beside phonemes.json)."""
        if not lang_map:
            return None
        path = self.export_dir / "languages.json"
        with open(path, "w", encoding="utf8") as f:
            json.dump(lang_map, f, ensure_ascii=False, indent=2)
        print(f"| export: {path}")
        return path.name

    # -- speaker policy (reference {acoustic,variance}_exporter.py:58-83) ----
    def _resolve_spk_settings(self, export_spk, freeze_spk, spk_map):
        """Reference default policy: with no explicit settings, a single-
        speaker model freezes its one speaker; a multi-speaker model exports
        every speaker. Returns ``(export_mixes, freeze_mix | None)`` with each
        mix as ``(alias, {name: weight})``."""
        from diffsinger_tpu.utils.infer_utils import parse_spk_settings

        if not self.hparams.get("use_spk_id", False):
            return [], None
        export_mix, freeze_mix = parse_spk_settings(export_spk, freeze_spk)
        assert not (export_mix and freeze_mix), (
            "--export_spk is exclusive to --freeze_spk.")
        if not export_mix and freeze_mix is None:
            if len(spk_map) == 1:
                only = next(iter(spk_map))
                freeze_mix = (only, {only: 1.0})
            else:
                export_mix = [(name, {name: 1.0}) for name in spk_map]
        return export_mix, freeze_mix

    def _spk_table(self, params, table_path: tuple):
        node = params["params"]
        for part in table_path:
            if part not in node:
                return None
            node = node[part]
        return np.asarray(node, np.float32)

    def _spk_mix_embed(self, params, table_path: tuple, spk_map: dict,
                       mix: dict) -> np.ndarray:
        """Weighted speaker embedding [H] for a parsed proportions dict
        (reference BaseExporter._perform_spk_mix)."""
        table = self._spk_table(params, table_path)
        out = np.zeros(table.shape[1], np.float32)
        for name, weight in mix.items():
            assert name in spk_map, f"Unknown speaker '{name}'."
            out += weight * table[spk_map[name]]
        return out

    def _export_spk_embeds(self, params, table_path: tuple, spk_map: dict,
                           export_mixes, model_name: str):
        """One ``{model_name}.{alias}.emb`` per exported speaker mix
        (reference acoustic_exporter.py:114-116, _export_spk_embed)."""
        for alias, mix in export_mixes:
            emb = self._spk_mix_embed(params, table_path, spk_map, mix)
            emb_path = self.export_dir / f"{model_name}.{alias}.emb"
            emb.tofile(emb_path)
            print(f"| export speaker: {emb_path}")


class DiffSingerAcousticExporter(BaseExporter):
    DEFAULT_BUCKETS = ((64, 512),)

    SPK_TABLE = ("fs2", "spk_embed", "embedding")

    def __init__(self, hparams, export_dir, ckpt_steps: Optional[int] = None,
                 freeze_gender: Optional[float] = None, freeze_velocity=False,
                 export_spk=None, freeze_spk=None,
                 buckets=None, fmt: str = "stablehlo"):
        super().__init__(hparams, export_dir, fmt=fmt)
        from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer

        self.infer = DiffSingerAcousticInfer(self.hparams, load_vocoder=False, ckpt_steps=ckpt_steps)
        self.model = self.infer.model
        self.params = self.infer.params
        # reference exposure semantics (acoustic_exporter.py:58-66): the
        # gender/velocity inputs exist UNLESS frozen; ``--freeze_gender g``
        # bakes the mapped key_shift (g*shift_max for g>=0 else g*|shift_min|)
        # and ``--freeze_velocity`` bakes speed 1 into the graph.
        self.expose_gender = freeze_gender is None
        self.freeze_gender = 0.0 if freeze_gender is None else float(freeze_gender)
        assert -1.0 <= self.freeze_gender <= 1.0, "freeze_gender must be in [-1, 1]"
        self.expose_velocity = not freeze_velocity
        # speaker policy (acoustic_exporter.py:70-81): freeze bakes a static
        # mix instead of a spk_embed input; export writes .emb attachments.
        self.export_spk, self.freeze_spk = self._resolve_spk_settings(
            export_spk, freeze_spk, self.infer.spk_map)
        # (t_txt, t_mel) shape set; StableHLO is fixed-shape, so a serving
        # runtime picks the smallest bucket that fits (the reference sidesteps
        # this with ONNX dynamic axes; here each bucket is one artifact).
        # The first bucket keeps unsuffixed filenames for compatibility.
        self.buckets = [tuple(b) for b in (buckets or self.DEFAULT_BUCKETS)]
        self.bucket_files: dict = {}
        self._extra_names: list = []  # filled by export_model

    @property
    def model_name(self) -> str:
        """Artifact file stem; a frozen speaker adds its alias
        (reference acoustic_exporter.py:96-99)."""
        name = self.hparams["exp_name"] or "acoustic"
        if self.freeze_spk is not None:
            name += "." + self.freeze_spk[0]
        return name

    def _static_spk_mix_embed(self, mix_spec: str) -> np.ndarray:
        """Weighted speaker embedding [H] for a mix pattern 'a:0.6|b:0.4'."""
        from diffsinger_tpu.utils.infer_utils import parse_commandline_spk_mix

        return self._spk_mix_embed(self.params, self.SPK_TABLE, self.infer.spk_map,
                                   parse_commandline_spk_mix(mix_spec))

    def export_model(self):
        import jax
        import jax.numpy as jnp

        hp = self.hparams
        model = self.model
        name = self.model_name
        # example values only — depth/steps are *runtime* inputs of the
        # exported graphs (reference deployment contract,
        # deployment/exporters/acoustic_exporter.py:256-311: 'depth' input iff
        # use_shallow_diffusion, 'steps' always).
        steps0 = jnp.int32(hp.get("sampling_steps", 20))
        depth0 = jnp.float32(
            min(hp.get("K_step_infer", hp.get("K_step", 1000)), hp.get("K_step", 1000))
            / hp.get("timesteps", 1000)
        )

        # Conditioning inputs exist iff the corresponding embed is on, with
        # the reference's deployed semantics (deployment/modules/
        # fastspeech2.py:107-123): `gender` is a raw [-1,1] curve mapped onto
        # key_shift inside the graph via the augmentation range; `velocity`
        # is the speed value clipped into the stretching range; variance
        # curves and languages pass through; `spk_embed` is the frame-level
        # mixed speaker embedding.
        extra_specs = []  # (input_name, example_fn(t_txt, t_mel), kwargs_fn)
        frozen_kwargs = {}  # embed on but not exposed: neutral value baked in
        if hp.get("use_lang_id", False):
            extra_specs.append(("languages",
                                lambda tt, tm: jnp.zeros((1, tt), jnp.int32),
                                lambda v: {"languages": v}))
        if hp.get("use_spk_id", False):
            hidden = hp["hidden_size"]
            if self.freeze_spk is not None:
                frozen_kwargs["spk_mix_embed"] = jnp.asarray(
                    self._spk_mix_embed(self.params, self.SPK_TABLE,
                                        self.infer.spk_map, self.freeze_spk[1])
                )[None, None, :]
            else:
                extra_specs.append(("spk_embed",
                                    lambda tt, tm: jnp.zeros((1, tm, hidden), jnp.float32),
                                    lambda v: {"spk_mix_embed": v}))
        var_names = [v for v in ("energy", "breathiness", "voicing", "tension")
                     if hp.get(f"use_{v}_embed", False)]
        for v_name in var_names:
            extra_specs.append((v_name,
                                lambda tt, tm: jnp.zeros((1, tm), jnp.float32),
                                None))  # merged into the variances dict below
        if hp.get("use_key_shift_embed", False):
            if self.expose_gender:
                shift_min, shift_max = hp["augmentation_args"]["random_pitch_shifting"]["range"]

                def _gender_kw(g, lo=float(shift_min), hi=float(shift_max)):
                    g = jnp.clip(g, -1.0, 1.0)
                    return {"key_shift": jnp.where(g >= 0, g * hi, g * abs(lo))}

                extra_specs.append(("gender",
                                    lambda tt, tm: jnp.zeros((1, tm), jnp.float32),
                                    _gender_kw))
            else:
                # bake the mapped --freeze_gender value
                # (reference acoustic_exporter.py:64-66)
                g = self.freeze_gender
                if g == 0.0:
                    shift = 0.0
                else:
                    shift_min, shift_max = hp["augmentation_args"]["random_pitch_shifting"]["range"]
                    shift = g * float(shift_max) if g >= 0 else g * abs(float(shift_min))
                frozen_kwargs["key_shift"] = jnp.full((1, 1), shift, jnp.float32)
        if hp.get("use_speed_embed", False):
            if self.expose_velocity:
                speed_min, speed_max = hp["augmentation_args"]["random_time_stretching"]["range"]

                def _velocity_kw(v, lo=float(speed_min), hi=float(speed_max)):
                    return {"speed": jnp.clip(v, lo, hi)}

                extra_specs.append(("velocity",
                                    lambda tt, tm: jnp.ones((1, tm), jnp.float32),
                                    _velocity_kw))
            else:
                frozen_kwargs["speed"] = jnp.ones((1, 1), jnp.float32)
        extra_names = [s[0] for s in extra_specs]
        self._extra_names = extra_names  # recorded into the manifest

        def _extra_kwargs(extra_args):
            kwargs = dict(frozen_kwargs)
            variances = {}
            for (input_name, _, kw_fn), val in zip(extra_specs, extra_args):
                if kw_fn is None:
                    variances[input_name] = val
                else:
                    kwargs.update(kw_fn(val))
            if variances:
                kwargs["variances"] = variances
            return kwargs

        def fs2_aux(params, tokens, mel2ph, f0, *extra_args):
            cond = model.module.apply(params, tokens, mel2ph, f0, method="encode",
                                      **_extra_kwargs(extra_args))
            aux = None
            if model.use_shallow_diffusion:
                aux = model.module.apply(params, cond, infer=True, method="aux")
            return cond, aux

        def sampler(params, rng, tokens, mel2ph, f0, depth, steps, *extra_args):
            out = model.forward_infer_dynamic(params, rng, tokens, mel2ph, f0,
                                              depth=depth, steps=steps,
                                              **_extra_kwargs(extra_args))
            return out.diff_out

        def sampler_onnx(tokens, mel2ph, f0, depth, steps, noise, *extra_args):
            out = model.forward_infer_dynamic(self.params, None, tokens, mel2ph, f0,
                                              depth=depth, steps=steps, noise=noise,
                                              **_extra_kwargs(extra_args))
            return out.diff_out

        def fs2_aux_onnx(tokens, mel2ph, f0, *extra_args):
            cond, aux = fs2_aux(self.params, tokens, mel2ph, f0, *extra_args)
            return (cond, aux) if aux is not None else cond

        for i, (t_txt, t_mel) in enumerate(self.buckets):
            suffix = "" if i == 0 else f".b{t_txt}x{t_mel}"
            tokens = jnp.zeros((1, t_txt), jnp.int32)
            mel2ph = jnp.zeros((1, t_mel), jnp.int32)
            f0 = jnp.full((1, t_mel), 220.0, jnp.float32)
            extras = tuple(ex_fn(t_txt, t_mel) for _, ex_fn, _ in extra_specs)
            files = {}
            if self.want_stablehlo:
                files["fs2_aux"] = f"{name}.fs2_aux{suffix}.stablehlo"
                files["acoustic"] = f"{name}.diffusion{suffix}.stablehlo"
                self._serialize(fs2_aux, (self.params, tokens, mel2ph, f0, *extras),
                                self.export_dir / files["fs2_aux"])
                self._serialize(
                    sampler,
                    (self.params, jax.random.PRNGKey(0), tokens, mel2ph, f0,
                     depth0, steps0, *extras),
                    self.export_dir / files["acoustic"],
                )
            if self.want_onnx:
                files["fs2_aux_onnx"] = f"{name}.fs2_aux{suffix}.onnx"
                files["acoustic_onnx"] = f"{name}.acoustic{suffix}.onnx"
                out_dims = self.hparams["audio_num_mel_bins"]
                noise = jnp.zeros((1, t_mel, out_dims), jnp.float32)
                outs = (["condition", "aux_mel"] if model.use_shallow_diffusion
                        else ["condition"])
                self._serialize_onnx(
                    fs2_aux_onnx, (tokens, mel2ph, f0, *extras),
                    self.export_dir / files["fs2_aux_onnx"],
                    input_names=["tokens", "mel2ph", "f0", *extra_names],
                    output_names=outs)
                # `depth` is a public input only for shallow-diffusion models
                # (reference acoustic_exporter.py:305-308); on non-shallow
                # models it is traced but unused, so it is baked back in as a
                # constant to keep the reference signature.
                self._serialize_onnx(
                    sampler_onnx, (tokens, mel2ph, f0, depth0, steps0, noise, *extras),
                    self.export_dir / files["acoustic_onnx"],
                    input_names=["tokens", "mel2ph", "f0", "depth", "steps", "noise",
                                 *extra_names],
                    output_names=["mel"],
                    internal_noise=["noise"],
                    internal_constants=(
                        {} if model.use_shallow_diffusion
                        else {"depth": np.float32(depth0)}))
            self.bucket_files[f"{t_txt}x{t_mel}"] = files

    def export_attachments(self):
        hp = self.hparams
        first = next(iter(self.bucket_files.values()), {})
        manifest = {
            "flavor": self.fmt,
            "acoustic": first.get("acoustic_onnx" if self.fmt == "onnx" else "acoustic",
                                  f"{self.model_name}.diffusion.stablehlo"),
            "vocoder": hp.get("vocoder", "NsfHifiGAN"),
            "phonemes": "phonemes.json",
            "hidden_size": hp["hidden_size"],
            "mel_base": str(hp.get("mel_base", "e")),
            "sample_rate": hp["audio_sample_rate"],
            "hop_size": hp["hop_size"],
            "win_size": hp["win_size"],
            "fft_size": hp["fft_size"],
            "num_mel_bins": hp["audio_num_mel_bins"],
            "mel_fmin": hp["fmin"],
            # reference acoustic_exporter.py:160: null fmax -> Nyquist
            "mel_fmax": (hp["fmax"] if hp.get("fmax") is not None
                         else hp["audio_sample_rate"] / 2),
            "mel_scale": "slaney",  # filterbank family (acoustic_exporter.py:161)
            "use_lang_id": bool(hp.get("use_lang_id", False)),
            # exposure, not training config: the consumer feeds gender/velocity
            # only when the exported graph has those inputs
            # (acoustic_exporter.py:144-145)
            "use_key_shift_embed": bool(
                hp.get("use_key_shift_embed", False) and self.expose_gender),
            "use_speed_embed": bool(
                hp.get("use_speed_embed", False) and self.expose_velocity),
            "use_shallow_diffusion": hp.get("use_shallow_diffusion", False),
            # per-variance embed flags (acoustic_exporter.py:146-147): each
            # enabled one is a [1, T_mel] input of the exported graphs
            **{f"use_{v}_embed": bool(hp.get(f"use_{v}_embed", False))
               for v in ("energy", "breathiness", "voicing", "tension")},
            # reference acoustic_exporter.py:149-152: acceleration (steps) and
            # depth are continuous runtime inputs of the exported graphs;
            # max_depth is the deepest usable shallow depth as a fraction.
            "use_continuous_acceleration": True,
            "use_variable_depth": hp.get("use_shallow_diffusion", False),
            "sampling_steps": hp.get("sampling_steps", 20),
            "max_depth": (
                min(hp.get("K_step_infer", hp.get("K_step", 1000)), hp.get("K_step", 1000))
                / hp.get("timesteps", 1000)
                if hp.get("diffusion_type", "ddpm") == "ddpm"
                else 1.0 - float(hp.get("T_start_infer", hp.get("T_start", 0.4)))
            ),
            # exported speaker-mix .emb stems (reference
            # acoustic_exporter.py:135-136); empty when the mix is frozen in
            "speakers": [f"{self.hparams['exp_name'] or 'acoustic'}.{alias}"
                         for alias, _ in self.export_spk],
            # ordered conditioning inputs appended to every graph's signature
            # after (tokens, mel2ph, f0[, depth, steps, noise]); consumers use
            # this instead of re-deriving the set from the flags above
            "extra_inputs": list(self._extra_names),
            "buckets": self.bucket_files,
        }
        if hp.get("use_key_shift_embed", False) and self.expose_gender:
            # OpenUTAU maps its gender curve onto key_shift with this range
            # (acoustic_exporter.py:138-143)
            manifest["augmentation_args"] = {
                "random_pitch_shifting": {
                    "range": list(hp["augmentation_args"]["random_pitch_shifting"]["range"])
                }
            }
        lang_file = self._export_languages(self.infer.lang_map)
        if lang_file:
            manifest["languages"] = lang_file
        with open(self.export_dir / "dsconfig.yaml", "w") as f:
            yaml.safe_dump(manifest, f)
        print(f"| export: {self.export_dir / 'dsconfig.yaml'}")
        self._export_phonemes(self.infer.phoneme_dictionary)
        self._export_dictionaries()
        self._export_spk_embeds(self.params, self.SPK_TABLE, self.infer.spk_map,
                                self.export_spk,
                                self.hparams["exp_name"] or "acoustic")


class DiffSingerVarianceExporter(BaseExporter):
    DEFAULT_BUCKETS = ((64, 512),)
    SPK_TABLE = ("spk_embed", "embedding")

    def __init__(self, hparams, export_dir, ckpt_steps: Optional[int] = None,
                 freeze_expr=False, freeze_glide=False,
                 export_spk=None, freeze_spk=None,
                 buckets=None, fmt: str = "stablehlo"):
        super().__init__(hparams, export_dir, fmt=fmt)
        from diffsinger_tpu.inference.ds_variance import DiffSingerVarianceInfer

        self.infer = DiffSingerVarianceInfer(self.hparams, ckpt_steps=ckpt_steps, predictions=set())
        self.model = self.infer.model
        self.params = self.infer.params
        # reference exposure semantics (variance_exporter.py:66-67): the
        # `expr` (pitch expressiveness) input exists unless frozen; the
        # `note_glide` input exists on melody-encoder models with glide
        # embeds unless frozen.
        self.expose_expr = not freeze_expr
        self.freeze_glide = bool(freeze_glide)
        # speaker policy shared with the acoustic exporter
        # (reference variance_exporter.py:68-83)
        self.export_spk, self.freeze_spk = self._resolve_spk_settings(
            export_spk, freeze_spk, self.infer.spk_map)
        self.buckets = [tuple(b) for b in (buckets or self.DEFAULT_BUCKETS)]
        self.bucket_files: dict = {}
        # ordered input-name lists per view, recorded into the manifest for
        # consumers (filled by export_model)
        self._input_names: dict = {}

    @property
    def model_name(self) -> str:
        name = self.hparams["exp_name"] or "variance"
        if self.freeze_spk is not None:
            name += "." + self.freeze_spk[0]
        return name

    def export_model(self):
        import jax
        import jax.numpy as jnp

        hp = self.hparams
        model = self.model
        name = self.model_name

        # Conditioning inputs exist iff the corresponding flag is on: the
        # token-level speaker embedding feeds the encoder, the frame-level one
        # feeds the sampling condition (toplevel.py encode/frame_condition);
        # languages feed the encoder on multi-lingual models. A frozen speaker
        # mix is baked in instead of the spk inputs (reference
        # variance_exporter.py:82-83 frozen_spk_embed buffer).
        hidden = hp["hidden_size"]
        use_spk = hp.get("use_spk_id", False)
        use_lang = hp.get("use_lang_id", False)
        frozen_spk = None
        if use_spk and self.freeze_spk is not None:
            frozen_spk = jnp.asarray(self._spk_mix_embed(
                self.params, self.SPK_TABLE, self.infer.spk_map, self.freeze_spk[1]
            ))[None, None, :]
        spk_input = use_spk and frozen_spk is None
        enc_extra_names = (["ph_spk_embed"] if spk_input else []) + (
            ["languages"] if use_lang else [])
        frame_extra_names = (["spk_embed"] if spk_input else [])

        def _enc_examples(t_ph):
            out = []
            if spk_input:
                out.append(jnp.zeros((1, 1, hidden), jnp.float32))
            if use_lang:
                out.append(jnp.zeros((1, t_ph), jnp.int32))
            return out

        def _frame_examples(t_mel):
            return [jnp.zeros((1, 1, hidden), jnp.float32)] if spk_input else []

        def _split_extras(extra_args):
            kwargs = {}
            it = iter(extra_args)
            if spk_input:
                kwargs["ph_spk_mix_embed"] = next(it)
            if use_lang:
                kwargs["languages"] = next(it)
            if spk_input:
                kwargs["spk_mix_embed"] = next(it, None)
            if frozen_spk is not None:
                kwargs["ph_spk_mix_embed"] = frozen_spk
                kwargs["spk_mix_embed"] = frozen_spk
            kwargs = {k: v for k, v in kwargs.items() if v is not None}
            return kwargs

        # linguistic + duration view (encoder + dur predictor)
        def linguistic_dur(params, tokens, midi, ph2word, word_dur, *extra):
            kw = _split_extras(extra)
            kw.pop("spk_mix_embed", None)
            enc, dur = model.module.apply(
                params, tokens, midi, ph2word, word_dur=word_dur, infer=True,
                method="encode", **kw
            )
            return enc, dur

        # Deployed sampling views (reference deployment contract,
        # variance_exporter.py:312-530 / deployment/modules/toplevel.py:224-302):
        # they start from the linguistic view's `encoder_out`, take integer
        # frame durations, the current `pitch`/curves, a `retake` mask, and
        # optional `expr`/note inputs, and compute alignment + base pitch +
        # retake blending in-graph. `steps` is a runtime input of both.
        steps0 = jnp.int32(hp.get("sampling_steps", 20))
        use_melody = model.use_melody_encoder
        use_glide = (use_melody and hp.get("use_glide_embed", False)
                     and not self.freeze_glide)
        expose_expr = self.expose_expr

        pitch_in_names = (
            ["encoder_out", "ph_dur", "note_midi"]
            + (["note_rest"] if use_melody else [])
            + ["note_dur"]
            + (["note_glide"] if use_glide else [])
            + ["pitch"]
            + (["expr"] if expose_expr else [])
            + ["retake", *frame_extra_names, "steps"]
        )

        def _split_pitch_args(args):
            """(encoder_out, ph_dur, note_midi, positionals...) in
            ``pitch_in_names`` order -> forward_pitch_deployed arguments."""
            it = iter(args)
            enc, ph_dur, note_midi = next(it), next(it), next(it)
            note_rest = next(it) if use_melody else None
            note_dur = next(it)
            note_glide = next(it) if use_glide else None
            if note_glide is None and use_melody and hp.get("use_glide_embed", False):
                # frozen glide: the embedding stays in the graph at glide=none
                # (reference variance_exporter.py:314)
                note_glide = jnp.zeros((1, note_midi.shape[1]), jnp.int32)
            pitch = next(it)
            expr = next(it) if expose_expr else None
            retake = next(it)
            spk = next(it) if spk_input else frozen_spk
            steps = next(it)
            return (enc, ph_dur, note_midi, note_dur, pitch, retake), dict(
                note_rest=note_rest, note_glide=note_glide, expr=expr,
                spk_mix_embed=spk, steps=steps)

        def pitch_view(params, rng, *args):
            pos, kw = _split_pitch_args(args)
            return model.forward_pitch_deployed(params, rng, *pos, **kw)

        var_in_names = (["encoder_out", "ph_dur", "pitch", *model.var_list,
                         "retake", *frame_extra_names, "steps"])
        self._input_names = {
            "linguistic": ["tokens", "midi", "ph2word", "word_dur",
                           *enc_extra_names],
            "pitch": list(pitch_in_names),
            "variance": list(var_in_names),
        }

        def _split_var_args(args):
            it = iter(args)
            enc, ph_dur, pitch = next(it), next(it), next(it)
            variances = {v: next(it) for v in model.var_list}
            retake = next(it)
            spk = next(it) if spk_input else frozen_spk
            steps = next(it)
            return (enc, ph_dur, pitch, variances, retake), dict(
                spk_mix_embed=spk, steps=steps)

        def variance_view(params, rng, *args):
            pos, kw = _split_var_args(args)
            return model.forward_variance_deployed(params, rng, *pos, **kw)

        key = jax.random.PRNGKey(0)

        def linguistic_onnx(tokens, midi, ph2word, word_dur, *extra):
            return linguistic_dur(self.params, tokens, midi, ph2word, word_dur, *extra)

        def _pitch_examples(t_ph, t_mel):
            out = [jnp.zeros((1, t_ph, hidden), jnp.float32),          # encoder_out
                   jnp.ones((1, t_ph), jnp.int32),                     # ph_dur (frames)
                   jnp.full((1, t_ph), 60.0, jnp.float32)]             # note_midi
            if use_melody:
                out.append(jnp.zeros((1, t_ph), bool))                 # note_rest
            out.append(jnp.ones((1, t_ph), jnp.int32))                 # note_dur
            if use_glide:
                out.append(jnp.zeros((1, t_ph), jnp.int32))            # note_glide
            out.append(jnp.full((1, t_mel), 60.0, jnp.float32))        # pitch
            if expose_expr:
                out.append(jnp.ones((1, t_mel), jnp.float32))          # expr
            out.append(jnp.ones((1, t_mel), bool))                     # retake
            out.extend(_frame_examples(t_mel))                         # [spk_embed]
            return out

        def _var_examples(t_ph, t_mel):
            out = [jnp.zeros((1, t_ph, hidden), jnp.float32),
                   jnp.ones((1, t_ph), jnp.int32),
                   jnp.full((1, t_mel), 60.0, jnp.float32)]
            out.extend(jnp.zeros((1, t_mel), jnp.float32) for _ in model.var_list)
            out.append(jnp.ones((1, t_mel, len(model.var_list)), bool))
            out.extend(_frame_examples(t_mel))
            return out

        for i, (t_ph, t_mel) in enumerate(self.buckets):
            suffix = "" if i == 0 else f".b{t_ph}x{t_mel}"
            tokens = jnp.zeros((1, t_ph), jnp.int32)
            midi = jnp.zeros((1, t_ph), jnp.int32)
            ph2word = jnp.zeros((1, t_ph), jnp.int32)
            word_dur = jnp.ones((1, t_ph), jnp.float32)
            enc_extras = tuple(_enc_examples(t_ph))
            pitch_ex = tuple(_pitch_examples(t_ph, t_mel))
            var_ex = tuple(_var_examples(t_ph, t_mel))
            files = {}
            if self.want_stablehlo:
                files["linguistic"] = f"{name}.linguistic_dur{suffix}.stablehlo"
                self._serialize(
                    linguistic_dur,
                    (self.params, tokens, midi, ph2word, word_dur, *enc_extras),
                    self.export_dir / files["linguistic"])
                if model.predict_pitch:
                    files["pitch"] = f"{name}.pitch{suffix}.stablehlo"
                    self._serialize(
                        pitch_view,
                        (self.params, jax.random.PRNGKey(0), *pitch_ex, steps0),
                        self.export_dir / files["pitch"],
                    )
                if model.var_list:
                    files["variance"] = f"{name}.variance{suffix}.stablehlo"
                    self._serialize(
                        variance_view,
                        (self.params, jax.random.PRNGKey(0), *var_ex, steps0),
                        self.export_dir / files["variance"],
                    )
            if self.want_onnx:
                files["linguistic_onnx"] = f"{name}.linguistic{suffix}.onnx"
                self._serialize_onnx(
                    linguistic_onnx, (tokens, midi, ph2word, word_dur, *enc_extras),
                    self.export_dir / files["linguistic_onnx"],
                    input_names=["tokens", "midi", "ph2word", "word_dur",
                                 *enc_extra_names],
                    output_names=["encoder_out", "ph_dur_pred"])
                if model.predict_pitch:
                    rb = hp["pitch_prediction_args"]["repeat_bins"]
                    noise = jnp.zeros((1, t_mel, rb), jnp.float32)

                    def pitch_onnx(*args):
                        *ins, nz = args
                        pos, kw = _split_pitch_args(ins)
                        return model.forward_pitch_deployed(
                            self.params, key, *pos, noise=nz, **kw)

                    files["pitch_onnx"] = f"{name}.pitch{suffix}.onnx"
                    self._serialize_onnx(
                        pitch_onnx, (*pitch_ex, steps0, noise),
                        self.export_dir / files["pitch_onnx"],
                        input_names=[*pitch_in_names, "noise"],
                        output_names=["pitch_pred"], internal_noise=["noise"])
                if model.var_list:
                    trb = hp["variances_prediction_args"]["total_repeat_bins"]
                    noise = jnp.zeros((1, t_mel, trb), jnp.float32)

                    def variance_onnx(*args):
                        *ins, nz = args
                        pos, kw = _split_var_args(ins)
                        return model.forward_variance_deployed(
                            self.params, key, *pos, noise=nz, **kw)

                    files["variance_onnx"] = f"{name}.variance{suffix}.onnx"
                    self._serialize_onnx(
                        variance_onnx, (*var_ex, steps0, noise),
                        self.export_dir / files["variance_onnx"],
                        input_names=[*var_in_names, "noise"],
                        output_names=[f"{v}_pred" for v in model.var_list],
                        internal_noise=["noise"])
            self.bucket_files[f"{t_ph}x{t_mel}"] = files

    def export_attachments(self):
        hp = self.hparams
        first = next(iter(self.bucket_files.values()), {})
        manifest = {
            "flavor": self.fmt,
            "linguistic": first.get(
                "linguistic_onnx" if self.fmt == "onnx" else "linguistic",
                f"{self.model_name}.linguistic_dur.stablehlo"),
            "phonemes": "phonemes.json",
            "hidden_size": hp["hidden_size"],
            "predict_dur": hp["predict_dur"],
            "predict_pitch": hp["predict_pitch"],
            # per-variance prediction flags (reference variance_exporter.py:
            # 176-178: predict_<v> for every checklist entry)
            **{f"predict_{v}": (v in self.model.var_list)
               for v in ("energy", "breathiness", "voicing", "tension")},
            # steps is a runtime input of the pitch/variance sampling graphs
            "use_continuous_acceleration": True,
            "sampling_steps": hp.get("sampling_steps", 20),
            "sample_rate": hp["audio_sample_rate"],
            "hop_size": hp["hop_size"],
            "speakers": [f"{hp['exp_name'] or 'variance'}.{alias}"
                         for alias, _ in self.export_spk],
            "buckets": self.bucket_files,
        }
        manifest["use_lang_id"] = bool(hp.get("use_lang_id", False))
        # ordered per-view input names (after params[, rng]; before a
        # trailing internalized `noise` on ONNX graphs) — consumers use this
        # instead of re-deriving the set from the flags
        manifest["inputs"] = self._input_names
        if hp["predict_pitch"]:
            # expr exposure + melody-encoder note_rest input flags
            # (reference variance_exporter.py:172-174)
            manifest["use_expr"] = bool(self.expose_expr)
            manifest["use_note_rest"] = bool(self.model.use_melody_encoder)
            manifest["use_glide_embed"] = bool(
                self.model.use_melody_encoder and hp.get("use_glide_embed", False)
                and not self.freeze_glide)
        lang_file = self._export_languages(self.infer.lang_map)
        if lang_file:
            manifest["languages"] = lang_file
        with open(self.export_dir / "dsconfig.yaml", "w") as f:
            yaml.safe_dump(manifest, f)
        self._export_phonemes(self.infer.phoneme_dictionary)
        self._export_dictionaries()
        self._export_spk_embeds(self.params, self.SPK_TABLE, self.infer.spk_map,
                                self.export_spk,
                                self.hparams["exp_name"] or "variance")


class NSFHiFiGANExporter(BaseExporter):
    DEFAULT_BUCKETS = (512,)

    def __init__(self, hparams, export_dir, buckets=None, fmt: str = "stablehlo"):
        super().__init__(hparams, export_dir, fmt=fmt)
        from diffsinger_tpu.vocoders.nsf_hifigan import NsfHifiGAN

        self.vocoder = NsfHifiGAN(self.hparams)
        self.buckets = [int(b) for b in (buckets or self.DEFAULT_BUCKETS)]
        self.bucket_files: dict = {}

    def export_model(self):
        import jax.numpy as jnp

        def voc(params, mel, f0):
            return self.vocoder.model.apply(params, mel, f0)

        # ONNX graphs are emitted from the canonical (unfolded) generator so
        # ecosystem consumers get the reference-shaped per-sample graph; the
        # param tree is identical (folding.py), so the same params apply.
        canonical = self.vocoder.model.clone(fold_lanes=0)

        def voc_onnx(mel, f0):
            return canonical.apply(self.vocoder.params, mel, f0)

        for i, t_mel in enumerate(self.buckets):
            suffix = "" if i == 0 else f".b{t_mel}"
            mel = jnp.zeros((1, t_mel, self.vocoder.config.num_mels), jnp.float32)
            f0 = jnp.full((1, t_mel), 220.0, jnp.float32)
            files = {}
            if self.want_stablehlo:
                files["model"] = f"nsf_hifigan{suffix}.stablehlo"
                self._serialize(voc, (self.vocoder.params, mel, f0),
                                self.export_dir / files["model"])
            if self.want_onnx:
                files["model_onnx"] = f"nsf_hifigan{suffix}.onnx"
                self._serialize_onnx(voc_onnx, (mel, f0),
                                     self.export_dir / files["model_onnx"],
                                     input_names=["mel", "f0"],
                                     output_names=["waveform"])
            self.bucket_files[str(t_mel)] = files

    def export_attachments(self):
        cfg = self.vocoder.config
        first = next(iter(self.bucket_files.values()), {})
        manifest = {
            "flavor": self.fmt,
            "model": first.get(
                "model_onnx" if self.fmt == "onnx" else "model",
                "nsf_hifigan.stablehlo"),
            "sample_rate": cfg.sampling_rate,
            "hop_size": cfg.hop_size,
            "num_mel_bins": cfg.num_mels,
            "mel_base": "e",
            "buckets": self.bucket_files,
        }
        with open(self.export_dir / "vocoder.yaml", "w") as f:
            yaml.safe_dump(manifest, f)
