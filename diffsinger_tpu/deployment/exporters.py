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

    def _export_spk_embeds(self, params, table_path: tuple, spk_map: dict):
        node = params["params"]
        for part in table_path:
            if part not in node:
                return
            node = node[part]
        table = np.asarray(node)
        for name, idx in spk_map.items():
            emb_path = self.export_dir / f"{name}.emb"
            np.asarray(table[idx], dtype=np.float32).tofile(emb_path)
            print(f"| export speaker: {emb_path}")


class DiffSingerAcousticExporter(BaseExporter):
    DEFAULT_BUCKETS = ((64, 512),)

    def __init__(self, hparams, export_dir, ckpt_steps: Optional[int] = None,
                 expose_gender=False, expose_velocity=False, freeze_spk=None,
                 buckets=None, fmt: str = "stablehlo"):
        super().__init__(hparams, export_dir, fmt=fmt)
        from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer

        self.infer = DiffSingerAcousticInfer(self.hparams, load_vocoder=False, ckpt_steps=ckpt_steps)
        self.model = self.infer.model
        self.params = self.infer.params
        # (t_txt, t_mel) shape set; StableHLO is fixed-shape, so a serving
        # runtime picks the smallest bucket that fits (the reference sidesteps
        # this with ONNX dynamic axes; here each bucket is one artifact).
        # The first bucket keeps unsuffixed filenames for compatibility.
        self.buckets = [tuple(b) for b in (buckets or self.DEFAULT_BUCKETS)]
        self.bucket_files: dict = {}

    def export_model(self):
        import jax
        import jax.numpy as jnp

        hp = self.hparams
        model = self.model
        name = hp["exp_name"] or "acoustic"
        # example values only — depth/steps are *runtime* inputs of the
        # exported graphs (reference deployment contract,
        # deployment/exporters/acoustic_exporter.py:256-311: 'depth' input iff
        # use_shallow_diffusion, 'steps' always).
        steps0 = jnp.int32(hp.get("sampling_steps", 20))
        depth0 = jnp.float32(
            min(hp.get("K_step_infer", hp.get("K_step", 1000)), hp.get("K_step", 1000))
            / hp.get("timesteps", 1000)
        )

        def fs2_aux(params, tokens, mel2ph, f0):
            cond = model.module.apply(params, tokens, mel2ph, f0, method="encode")
            aux = None
            if model.use_shallow_diffusion:
                aux = model.module.apply(params, cond, infer=True, method="aux")
            return cond, aux

        def sampler(params, rng, tokens, mel2ph, f0, depth, steps):
            out = model.forward_infer_dynamic(params, rng, tokens, mel2ph, f0,
                                              depth=depth, steps=steps)
            return out.diff_out

        def sampler_onnx(tokens, mel2ph, f0, depth, steps, noise):
            out = model.forward_infer_dynamic(self.params, None, tokens, mel2ph, f0,
                                              depth=depth, steps=steps, noise=noise)
            return out.diff_out

        def fs2_aux_onnx(tokens, mel2ph, f0):
            cond, aux = fs2_aux(self.params, tokens, mel2ph, f0)
            return (cond, aux) if aux is not None else cond

        for i, (t_txt, t_mel) in enumerate(self.buckets):
            suffix = "" if i == 0 else f".b{t_txt}x{t_mel}"
            tokens = jnp.zeros((1, t_txt), jnp.int32)
            mel2ph = jnp.zeros((1, t_mel), jnp.int32)
            f0 = jnp.full((1, t_mel), 220.0, jnp.float32)
            files = {}
            if self.want_stablehlo:
                files["fs2_aux"] = f"{name}.fs2_aux{suffix}.stablehlo"
                files["acoustic"] = f"{name}.diffusion{suffix}.stablehlo"
                self._serialize(fs2_aux, (self.params, tokens, mel2ph, f0),
                                self.export_dir / files["fs2_aux"])
                self._serialize(
                    sampler,
                    (self.params, jax.random.PRNGKey(0), tokens, mel2ph, f0,
                     depth0, steps0),
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
                    fs2_aux_onnx, (tokens, mel2ph, f0),
                    self.export_dir / files["fs2_aux_onnx"],
                    input_names=["tokens", "mel2ph", "f0"], output_names=outs)
                # `depth` is a public input only for shallow-diffusion models
                # (reference acoustic_exporter.py:305-308); on non-shallow
                # models it is traced but unused, so it is baked back in as a
                # constant to keep the reference signature.
                self._serialize_onnx(
                    sampler_onnx, (tokens, mel2ph, f0, depth0, steps0, noise),
                    self.export_dir / files["acoustic_onnx"],
                    input_names=["tokens", "mel2ph", "f0", "depth", "steps", "noise"],
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
                                  f"{hp['exp_name'] or 'acoustic'}.diffusion.stablehlo"),
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
            "mel_fmax": hp["fmax"],
            "use_key_shift_embed": hp.get("use_key_shift_embed", False),
            "use_speed_embed": hp.get("use_speed_embed", False),
            "use_shallow_diffusion": hp.get("use_shallow_diffusion", False),
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
            "speakers": sorted(self.infer.spk_map) if self.infer.spk_map else [],
            "buckets": self.bucket_files,
        }
        with open(self.export_dir / "dsconfig.yaml", "w") as f:
            yaml.safe_dump(manifest, f)
        print(f"| export: {self.export_dir / 'dsconfig.yaml'}")
        self._export_phonemes(self.infer.phoneme_dictionary)
        self._export_dictionaries()
        if self.infer.spk_map:
            self._export_spk_embeds(self.params, ("fs2", "spk_embed", "embedding"), self.infer.spk_map)


class DiffSingerVarianceExporter(BaseExporter):
    DEFAULT_BUCKETS = ((64, 512),)

    def __init__(self, hparams, export_dir, ckpt_steps: Optional[int] = None,
                 buckets=None, fmt: str = "stablehlo"):
        super().__init__(hparams, export_dir, fmt=fmt)
        from diffsinger_tpu.inference.ds_variance import DiffSingerVarianceInfer

        self.infer = DiffSingerVarianceInfer(self.hparams, ckpt_steps=ckpt_steps, predictions=set())
        self.model = self.infer.model
        self.params = self.infer.params
        self.buckets = [tuple(b) for b in (buckets or self.DEFAULT_BUCKETS)]
        self.bucket_files: dict = {}

    def export_model(self):
        import jax
        import jax.numpy as jnp

        hp = self.hparams
        model = self.model
        name = hp["exp_name"] or "variance"

        # linguistic + duration view (encoder + dur predictor)
        def linguistic_dur(params, tokens, midi, ph2word, word_dur):
            enc, dur = model.module.apply(
                params, tokens, midi, ph2word, word_dur=word_dur, infer=True, method="encode"
            )
            return enc, dur

        # `steps` is a *runtime* input of the sampling views, matching the
        # reference's pitch/variance predictor ONNX (variance_exporter.py:
        # 424-429, 571-576: 'steps' input on both).
        steps0 = jnp.int32(hp.get("sampling_steps", 20))

        def pitch_view(params, rng, tokens, midi, ph2word, ph_dur, mel2ph,
                       base_pitch, steps):
            dur_pred, pitch_pred, _ = model.forward_infer(
                params, rng, tokens, midi, ph2word, base_pitch,
                ph_dur=ph_dur, mel2ph=mel2ph, predict_variances=False, steps=steps,
            )
            return pitch_pred

        key = jax.random.PRNGKey(0)

        def linguistic_onnx(tokens, midi, ph2word, word_dur):
            return linguistic_dur(self.params, tokens, midi, ph2word, word_dur)

        def pitch_onnx(tokens, midi, ph2word, ph_dur, mel2ph, base_pitch, steps, noise):
            _, pitch_pred, _ = model.forward_infer(
                self.params, key, tokens, midi, ph2word, base_pitch,
                ph_dur=ph_dur, mel2ph=mel2ph, predict_variances=False,
                steps=steps, noise_pitch=noise,
            )
            return pitch_pred

        def variance_onnx(tokens, midi, ph2word, ph_dur, mel2ph, base_pitch,
                          pitch, steps, noise):
            _, _, var_pred = model.forward_infer(
                self.params, key, tokens, midi, ph2word, base_pitch,
                ph_dur=ph_dur, mel2ph=mel2ph, pitch=pitch, predict_pitch=False,
                steps=steps, noise_variances=noise,
            )
            return tuple(var_pred[v] for v in model.var_list)

        for i, (t_ph, t_mel) in enumerate(self.buckets):
            suffix = "" if i == 0 else f".b{t_ph}x{t_mel}"
            tokens = jnp.zeros((1, t_ph), jnp.int32)
            midi = jnp.zeros((1, t_ph), jnp.int32)
            ph2word = jnp.zeros((1, t_ph), jnp.int32)
            ph_dur = jnp.ones((1, t_ph), jnp.float32)
            word_dur = jnp.ones((1, t_ph), jnp.float32)
            base_pitch = jnp.full((1, t_mel), 60.0, jnp.float32)
            mel2ph = jnp.ones((1, t_mel), jnp.int32)
            files = {}
            if self.want_stablehlo:
                files["linguistic"] = f"{name}.linguistic_dur{suffix}.stablehlo"
                self._serialize(linguistic_dur, (self.params, tokens, midi, ph2word, word_dur),
                                self.export_dir / files["linguistic"])
                if model.predict_pitch:
                    files["pitch"] = f"{name}.pitch{suffix}.stablehlo"
                    self._serialize(
                        pitch_view,
                        (self.params, jax.random.PRNGKey(0), tokens, midi, ph2word, ph_dur,
                         mel2ph, base_pitch, steps0),
                        self.export_dir / files["pitch"],
                    )
            if self.want_onnx:
                files["linguistic_onnx"] = f"{name}.linguistic{suffix}.onnx"
                self._serialize_onnx(
                    linguistic_onnx, (tokens, midi, ph2word, word_dur),
                    self.export_dir / files["linguistic_onnx"],
                    input_names=["tokens", "midi", "ph2word", "word_dur"],
                    output_names=["encoder_out", "ph_dur_pred"])
                if model.predict_pitch:
                    rb = hp["pitch_prediction_args"]["repeat_bins"]
                    noise = jnp.zeros((1, t_mel, rb), jnp.float32)
                    files["pitch_onnx"] = f"{name}.pitch{suffix}.onnx"
                    self._serialize_onnx(
                        pitch_onnx,
                        (tokens, midi, ph2word, ph_dur, mel2ph, base_pitch, steps0, noise),
                        self.export_dir / files["pitch_onnx"],
                        input_names=["tokens", "midi", "ph2word", "ph_dur",
                                     "mel2ph", "base_pitch", "steps", "noise"],
                        output_names=["pitch_pred"], internal_noise=["noise"])
                if model.var_list:
                    trb = hp["variances_prediction_args"]["total_repeat_bins"]
                    noise = jnp.zeros((1, t_mel, trb), jnp.float32)
                    pitch = jnp.full((1, t_mel), 60.0, jnp.float32)
                    files["variance_onnx"] = f"{name}.variance{suffix}.onnx"
                    self._serialize_onnx(
                        variance_onnx,
                        (tokens, midi, ph2word, ph_dur, mel2ph, base_pitch, pitch,
                         steps0, noise),
                        self.export_dir / files["variance_onnx"],
                        input_names=["tokens", "midi", "ph2word", "ph_dur",
                                     "mel2ph", "base_pitch", "pitch", "steps", "noise"],
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
                f"{hp['exp_name'] or 'variance'}.linguistic_dur.stablehlo"),
            "phonemes": "phonemes.json",
            "hidden_size": hp["hidden_size"],
            "predict_dur": hp["predict_dur"],
            "predict_pitch": hp["predict_pitch"],
            # steps is a runtime input of the pitch/variance sampling graphs
            "use_continuous_acceleration": True,
            "sampling_steps": hp.get("sampling_steps", 20),
            "sample_rate": hp["audio_sample_rate"],
            "hop_size": hp["hop_size"],
            "speakers": sorted(self.infer.spk_map) if self.infer.spk_map else [],
            "buckets": self.bucket_files,
        }
        with open(self.export_dir / "dsconfig.yaml", "w") as f:
            yaml.safe_dump(manifest, f)
        self._export_phonemes(self.infer.phoneme_dictionary)
        self._export_dictionaries()
        if self.infer.spk_map:
            self._export_spk_embeds(self.params, ("spk_embed", "embedding"), self.infer.spk_map)


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
