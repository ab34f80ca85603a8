"""Inference CLI (reference scripts/infer.py): acoustic and variance commands
with the same flags, checkpoint discovery, key transposition, and legacy
hparams migration.
"""

import json
import os
import pathlib
import sys
from collections import OrderedDict
from pathlib import Path
from typing import Tuple

import click

root_dir = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root_dir))

from diffsinger_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()


def ckpt_root_dir() -> Path:
    """Checkpoints root: <repo>/checkpoints, overridable via DS_CKPT_ROOT."""
    return Path(os.environ.get("DS_CKPT_ROOT", "") or (root_dir / "checkpoints"))


def find_exp(exp: str) -> str:
    """Match exp folder by exact name or prefix (scripts/infer.py:16-32)."""
    ckpt_root = ckpt_root_dir()
    if not (ckpt_root / exp).exists():
        for subdir in sorted(ckpt_root.iterdir()) if ckpt_root.exists() else []:
            if subdir.is_dir() and subdir.name.startswith(exp):
                print(f"| match ckpt by prefix: {subdir.name}")
                return subdir.name
        raise click.BadParameter(
            f"There are no matching exp starting with '{exp}' in 'checkpoints' folder. "
            "Please specify '--exp' as the folder name or prefix."
        )
    print(f"| found ckpt by name: {exp}")
    return exp


def migrate_legacy_hparams(hp, infer_acoustic: bool = True):
    """Reference legacy-key migration (scripts/infer.py:168-198)."""
    if "diff_speedup" not in hp and "pndm_speedup" in hp:
        hp["diff_speedup"] = hp["pndm_speedup"]
    if infer_acoustic:
        if "T_start" not in hp:
            hp["T_start"] = 1 - hp["K_step"] / hp["timesteps"]
        if "T_start_infer" not in hp:
            hp["T_start_infer"] = 1 - hp["K_step_infer"] / hp["timesteps"]
        if "sampling_steps" not in hp:
            if hp.get("use_shallow_diffusion", False):
                hp["sampling_steps"] = hp["K_step_infer"] // hp["diff_speedup"]
            else:
                hp["sampling_steps"] = hp["timesteps"] // hp["diff_speedup"]
    else:
        if "sampling_steps" not in hp:
            hp["sampling_steps"] = hp["timesteps"] // hp["diff_speedup"]
    if "time_scale_factor" not in hp:
        hp["time_scale_factor"] = hp["timesteps"]
    return hp


def apply_depth_steps_overrides(hp, depth, steps, acoustic: bool = True):
    if depth is not None:
        assert depth <= 1 - hp["T_start"], (
            f"Depth should not be larger than 1 - T_start ({1 - hp['T_start']})"
        )
        hp["K_step_infer"] = round(hp["timesteps"] * depth)
        hp["T_start_infer"] = 1 - depth
    if steps is not None:
        if acoustic and hp.get("use_shallow_diffusion", False):
            step_size = (1 - hp["T_start_infer"]) / steps
            if "K_step_infer" in hp:
                hp["diff_speedup"] = max(1, round(step_size * hp["K_step_infer"]))
        elif "timesteps" in hp:
            hp["diff_speedup"] = max(1, round(hp["timesteps"] / steps))
        hp["sampling_steps"] = steps
    return hp


def _load_ds(proj: pathlib.Path):
    with open(proj, "r", encoding="utf-8") as f:
        params = json.load(f)
    if not isinstance(params, list):
        params = [params]
    if not params:
        print("The input file is empty.")
        sys.exit(0)
    return params


@click.group()
def main():
    pass


@main.command(help="Run DiffSinger acoustic model inference")
@click.argument("proj", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path,
                                        resolve_path=True), metavar="DS_FILE")
@click.option("--exp", type=str, required=True, metavar="EXP",
              callback=lambda ctx, param, value: find_exp(value))
@click.option("--ckpt", type=click.IntRange(min=0), required=False, metavar="STEPS")
@click.option("--spk", type=click.STRING, required=False)
@click.option("--lang", type=click.STRING, required=False)
@click.option("--out", type=click.Path(file_okay=False, path_type=pathlib.Path), required=False)
@click.option("--title", type=click.STRING, required=False)
@click.option("--num", type=click.IntRange(min=1), default=1)
@click.option("--key", type=click.INT, default=0, help="Key transition of pitch")
@click.option("--gender", type=click.FloatRange(min=-1, max=1), required=False)
@click.option("--seed", type=click.INT, default=-1)
@click.option("--depth", type=click.FloatRange(min=0, max=1), required=False)
@click.option("--steps", type=click.IntRange(min=1), required=False)
@click.option("--mel", is_flag=True, help="Save intermediate mel format instead of waveform")
@click.option("--batch_size", type=click.IntRange(min=1), default=1,
              help="Serve segments in bucket-grouped batches of this size "
                   "(throughput mode; per-segment seeds are ignored)")
def acoustic(proj, exp, ckpt, spk, lang, out, title, num, key, gender, seed, depth, steps, mel,
             batch_size):
    name = proj.stem if not title else title
    if out is None:
        out = proj.parent
    params = _load_ds(proj)

    from diffsinger_tpu.utils.infer_utils import parse_commandline_spk_mix, trans_key

    if key != 0:
        params = trans_key(params, key)
        if not title:
            name += "%+dkey" % key
        print(f"| key transition: {key:+d}")

    from diffsinger_tpu.config import load_config

    hp = load_config(exp_name=exp, infer=True, ckpt_root=ckpt_root_dir())
    hp = migrate_legacy_hparams(hp, infer_acoustic=True)
    hp = apply_depth_steps_overrides(hp, depth, steps, acoustic=True)

    spk_mix = parse_commandline_spk_mix(spk) if hp["use_spk_id"] and spk is not None else None
    for param in params:
        if gender is not None and hp.get("use_key_shift_embed", False):
            param["gender"] = gender
        if spk_mix is not None:
            param["spk_mix"] = spk_mix
        if lang is not None:
            param["lang"] = lang

    if batch_size > 1 and not mel:
        from diffsinger_tpu.inference.serving import AcousticServer

        infer_ins = AcousticServer(hp, max_batch_size=batch_size, ckpt_steps=ckpt)
    else:
        from diffsinger_tpu.inference.ds_acoustic import DiffSingerAcousticInfer

        infer_ins = DiffSingerAcousticInfer(hp, load_vocoder=not mel, ckpt_steps=ckpt)
    print(f"| Model: {type(infer_ins.model)}")
    try:
        infer_ins.run_inference(
            params, out_dir=out, title=name, num_runs=num,
            spk_mix=spk_mix, seed=seed, save_mel=mel,
            steps=hp.get("sampling_steps") if steps is None else steps,
        )
    except KeyboardInterrupt:
        sys.exit(-1)


@main.command(help="Run DiffSinger variance model inference")
@click.argument("proj", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path,
                                        resolve_path=True), metavar="DS_FILE")
@click.option("--exp", type=str, required=True, metavar="EXP",
              callback=lambda ctx, param, value: find_exp(value))
@click.option("--ckpt", type=click.IntRange(min=0), required=False, metavar="STEPS")
@click.option("--predict", type=click.STRING, multiple=True, metavar="TAGS")
@click.option("--spk", type=click.STRING, required=False)
@click.option("--lang", type=click.STRING, required=False)
@click.option("--out", type=click.Path(file_okay=False, path_type=pathlib.Path), required=False)
@click.option("--title", type=click.STRING, required=False)
@click.option("--num", type=click.IntRange(min=1), default=1)
@click.option("--key", type=click.INT, default=0)
@click.option("--expr", type=click.FloatRange(min=0, max=1), required=False)
@click.option("--seed", type=click.INT, default=-1)
@click.option("--steps", type=click.IntRange(min=1), required=False)
@click.option("--batch_size", type=click.IntRange(min=1), default=1,
              help="serve segments in flag/bucket-grouped batches of up to "
                   "this size (one jitted dispatch per group chunk)")
def variance(proj, exp, ckpt, predict: Tuple[str], spk, lang, out, title, num, key, expr, seed,
             steps, batch_size):
    name = proj.stem if not title else title
    if out is None:
        out = proj.parent
    if (not out or out.resolve() == proj.parent.resolve()) and not title:
        name += "_variance"
    params = [OrderedDict(p) for p in _load_ds(proj)]

    from diffsinger_tpu.utils.infer_utils import parse_commandline_spk_mix, trans_key

    if key != 0:
        params = trans_key(params, key)
        if not title:
            name += "%+dkey" % key
        print(f"| key transition: {key:+d}")

    from diffsinger_tpu.config import load_config

    hp = load_config(exp_name=exp, infer=True, ckpt_root=ckpt_root_dir())
    hp = migrate_legacy_hparams(hp, infer_acoustic=False)
    hp = apply_depth_steps_overrides(hp, None, steps, acoustic=False)

    spk_mix = parse_commandline_spk_mix(spk) if hp["use_spk_id"] and spk is not None else None
    for param in params:
        if expr is not None:
            param["expr"] = expr
        if spk_mix is not None:
            param["ph_spk_mix_backup"] = param.get("ph_spk_mix")
            param["spk_mix_backup"] = param.get("spk_mix")
            param["ph_spk_mix"] = param["spk_mix"] = spk_mix
        if lang is not None:
            param["lang"] = lang

    from diffsinger_tpu.inference.ds_variance import DiffSingerVarianceInfer

    if batch_size > 1:
        from diffsinger_tpu.inference.serving import VarianceServer

        infer_ins = VarianceServer(hp, max_batch_size=batch_size,
                                   ckpt_steps=ckpt, predictions=set(predict))
    else:
        infer_ins = DiffSingerVarianceInfer(hp, ckpt_steps=ckpt, predictions=set(predict))
    print(f"| Model: {type(infer_ins.model)}")
    try:
        infer_ins.run_inference(params, out_dir=out, title=name, num_runs=num, seed=seed)
    except KeyboardInterrupt:
        sys.exit(-1)


if __name__ == "__main__":
    main()
