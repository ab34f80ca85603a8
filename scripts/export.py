"""Export CLI (reference scripts/export.py): acoustic / variance / nsf-hifigan
commands, emitting StableHLO artifacts + dsconfig.yaml attachments.
"""

import pathlib
import sys
from pathlib import Path

import click

root_dir = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root_dir))

from diffsinger_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

from scripts.infer import find_exp, migrate_legacy_hparams  # noqa: E402


@click.group()
def main():
    pass


def _load_hp(exp, acoustic=True):
    from diffsinger_tpu.config import load_config

    hp = load_config(exp_name=exp, infer=True, ckpt_root=root_dir / "checkpoints")
    return migrate_legacy_hparams(hp, infer_acoustic=acoustic)


@main.command(help="Export DiffSinger acoustic model")
@click.option("--exp", type=str, required=True, callback=lambda c, p, v: find_exp(v))
@click.option("--ckpt", type=click.IntRange(min=0), required=False)
@click.option("--out", type=click.Path(file_okay=False, path_type=pathlib.Path), required=False)
@click.option("--expose_gender", is_flag=True)
@click.option("--expose_velocity", is_flag=True)
@click.option("--freeze_spk", type=str, required=False)
def acoustic(exp, ckpt, out, expose_gender, expose_velocity, freeze_spk):
    hp = _load_hp(exp, acoustic=True)
    out = out or (root_dir / "artifacts" / exp)
    from diffsinger_tpu.deployment.exporters import DiffSingerAcousticExporter

    DiffSingerAcousticExporter(
        hp, out, ckpt_steps=ckpt,
        expose_gender=expose_gender, expose_velocity=expose_velocity, freeze_spk=freeze_spk,
    ).export()


@main.command(help="Export DiffSinger variance model")
@click.option("--exp", type=str, required=True, callback=lambda c, p, v: find_exp(v))
@click.option("--ckpt", type=click.IntRange(min=0), required=False)
@click.option("--out", type=click.Path(file_okay=False, path_type=pathlib.Path), required=False)
def variance(exp, ckpt, out):
    hp = _load_hp(exp, acoustic=False)
    out = out or (root_dir / "artifacts" / exp)
    from diffsinger_tpu.deployment.exporters import DiffSingerVarianceExporter

    DiffSingerVarianceExporter(hp, out, ckpt_steps=ckpt).export()


@main.command(name="nsf-hifigan", help="Export NSF-HiFiGAN vocoder")
@click.option("--config", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
              required=True, help="config file with vocoder_ckpt")
@click.option("--out", type=click.Path(file_okay=False, path_type=pathlib.Path), required=False)
def nsf_hifigan(config, out):
    from diffsinger_tpu.config import load_config

    hp = load_config(config, infer=True)
    out = out or (root_dir / "artifacts" / "nsf_hifigan")
    from diffsinger_tpu.deployment.exporters import NSFHiFiGANExporter

    NSFHiFiGANExporter(hp, out).export()


if __name__ == "__main__":
    main()
