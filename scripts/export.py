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

from scripts.infer import ckpt_root_dir, find_exp, migrate_legacy_hparams  # noqa: E402


@click.group()
def main():
    pass


def _load_hp(exp, acoustic=True):
    from diffsinger_tpu.config import load_config

    hp = load_config(exp_name=exp, infer=True, ckpt_root=ckpt_root_dir())
    return migrate_legacy_hparams(hp, infer_acoustic=acoustic)


def _parse_buckets(value):
    """'64x512,128x1024' -> [(64, 512), (128, 1024)]; '256,512' -> [256, 512]."""
    if not value:
        return None
    buckets = []
    for part in value.split(","):
        dims = [int(d) for d in part.strip().split("x")]
        buckets.append(tuple(dims) if len(dims) > 1 else dims[0])
    return buckets


@main.command(help="Export DiffSinger acoustic model")
@click.option("--exp", type=str, required=True, callback=lambda c, p, v: find_exp(v))
@click.option("--ckpt", type=click.IntRange(min=0), required=False)
@click.option("--out", type=click.Path(file_okay=False, path_type=pathlib.Path), required=False)
@click.option("--freeze_gender", type=click.FloatRange(min=-1, max=1), required=False,
              help="(for random pitch shifting) freeze this gender value into the "
                   "model instead of exposing a runtime `gender` input")
@click.option("--freeze_velocity", is_flag=True,
              help="(for random time stretching) freeze the default velocity "
                   "instead of exposing a runtime `velocity` input")
@click.option("--export_spk", type=str, multiple=True,
              help="(multi-speaker) speaker or 'alias=mix' to export as .emb; "
                   "repeatable")
@click.option("--freeze_spk", type=str, required=False,
              help="(multi-speaker) speaker or 'alias=mix' to freeze into the model")
@click.option("--buckets", type=str, required=False,
              help="shape set, e.g. '64x512,128x1024' (t_txt x t_mel per bucket)")
@click.option("--format", "fmt", type=click.Choice(["stablehlo", "onnx", "both"]),
              default="stablehlo", help="artifact format (onnx = OpenUTAU-style graphs)")
def acoustic(exp, ckpt, out, freeze_gender, freeze_velocity, export_spk, freeze_spk,
             buckets, fmt):
    if export_spk and freeze_spk:
        raise click.UsageError("--export_spk is exclusive to --freeze_spk.")
    hp = _load_hp(exp, acoustic=True)
    out = out or (root_dir / "artifacts" / exp)
    from diffsinger_tpu.deployment.exporters import DiffSingerAcousticExporter

    DiffSingerAcousticExporter(
        hp, out, ckpt_steps=ckpt,
        freeze_gender=freeze_gender, freeze_velocity=freeze_velocity,
        export_spk=list(export_spk), freeze_spk=freeze_spk,
        buckets=_parse_buckets(buckets), fmt=fmt,
    ).export()


@main.command(help="Export DiffSinger variance model")
@click.option("--exp", type=str, required=True, callback=lambda c, p, v: find_exp(v))
@click.option("--ckpt", type=click.IntRange(min=0), required=False)
@click.option("--out", type=click.Path(file_okay=False, path_type=pathlib.Path), required=False)
@click.option("--freeze_expr", is_flag=True,
              help="freeze the default pitch expressiveness factor into the "
                   "model instead of exposing a runtime `expr` input")
@click.option("--freeze_glide", is_flag=True,
              help="freeze the default glide embedding into the model instead "
                   "of exposing a runtime `note_glide` input")
@click.option("--export_spk", type=str, multiple=True,
              help="(multi-speaker) speaker or 'alias=mix' to export as .emb; "
                   "repeatable")
@click.option("--freeze_spk", type=str, required=False,
              help="(multi-speaker) speaker or 'alias=mix' to freeze into the model")
@click.option("--buckets", type=str, required=False,
              help="shape set, e.g. '64x512,128x1024' (t_ph x t_mel per bucket)")
@click.option("--format", "fmt", type=click.Choice(["stablehlo", "onnx", "both"]),
              default="stablehlo", help="artifact format (onnx = OpenUTAU-style graphs)")
def variance(exp, ckpt, out, freeze_expr, freeze_glide, export_spk, freeze_spk,
             buckets, fmt):
    if export_spk and freeze_spk:
        raise click.UsageError("--export_spk is exclusive to --freeze_spk.")
    hp = _load_hp(exp, acoustic=False)
    out = out or (root_dir / "artifacts" / exp)
    from diffsinger_tpu.deployment.exporters import DiffSingerVarianceExporter

    DiffSingerVarianceExporter(hp, out, ckpt_steps=ckpt,
                               freeze_expr=freeze_expr, freeze_glide=freeze_glide,
                               export_spk=list(export_spk), freeze_spk=freeze_spk,
                               buckets=_parse_buckets(buckets), fmt=fmt).export()


@main.command(name="nsf-hifigan", help="Export NSF-HiFiGAN vocoder")
@click.option("--config", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
              required=True, help="config file with vocoder_ckpt")
@click.option("--out", type=click.Path(file_okay=False, path_type=pathlib.Path), required=False)
@click.option("--buckets", type=str, required=False,
              help="mel-length set, e.g. '256,512,1024'")
@click.option("--format", "fmt", type=click.Choice(["stablehlo", "onnx", "both"]),
              default="stablehlo", help="artifact format (onnx = OpenUTAU-style graphs)")
def nsf_hifigan(config, out, buckets, fmt):
    from diffsinger_tpu.config import load_config

    hp = load_config(config, infer=True)
    out = out or (root_dir / "artifacts" / "nsf_hifigan")
    from diffsinger_tpu.deployment.exporters import NSFHiFiGANExporter

    NSFHiFiGANExporter(hp, out, buckets=_parse_buckets(buckets), fmt=fmt).export()


if __name__ == "__main__":
    main()
