"""Vocode CLI: saved mel (.mel.npz from infer.py --mel) -> waveform
(reference scripts/vocode.py:1-90).
"""

import pathlib
import sys
from pathlib import Path

import click
import numpy as np

root_dir = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root_dir))

from diffsinger_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()


@click.command(help="Run DiffSinger vocoder")
@click.argument("mel", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path,
                                       resolve_path=True), metavar="MEL_FILE")
@click.option("--exp", type=str, required=False, metavar="EXP", help="Read vocoder config from experiment")
@click.option("--config", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
              required=False, help="Read vocoder config from file")
@click.option("--out", type=click.Path(file_okay=False, path_type=pathlib.Path), required=False)
@click.option("--title", type=click.STRING, required=False)
def main(mel, exp, config, out, title):
    name = mel.name.removesuffix(".mel.npz").removesuffix(".mel.pt") \
        if not title else title
    if out is None:
        out = mel.parent

    from diffsinger_tpu.config import load_config

    if exp is not None:
        from scripts.infer import ckpt_root_dir
        hp = load_config(exp_name=exp, infer=True, ckpt_root=ckpt_root_dir())
    elif config is not None:
        hp = load_config(config, infer=True)
    else:
        raise click.BadParameter("Either --exp or --config must be specified.")

    from diffsinger_tpu.utils.infer_utils import cross_fade, save_wav
    from diffsinger_tpu.vocoders.registry import get_vocoder_cls

    vocoder = get_vocoder_cls(hp)(hp)

    if mel.name.endswith(".pt"):
        # reference-format mel sequence: torch.load -> list of dicts with
        # 'mel' [1, T, M] (or [T, M]), 'f0' [1, T], 'offset' float
        # (reference scripts/vocode.py:58-60, inference/ds_acoustic.py:246-250)
        import torch

        seq = torch.load(mel, map_location="cpu", weights_only=False)
        assert isinstance(seq, list) and seq, "Not a valid mel sequence."

        def _np(v):
            return (v.detach().cpu().numpy() if hasattr(v, "detach")
                    else np.asarray(v)).astype(np.float32)

        segments = [
            (_np(s["mel"]).reshape(-1, _np(s["mel"]).shape[-1]),
             _np(s["f0"]).reshape(-1),
             float(s["offset"]))
            for s in seq
        ]
    else:
        data = np.load(mel)
        segments = [
            (data[f"mel_{i}"], data[f"f0_{i}"], float(data[f"offset_{i}"]))
            for i in range(int(data["num_segments"]))
        ]
    sr = hp["audio_sample_rate"]
    result = np.zeros(0)
    current_length = 0
    for mel_seg, f0_seg, offset in segments:
        wav = vocoder.spec2wav(mel_seg, f0=f0_seg)
        silent_length = round(offset * sr) - current_length
        if silent_length >= 0:
            result = np.append(result, np.zeros(silent_length))
            result = np.append(result, wav)
        else:
            result = cross_fade(result, wav, current_length + silent_length)
        current_length = current_length + silent_length + wav.shape[0]

    out.mkdir(parents=True, exist_ok=True)
    save_path = out / f"{name}.wav"
    print(f"| save audio: {save_path}")
    save_wav(result, save_path, sr)


if __name__ == "__main__":
    main()
