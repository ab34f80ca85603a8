"""Vocoder copy-synthesis validation (reference inference/val_nsf_hifigan.py):
wav -> mel + f0 -> vocoder -> wav, for listening checks of a vocoder checkpoint.
"""

import pathlib
import sys
from pathlib import Path

import click
import numpy as np

root_dir = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root_dir))


@click.command(help="Copy-synthesis through the NSF-HiFiGAN vocoder")
@click.argument("wav", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
                metavar="WAV_FILE")
@click.option("--config", type=click.Path(exists=True, dir_okay=False, path_type=pathlib.Path),
              required=True)
@click.option("--out", type=click.Path(file_okay=False, path_type=pathlib.Path), required=False)
def main(wav, config, out):
    from diffsinger_tpu.config import load_config
    from diffsinger_tpu.dsp.mel import MelSpectrogram
    from diffsinger_tpu.dsp.pe import initialize_pe
    from diffsinger_tpu.utils.infer_utils import load_wav, save_wav
    from diffsinger_tpu.vocoders.registry import get_vocoder_cls

    hp = load_config(config, infer=True)
    out = out or wav.parent
    out.mkdir(parents=True, exist_ok=True)

    waveform, sr = load_wav(wav, target_sr=hp["audio_sample_rate"])
    mel_spec = MelSpectrogram(
        sr=hp["audio_sample_rate"], n_mels=hp["audio_num_mel_bins"],
        n_fft=hp["fft_size"], win_size=hp["win_size"], hop_size=hp["hop_size"],
        fmin=hp["fmin"], fmax=hp["fmax"],
    )
    mel = mel_spec.bucketed(waveform).T  # [T, M]
    length = mel.shape[0]
    pe = initialize_pe(hp)
    f0, _ = pe.get_pitch(
        waveform, samplerate=hp["audio_sample_rate"], length=length,
        hop_size=hp["hop_size"], f0_min=hp["f0_min"], f0_max=hp["f0_max"], interp_uv=True,
    )
    vocoder = get_vocoder_cls(hp)(hp)
    wav_out = vocoder.spec2wav(mel, f0=f0.astype(np.float32))
    save_path = out / f"{wav.stem}_copysynth.wav"
    save_wav(wav_out, save_path, hp["audio_sample_rate"])
    print(f"| save audio: {save_path}")


if __name__ == "__main__":
    main()
