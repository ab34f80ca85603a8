"""DDSP TorchScript->native conversion tests.

Builds a torch CombSub double with the pc-ddsp parameter layout (Mel2Control:
conv stack + GroupNorm + BiLSTM + LayerNorm + weight-normed dense; combtooth +
LTV filters), exports it as a TorchScript bundle, converts it with the real
converter, and checks the native JAX synthesis matches the TorchScript output
sample-for-sample (same injected noise)."""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

SR, BLOCK, WIN, MELS = 44100, 512, 2048, 16
BINS = WIN // 2 + 1


def _upsample(signal, factor: int):
    signal = signal.permute(0, 2, 1)
    signal = torch.nn.functional.interpolate(
        torch.cat((signal, signal[:, :, -1:]), 2),
        size=signal.shape[-1] * factor + 1, mode="linear", align_corners=True,
    )
    return signal[:, :, :-1].permute(0, 2, 1)


class TorchMel2Control(torch.nn.Module):
    def __init__(self, n_mels, n_out):
        super().__init__()
        self.stack = torch.nn.Sequential(
            torch.nn.Conv1d(n_mels, 64, 3, 1, 1),
            torch.nn.GroupNorm(4, 64),
            torch.nn.LeakyReLU(),
            torch.nn.Conv1d(64, 64, 3, 1, 1),
        )
        self.decoder = torch.nn.LSTM(64, 128, batch_first=True, bidirectional=True)
        self.norm = torch.nn.LayerNorm(256)
        self.dense_out = torch.nn.utils.parametrizations.weight_norm(
            torch.nn.Linear(256, n_out)
        )

    def forward(self, mel):
        x = self.stack(mel.transpose(1, 2)).transpose(1, 2)
        x, _ = self.decoder(x)
        x = self.norm(x)
        return self.dense_out(x)


class TorchCombSub(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.mel2ctrl = TorchMel2Control(MELS, 3 * BINS)
        self.register_buffer("window", torch.hann_window(WIN))

    def forward(self, mel, f0_frames, noise):
        f0 = _upsample(f0_frames, BLOCK)  # [B, L, 1]
        x = torch.cumsum(f0.double() / SR, dim=1)
        x = (x - torch.round(x)).float()
        combtooth = torch.sinc(SR * x / (f0 + 1e-3)).squeeze(-1)

        e = self.mel2ctrl(mel)
        mag, phase, nmag = e[..., :BINS], e[..., BINS:2 * BINS], e[..., 2 * BINS:]
        src_filter = torch.exp(mag + 1j * np.pi * phase)
        src_filter = torch.cat((src_filter, src_filter[:, -1:, :]), 1)
        noise_filter = torch.exp(nmag) / 128
        noise_filter = torch.cat((noise_filter, noise_filter[:, -1:, :]), 1)

        def _stft(sig):
            return torch.stft(sig, n_fft=WIN, win_length=WIN, hop_length=BLOCK,
                              window=self.window, center=True, return_complex=True)

        sig_stft = (
            _stft(combtooth) * src_filter.permute(0, 2, 1)
            + _stft(noise) * noise_filter.permute(0, 2, 1)
        )
        return torch.istft(sig_stft, n_fft=WIN, win_length=WIN, hop_length=BLOCK,
                           window=self.window, center=True)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ddsp")
    torch.manual_seed(0)
    model = TorchCombSub().eval()
    t = 12
    mel_t = torch.rand(1, t, MELS) * 4 - 6
    f0_t = torch.full((1, t, 1), 220.0)
    noise_t = torch.rand(1, t * BLOCK) * 2 - 1
    with torch.no_grad():
        ref_out = model(mel_t, f0_t, noise_t).numpy()
    scripted = torch.jit.trace(model, (mel_t, f0_t, noise_t))
    jit_path = tmp / "combsub.jit"
    scripted.save(str(jit_path))
    (tmp / "config.yaml").write_text(yaml.safe_dump({
        "model": {"type": "CombSub", "n_mag_harmonic": BINS, "n_mag_noise": BINS},
        "data": {"sampling_rate": SR, "block_size": BLOCK, "win_length": WIN,
                 "n_mels": MELS, "n_fft": WIN, "mel_fmin": 40, "mel_fmax": 16000},
    }))
    return jit_path, mel_t.numpy(), f0_t.numpy(), noise_t.numpy(), ref_out


@pytest.mark.slow
def test_convert_and_native_parity(bundle):
    jit_path, mel, f0, noise, ref_out = bundle
    from flax import serialization

    from diffsinger_tpu.vocoders.ddsp_combsub import CombSub
    from diffsinger_tpu.vocoders.ddsp_convert import convert_torchscript_ddsp

    out_path = convert_torchscript_ddsp(jit_path)
    blob = serialization.msgpack_restore(bytearray(out_path.read_bytes()))
    meta = blob["meta"]
    assert meta["sampling_rate"] == SR and meta["block_size"] == BLOCK
    assert meta["n_mag_harmonic"] == BINS and meta["n_mag_noise"] == BINS

    model = CombSub(sampling_rate=SR, block_size=BLOCK, win_length=WIN,
                    n_mag_harmonic=BINS, n_mag_noise=BINS)
    wav = model.apply(
        {"params": blob["params"]},
        jnp.asarray(mel), jnp.asarray(f0[:, :, 0]), noise=jnp.asarray(noise),
    )
    wav = np.asarray(wav)
    assert wav.shape == ref_out.shape
    denom = np.abs(ref_out).max()
    assert denom > 1e-3  # the double actually produced signal
    mae = np.abs(wav - ref_out).max() / denom
    assert mae < 2e-3, f"relative max err {mae}"


def test_ddsp_wrapper_end_to_end(bundle, tmp_path):
    """DDSP vocoder wrapper: convert-on-first-use, native jitted synthesis."""
    jit_path, mel, f0, _, _ = bundle
    from diffsinger_tpu.vocoders.ddsp import DDSP

    hp = {"vocoder_ckpt": str(jit_path), "mel_base": "e",
          "audio_sample_rate": SR, "audio_num_mel_bins": MELS,
          "hop_size": BLOCK, "win_size": WIN}
    voc = DDSP(hp)
    wav = voc.spec2wav(mel[0] / 0.434294, f0=f0[0, :, 0])
    assert wav.shape == (mel.shape[1] * BLOCK,)
    assert np.isfinite(wav).all() and np.abs(wav).max() > 1e-4
    # conversion cached: a second construction must not need torch
    assert jit_path.with_suffix(".jit.dsckpt").exists()
    voc2 = DDSP(hp)
    wav2 = voc2.spec2wav(mel[0] / 0.434294, f0=f0[0, :, 0])
    np.testing.assert_allclose(wav, wav2, atol=1e-6)
