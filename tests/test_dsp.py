"""DSP parity tests: mel/STFT vs torch.stft + librosa-convention filterbank,
energy vs hand-rolled framing, smoothing vs reference conv semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from diffsinger_tpu.dsp.common import (
    amplitude_to_db,
    get_energy,
    interp_f0,
    rms_frames,
    sinusoidal_smooth,
    sinusoidal_smoothing_kernel,
)
from diffsinger_tpu.dsp.mel import (
    MelSpectrogram,
    hann_window_periodic,
    mel_filterbank,
    stft_magnitude,
)


def _torch_mel(y, sr=44100, n_mels=128, n_fft=2048, win=2048, hop=512, fmin=40, fmax=16000,
               keyshift=0, speed=1):
    """Reference mel front-end re-expressed with torch ops
    (modules/nsf_hifigan/nvSTFT.py:51-87), used as golden."""
    factor = 2 ** (keyshift / 12)
    n_fft_new = int(np.round(n_fft * factor))
    win_new = int(np.round(win * factor))
    hop_new = int(np.round(hop * speed))
    window = torch.hann_window(win_new)
    yt = torch.from_numpy(y).float()[None]
    yt = torch.nn.functional.pad(
        yt[None], ((win_new - hop_new) // 2, (win_new - hop_new + 1) // 2), mode="reflect"
    )[0]
    spec = torch.stft(
        yt, n_fft_new, hop_length=hop_new, win_length=win_new, window=window,
        center=False, pad_mode="reflect", normalized=False, onesided=True, return_complex=True,
    ).abs()
    if keyshift != 0:
        size = n_fft // 2 + 1
        resize = spec.size(1)
        if resize < size:
            spec = torch.nn.functional.pad(spec, (0, 0, 0, size - resize))
        spec = spec[:, :size, :] * win / win_new
    mel_basis = torch.from_numpy(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = torch.matmul(mel_basis, spec)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()[0]


@pytest.fixture(scope="module")
def wav(rng=None):
    g = np.random.default_rng(0)
    t = np.arange(44100 * 2) / 44100
    y = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 440 * t + 0.3)
    y += 0.05 * g.standard_normal(len(t))
    return y.astype(np.float32)


def test_mel_filterbank_matches_librosa_convention():
    try:
        import librosa

        golden = librosa.filters.mel(sr=44100, n_fft=2048, n_mels=128, fmin=40, fmax=16000)
        ours = mel_filterbank(44100, 2048, 128, 40, 16000)
        np.testing.assert_allclose(ours, golden, atol=2e-7)
    except ImportError:
        pytest.skip("librosa not available")


def test_hann_window_matches_torch():
    np.testing.assert_allclose(hann_window_periodic(2048), torch.hann_window(2048).numpy(), atol=1e-6)


def test_stft_magnitude_matches_torch(wav):
    window = jnp.asarray(hann_window_periodic(2048))
    ours = np.asarray(stft_magnitude(jnp.asarray(wav)[None], n_fft=2048, hop=512, win_size=2048, window=window))[0]
    golden = torch.stft(
        torch.from_numpy(wav)[None], 2048, hop_length=512, win_length=2048,
        window=torch.hann_window(2048), center=False, onesided=True, return_complex=True,
    ).abs().numpy()[0]
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("keyshift,speed", [(0, 1), (3, 1), (-2, 1), (0, 1.5)])
def test_mel_matches_reference_frontend(wav, keyshift, speed):
    mel = MelSpectrogram()
    ours = np.asarray(mel(jnp.asarray(wav)[None], keyshift=keyshift, speed=speed))[0]
    golden = _torch_mel(wav, keyshift=keyshift, speed=speed)
    assert ours.shape == golden.shape
    # log-domain agreement well below the 1e-3 MAE budget
    assert np.abs(ours - golden).mean() < 2e-4
    assert mel.num_frames(len(wav), keyshift=keyshift, speed=speed) == golden.shape[1]


def test_rms_energy_matches_librosa_convention(wav):
    frame, hop = 2048, 512
    ours = np.asarray(rms_frames(jnp.asarray(wav), frame_length=frame, hop=hop))
    pad = frame // 2
    ypad = np.pad(wav, (pad, pad))
    n_frames = 1 + (len(ypad) - frame) // hop
    golden = np.array([
        np.sqrt(np.mean(ypad[i * hop : i * hop + frame] ** 2)) for i in range(n_frames)
    ])
    np.testing.assert_allclose(ours, golden, atol=1e-6)
    db = get_energy(wav, n_frames, hop_size=hop, win_size=frame)
    assert db.shape == (n_frames,)
    assert db.max() <= 0.1  # signal is < 1.0 amplitude


def test_amplitude_to_db_top_db_clip():
    x = np.array([1.0, 1e-3, 1e-9])
    db = amplitude_to_db(x)
    assert db[0] == 0.0
    assert db[2] == -80.0  # clipped by top_db


def test_sinusoidal_smoothing_preserves_mean_and_matches_torch():
    k = 13
    curve = np.cumsum(np.random.default_rng(1).standard_normal(200)).astype(np.float32)
    ours = np.asarray(sinusoidal_smooth(jnp.asarray(curve)[None], kernel_size=k))[0]

    conv = torch.nn.Conv1d(1, 1, k, bias=False, padding="same", padding_mode="replicate")
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(sinusoidal_smoothing_kernel(k))[None, None])
        golden = conv(torch.from_numpy(curve)[None, None])[0, 0].numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-5)


@pytest.mark.parametrize("k", [1, 12, 13])
def test_sinusoidal_smooth_np_matches_jitted(k):
    """The host-side twin (used by inference preprocessing to avoid device
    round trips) must match the jitted op, including even kernel sizes where
    the replicate padding is asymmetric."""
    from diffsinger_tpu.dsp.common import sinusoidal_smooth_np

    curve = np.cumsum(np.random.default_rng(k).standard_normal((2, 150), np.float32), axis=-1)
    jitted = np.asarray(sinusoidal_smooth(jnp.asarray(curve), kernel_size=k))
    host = sinusoidal_smooth_np(curve, kernel_size=k)
    assert host.dtype == np.float32 and host.shape == curve.shape
    np.testing.assert_allclose(host, jitted, atol=1e-5)


def test_interp_f0():
    f0 = np.array([0, 0, 100, 0, 0, 200, 0], dtype=np.float64)
    out, uv = interp_f0(f0.copy())
    assert uv.tolist() == [True, True, False, True, True, False, True]
    np.testing.assert_allclose([out[0], out[-1]], [100, 200], rtol=1e-9)
    # log-domain midpoint: sqrt(100*200)
    np.testing.assert_allclose(out[3:5], [100 * 2 ** (1 / 3), 100 * 2 ** (2 / 3)], rtol=1e-6)


@pytest.mark.parametrize("n,keyshift,speed", [
    (44100, 0, 1), (44100 + 777, 0, 1), (30000, 2.37, 1),
    (30000, -4.9, 1), (52111, 0, 1.21),
])
def test_mel_bucketed_bitexact(wav, n, keyshift, speed):
    """bucketed() (host reflect-pad + quantized zero-tail + trim) is bitwise
    identical to the direct jitted call for the true frame count."""
    mel = MelSpectrogram()
    w = wav[:n]
    direct = np.asarray(mel(jnp.asarray(w)[None], keyshift=keyshift, speed=speed))[0]
    bucketed = mel.bucketed(w, keyshift=keyshift, speed=speed, quantum=128)
    assert bucketed.shape == direct.shape
    np.testing.assert_array_equal(bucketed, direct)


def test_mel_compile_count_bounded(wav):
    """Compile-count discipline for binarization-scale corpora:

    1. bucketed() canonicalizes the jit shape DOWN as well as up — item
       lengths that land exactly on a frame-bucket multiple must not leak the
       raw sample count into the jit key;
    2. the jit cache is keyed on the derived window/hop integers, so distinct
       augmentation keyshift/speed floats that round to the same STFT geometry
       share one compiled program."""
    mel = MelSpectrogram()
    base = mel._impl._cache_size()
    # exact bucket multiple: 128 frames * 512 hop
    mel.bucketed(wav[: 128 * 512], quantum=128)
    n1 = mel._impl._cache_size()
    # same bucket, different raw length (not a multiple)
    mel.bucketed(wav[: 128 * 512 - 300], quantum=128)
    mel.bucketed(wav[: 128 * 512 - 7777], quantum=128)
    assert mel._impl._cache_size() == n1, "same-bucket lengths recompiled"
    # nearby keyshift floats with identical derived win/n_fft: one program
    mel.bucketed(wav[: 128 * 512], keyshift=1.0, quantum=128)
    n2 = mel._impl._cache_size()
    mel.bucketed(wav[: 128 * 512], keyshift=1.0004, quantum=128)
    assert mel._impl._cache_size() == n2, "equal-geometry keyshifts recompiled"
    assert n1 > base  # sanity: the counter actually moves
