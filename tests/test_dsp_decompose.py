"""Tests: complex STFT/iSTFT parity vs torch, harmonic decomposition sanity,
and pitch-extractor accuracy on synthetic signals."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from diffsinger_tpu.dsp.stft import istft, nuttall_window, stft_complex
from diffsinger_tpu.dsp.decomposed_waveform import DecomposedWaveform
from diffsinger_tpu.dsp.pe import AcfPE, initialize_pe

SR = 44100


def _harmonic_signal(f0=220.0, seconds=1.0, harmonics=(1.0, 0.5, 0.25), noise=0.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    y = sum(a * np.sin(2 * np.pi * f0 * (k + 1) * t) for k, a in enumerate(harmonics))
    if noise:
        y = y + noise * np.random.default_rng(0).standard_normal(len(t))
    return (0.3 * y / np.abs(y).max()).astype(np.float32)


def test_stft_complex_matches_torch():
    y = _harmonic_signal(noise=0.3)[: SR // 2]
    win, hop = 2048, 512
    w = nuttall_window(win)
    ours = np.asarray(stft_complex(jnp.asarray(y)[None], n_fft=win, hop=hop, win_size=win,
                                   window=jnp.asarray(w), center=True))[0]
    golden = torch.stft(
        torch.from_numpy(y)[None], n_fft=win, hop_length=hop, win_length=win,
        window=torch.from_numpy(w), center=True, return_complex=True,
    ).numpy()[0].T  # [F, K]
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours.real, golden.real, atol=2e-3)
    np.testing.assert_allclose(ours.imag, golden.imag, atol=2e-3)


def test_istft_roundtrip_matches_torch():
    y = _harmonic_signal(noise=0.3)[: SR // 2]
    win, hop = 2048, 512
    w = nuttall_window(win)
    spec = stft_complex(jnp.asarray(y)[None], n_fft=win, hop=hop, win_size=win,
                        window=jnp.asarray(w), center=True)
    ours = np.asarray(istft(spec, n_fft=win, hop=hop, win_size=win, window=jnp.asarray(w),
                            center=True, length=len(y)))[0]
    spec_t = torch.from_numpy(np.asarray(spec)[0].T[None])
    golden = torch.istft(spec_t, n_fft=win, hop_length=hop, win_length=win,
                         window=torch.from_numpy(w), center=True, length=len(y)).numpy()[0]
    np.testing.assert_allclose(ours, golden, atol=2e-4)
    # roundtrip reconstructs the signal away from the edges
    np.testing.assert_allclose(ours[win : len(y) - win], y[win : len(y) - win], atol=1e-3)


def test_comb_decomposition_separates_harmonics_from_noise():
    f0_hz = 220.0
    clean = _harmonic_signal(f0_hz, noise=0.0)
    noise = (0.05 * np.random.default_rng(1).standard_normal(len(clean))).astype(np.float32)
    y = clean + noise
    n_frames = len(y) // 512 + 1
    f0 = np.full(n_frames, f0_hz, np.float32)

    dec = DecomposedWaveform(y, SR, f0, hop_size=512, fft_size=2048, win_size=2048,
                             algorithm="comb")
    harm = dec.harmonic()
    ap = dec.aperiodic()
    assert harm.shape == y.shape and ap.shape == y.shape
    sl = slice(4096, len(y) - 4096)
    # harmonic part carries most of the clean signal's energy
    corr = np.corrcoef(harm[sl], clean[sl])[0, 1]
    assert corr > 0.95, corr
    # aperiodic part is mostly the noise: much lower energy than harmonic
    assert np.mean(ap[sl] ** 2) < 0.3 * np.mean(harm[sl] ** 2)


def test_kth_harmonic_isolates_fundamental():
    f0_hz = 220.0
    y = _harmonic_signal(f0_hz, harmonics=(1.0, 0.8, 0.6))
    n_frames = len(y) // 512 + 1
    f0 = np.full(n_frames, f0_hz, np.float32)
    dec = DecomposedWaveform(y, SR, f0, hop_size=512, fft_size=2048, win_size=2048,
                             algorithm="comb")
    h0 = dec.harmonic(0)
    sl = slice(4096, len(y) - 4096)
    spec = np.abs(np.fft.rfft(h0[sl]))
    freqs = np.fft.rfftfreq(len(h0[sl]), 1 / SR)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - f0_hz) < 5.0, peak
    # energy at the 2nd harmonic should be strongly suppressed
    band = lambda f: spec[(freqs > f - 20) & (freqs < f + 20)].max()
    assert band(2 * f0_hz) < 0.05 * band(f0_hz)


@pytest.mark.parametrize("f0_true", [110.0, 220.0, 440.0])
def test_acf_pitch_extractor_accuracy(f0_true):
    y = _harmonic_signal(f0_true, seconds=0.7, noise=0.02)
    length = len(y) // 512 + 1
    pe = AcfPE()
    f0, uv = pe.get_pitch(y, SR, length, hop_size=512, f0_min=65, f0_max=1100)
    assert f0.shape == (length,)
    voiced = f0[~uv]
    assert len(voiced) > 0.8 * length
    err_cents = 1200 * np.abs(np.log2(voiced / f0_true))
    assert np.median(err_cents) < 15, np.median(err_cents)


@pytest.mark.parametrize("f0_true", [110.0, 220.0, 440.0])
def test_acf_pitch_very_accurate_mode(f0_true):
    """Praat 'very accurate' variant (Gaussian window + sinc interpolation,
    reference contract: parselmouth to_pitch_ac(very_accurate=...)): must be
    at least as accurate as the default parabolic mode on a clean harmonic."""
    y = _harmonic_signal(f0_true, seconds=0.7, noise=0.02)
    length = len(y) // 512 + 1
    f0_d, uv_d = AcfPE().get_pitch(y, SR, length, hop_size=512, f0_min=65, f0_max=1100)
    f0_a, uv_a = AcfPE(very_accurate=True).get_pitch(
        y, SR, length, hop_size=512, f0_min=65, f0_max=1100)
    voiced_a = f0_a[~uv_a]
    assert len(voiced_a) > 0.8 * length
    err_a = np.median(1200 * np.abs(np.log2(voiced_a / f0_true)))
    err_d = np.median(1200 * np.abs(np.log2(f0_d[~uv_d] / f0_true)))
    assert err_a < 5, err_a
    assert err_a <= err_d + 0.5, (err_a, err_d)


def test_acf_pitch_viterbi_glide_has_no_octave_jumps():
    # a 150->300 Hz glide with rich harmonics: the per-frame argmax is prone to
    # octave/harmonic locking; the Viterbi octave-jump cost must keep the path
    # continuous
    seconds = 1.0
    t = np.arange(int(SR * seconds)) / SR
    f0_t = 150.0 * (2.0 ** (t / seconds))  # one octave over the clip
    phase = 2 * np.pi * np.cumsum(f0_t) / SR
    y = sum(0.6 ** k * np.sin((k + 1) * phase) for k in range(6))
    y = (0.3 * y / np.abs(y).max()).astype(np.float32)
    length = len(y) // 512 + 1
    pe = AcfPE()
    f0, uv = pe.get_pitch(y, SR, length, hop_size=512, f0_min=65, f0_max=1100)
    hop_centers = np.arange(length) * 512 / SR
    f0_true = 150.0 * (2.0 ** np.clip(hop_centers / seconds, 0, 1))
    voiced = ~uv
    assert voiced.mean() > 0.8
    err_cents = 1200 * np.abs(np.log2(f0[voiced] / f0_true[voiced]))
    assert np.median(err_cents) < 20, np.median(err_cents)
    # no octave jumps between consecutive voiced frames
    vf = f0[voiced]
    jumps = np.abs(np.log2(vf[1:] / vf[:-1]))
    assert jumps.max() < 0.5, jumps.max()


def test_acf_pitch_voiced_unvoiced_segmentation():
    # tone | silence | tone: the unvoiced candidate must win in the gap
    tone = _harmonic_signal(220.0, seconds=0.3)
    gap = np.zeros(int(SR * 0.3), np.float32)
    y = np.concatenate([tone, gap, tone])
    length = len(y) // 512 + 1
    pe = AcfPE()
    f0, uv = pe.get_pitch(y, SR, length, hop_size=512)
    n = int(SR * 0.3) // 512
    # interior of each segment (skip boundary frames blurred by the window)
    assert (~uv[4 : n - 4]).mean() > 0.9
    assert uv[n + 6 : 2 * n - 6].all()
    assert (~uv[2 * n + 4 : 3 * n - 4]).mean() > 0.9


def test_acf_pitch_silence_is_unvoiced():
    y = np.zeros(SR // 2, np.float32)
    pe = AcfPE()
    f0, uv = pe.get_pitch(y, SR, 40, hop_size=512)
    assert uv.all()
    # interp of an all-unvoiced signal stays zero
    f0i, uvi = pe.get_pitch(y, SR, 40, hop_size=512, interp_uv=True)
    assert uvi.all()


def test_pe_registry():
    from diffsinger_tpu.dsp.pe import HarvestPE

    pe = initialize_pe({"pe": "parselmouth"})
    assert isinstance(pe, AcfPE)
    assert isinstance(initialize_pe({"pe": "harvest"}), HarvestPE)
    with pytest.raises(ValueError):
        initialize_pe({"pe": "nope"})
