"""Griffin–Lim evaluation vocoder: mel round-trip fidelity.

Contract: for a harmonic signal, get_mel(spec2wav(get_mel(y))) must stay
close to get_mel(y) — the inversion preserves the log-mel content it was
given (reference has no analogue; this is the in-env evaluation vocoder
used when no NSF-HiFiGAN checkpoint exists, see docs/perf/overfit.json).
"""

import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.dsp.griffin_lim import GriffinLimVocoder
from diffsinger_tpu.dsp.mel import MelSpectrogram

SR = 44100


def _harmonic(f0, seconds, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    y = sum(0.5 ** k * np.sin(2 * np.pi * f0 * (k + 1) * t) for k in range(6))
    return (0.5 * y / np.max(np.abs(y))).astype(np.float32)


def test_griffin_lim_mel_round_trip():
    mel_op = MelSpectrogram(sr=SR, n_mels=128)
    y = _harmonic(220.0, 1.0)
    gt_mel = np.asarray(mel_op(jnp.asarray(y)[None])[0]).T  # [T, 128]

    voc = GriffinLimVocoder(sr=SR, n_mels=128, n_iter=32)
    wav = voc.spec2wav(gt_mel)
    assert wav.dtype == np.float32 and np.all(np.isfinite(wav))
    assert np.max(np.abs(wav)) > 0.05  # audibly non-silent
    assert np.max(np.abs(wav)) <= 1.0

    rec_mel = np.asarray(
        mel_op(jnp.asarray(wav[: len(y)])[None])[0]
    ).T[: gt_mel.shape[0]]
    mae = float(np.mean(np.abs(rec_mel - gt_mel[: rec_mel.shape[0]])))
    # log-e mel; clip floor is log(1e-5) ≈ -11.5, harmonic peaks ≈ 0..4
    assert mae < 0.35, f"round-trip log-mel MAE too high: {mae}"


def test_griffin_lim_batched_matches_single():
    mel_op = MelSpectrogram(sr=SR, n_mels=128)
    y = _harmonic(150.0, 0.6)
    gt_mel = np.asarray(mel_op(jnp.asarray(y)[None])[0]).T
    voc = GriffinLimVocoder(sr=SR, n_mels=128, n_iter=8)
    single = voc.spec2wav(gt_mel)
    batched = voc.spec2wav(np.stack([gt_mel, gt_mel]))
    assert batched.shape[0] == 2
    np.testing.assert_allclose(batched[0], single, atol=1e-5)
