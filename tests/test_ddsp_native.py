"""Native DDSP vocoder tests: synthesis physics and trainability."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsinger_tpu.vocoders.ddsp_native import (
    DDSPGenerator, filtered_noise, harmonic_synth, multi_resolution_stft_loss,
)

SR, HOP = 44100, 512


def test_harmonic_synth_frequency_and_antialiasing():
    f0 = jnp.full((1, 40), 440.0)
    amps = jnp.zeros((1, 40, 8)).at[:, :, 0].set(1.0)
    wav = np.asarray(harmonic_synth(f0, amps, HOP, SR))[0]
    spec = np.abs(np.fft.rfft(wav))
    freqs = np.fft.rfftfreq(len(wav), 1 / SR)
    assert abs(freqs[np.argmax(spec)] - 440.0) < 3.0
    # harmonic above nyquist is muted: fundamental 15kHz, 2nd harmonic 30kHz > 22.05k
    f0_hi = jnp.full((1, 40), 15000.0)
    amps2 = jnp.zeros((1, 40, 2)).at[:, :, 1].set(1.0)  # only the 2nd harmonic
    wav2 = np.asarray(harmonic_synth(f0_hi, amps2, HOP, SR))[0]
    assert np.abs(wav2).max() < 1e-6


def test_filtered_noise_band_shaping():
    t, n = 32, 65
    mags = jnp.zeros((1, t, n))
    # pass band: lowest third of the spectrum only
    mags = mags.at[:, :, : n // 3].set(1.0)
    wav = np.asarray(filtered_noise(mags, HOP, jax.random.PRNGKey(0)))[0]
    spec = np.abs(np.fft.rfft(wav))
    freqs = np.fft.rfftfreq(len(wav), 1 / SR)
    # band edge: (n//3) / (n-1) * nyquist
    edge = (n // 3) / (n - 1) * SR / 2
    low = spec[freqs < edge * 0.8].mean()
    high = spec[freqs > edge * 1.5].mean()
    assert low > 10 * high


@pytest.mark.slow
def test_ddsp_generator_trains():
    model = DDSPGenerator(hop_size=HOP, sampling_rate=SR, n_harmonics=16, n_noise_bands=33)
    mel = jnp.asarray(np.random.default_rng(0).uniform(-8, 0, (1, 16, 32)).astype(np.float32))
    f0 = jnp.full((1, 16), 220.0)
    params = model.init(jax.random.PRNGKey(0), mel, f0)
    target = np.asarray(harmonic_synth(f0, jnp.ones((1, 16, 1)) * 0.3, HOP, SR))

    def loss_fn(p):
        wav = model.apply(p, mel, f0, rng=jax.random.PRNGKey(1))
        return multi_resolution_stft_loss(wav, jnp.asarray(target))

    loss0, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss0))
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert any(n > 0 for n in norms) and all(np.isfinite(n) for n in norms)
