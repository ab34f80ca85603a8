"""Cross-implementation conformance for native Harvest/D4C vs pyworld.

Two layers (VERDICT r2 missing-item #4):

1. **Signal-bank stability** — always runs. The deterministic fixture signals
   (`diffsinger_tpu/dsp/golden_signals.py`) must hash to the committed values
   in `tests/goldens/bank_hashes.json`; this is what lets a pyworld-equipped
   machine capture goldens against *identical* inputs
   (`tools/capture_world_goldens.py`).
2. **Golden comparison** — runs iff `tests/goldens/world_goldens.npz` exists
   (captured offline; pyworld cannot be installed here). Tolerances below are
   the documented compatibility contract for cross-binarizer datasets:
   reference binarizes via pw.harvest/pw.d4c (modules/pe/pw.py:7,
   utils/decomposed_waveform.py:129).

3. **Speech-shaped behavioral fixtures** — always run: formant-filtered pulse
   trains, breathy mixes, octave traps and f0 jumps exercise the estimators on
   the empirical regimes where implementations typically diverge.
"""

import json
import pathlib

import numpy as np
import pytest

from diffsinger_tpu.dsp import golden_signals as gs
from diffsinger_tpu.dsp.d4c import d4c
from diffsinger_tpu.dsp.harvest import harvest

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"
GOLDEN_NPZ = GOLDEN_DIR / "world_goldens.npz"

# Documented parity tolerances (the contract a mixed pyworld/native dataset
# relies on). Voiced/unvoiced decisions may differ on a small fraction of
# boundary frames; where both agree voiced, pitch must agree to ~a quarter
# semitone in the median and coarse aperiodicity bands to 0.15 mean abs.
VUV_AGREEMENT_MIN = 0.90
F0_MEDIAN_CENTS_MAX = 25.0
F0_P90_CENTS_MAX = 100.0
AP_BAND_MAD_MAX = 0.15


def test_signal_bank_matches_committed_hashes():
    committed = json.loads((GOLDEN_DIR / "bank_hashes.json").read_text())
    assert committed["bank_version"] == gs.BANK_VERSION
    assert gs.bank_hashes() == committed["signals"], (
        "golden_signals.py changed — regenerate bank_hashes.json, bump "
        "BANK_VERSION, and re-capture world_goldens.npz"
    )


def _native_harvest(wave):
    return harvest(wave, gs.FS, f0_floor=gs.F0_FLOOR, f0_ceil=gs.F0_CEIL,
                   frame_period=gs.FRAME_PERIOD_MS)


needs_goldens = pytest.mark.skipif(
    not GOLDEN_NPZ.exists(),
    reason="world_goldens.npz not captured — run tools/capture_world_goldens.py "
           "on a pyworld-equipped machine and commit the output",
)


@needs_goldens
@pytest.mark.parametrize("name", sorted(gs.signal_bank()))
def test_harvest_matches_pyworld_goldens(name):
    wave, _ = gs.signal_bank()[name]
    with np.load(GOLDEN_NPZ) as z:
        ref_f0 = z[f"harvest_f0/{name}"]
    f0, _pos = _native_harvest(wave)
    n = min(len(f0), len(ref_f0))
    f0, ref_f0 = f0[:n], ref_f0[:n]
    agree = ((f0 > 0) == (ref_f0 > 0)).mean()
    assert agree >= VUV_AGREEMENT_MIN, f"{name}: VUV agreement {agree:.2f}"
    both = (f0 > 0) & (ref_f0 > 0)
    if both.sum() >= 10:
        cents = np.abs(1200 * np.log2(f0[both] / ref_f0[both]))
        assert np.median(cents) <= F0_MEDIAN_CENTS_MAX, f"{name}: {np.median(cents):.1f} cents"
        assert np.percentile(cents, 90) <= F0_P90_CENTS_MAX, (
            f"{name}: p90 {np.percentile(cents, 90):.1f} cents"
        )


@needs_goldens
@pytest.mark.parametrize("name", ["steady_mid", "vowel_pulse", "breathy"])
def test_d4c_matches_pyworld_goldens(name):
    wave, _ = gs.signal_bank()[name]
    with np.load(GOLDEN_NPZ) as z:
        ref_f0 = z[f"harvest_f0/{name}"]
        ref_pos = z[f"harvest_pos/{name}"]
        ref_ap = z[f"d4c_ap/{name}"]
    ap = d4c(wave, ref_f0, ref_pos, gs.FS, gs.FFT_SIZE)
    # Compare on the reference's own coarse bands (3 kHz-wide mean bands),
    # interior voiced frames only — the deployed decomposition consumes
    # band-averaged aperiodicity, not per-bin values.
    n_bands = 5
    edges = np.linspace(0, ap.shape[1], n_bands + 1).astype(int)
    voiced = ref_f0 > 0
    voiced[:3] = voiced[-3:] = False
    assert voiced.sum() > 10
    for b in range(n_bands):
        ours = ap[voiced, edges[b]:edges[b + 1]].mean(axis=1)
        theirs = ref_ap[voiced, edges[b]:edges[b + 1]].mean(axis=1)
        mad = np.abs(ours - theirs).mean()
        assert mad <= AP_BAND_MAD_MAX, f"{name} band{b}: MAD {mad:.3f}"


def _golden_key_or_skip(z, key):
    if key not in z:
        pytest.skip(f"{key} absent — goldens captured before the synthesis keys "
                    "were added; re-run tools/capture_world_goldens.py")
    return z[key]


@needs_goldens
@pytest.mark.parametrize("name", ["steady_mid", "vowel_pulse", "breathy"])
def test_cheaptrick_matches_pyworld_goldens(name):
    """Native CheapTrick vs pw.cheaptrick on the same f0 contour: per-frame
    log-spectral distance over voiced interior frames."""
    import jax.numpy as jnp

    from diffsinger_tpu.dsp.world import cheaptrick

    wave, _ = gs.signal_bank()[name]
    with np.load(GOLDEN_NPZ) as z:
        ref_f0 = z[f"harvest_f0/{name}"]
        ref_sp = _golden_key_or_skip(z, f"cheaptrick_sp/{name}")
    env = np.asarray(cheaptrick(jnp.asarray(wave, jnp.float32),
                                jnp.asarray(ref_f0, jnp.float32),
                                fs=gs.FS, fft_size=gs.FFT_SIZE, hop=gs.HOP))
    n = min(len(env), len(ref_sp))
    voiced = ref_f0[:n] > 0
    voiced[:3] = voiced[-3:] = False
    ours_db = 10 * np.log10(np.maximum(env[:n][voiced], 1e-20))
    theirs_db = 10 * np.log10(np.maximum(ref_sp[:n][voiced], 1e-20))
    # compare where the envelope carries signal (within 60 dB of frame peak)
    sig = theirs_db > theirs_db.max(axis=1, keepdims=True) - 60.0
    mad_db = np.abs((ours_db - theirs_db)[sig]).mean()
    assert mad_db <= 6.0, f"{name}: envelope MAD {mad_db:.2f} dB"


@needs_goldens
@pytest.mark.parametrize("name", ["steady_mid", "vowel_pulse", "breathy"])
def test_synthesis_matches_pyworld_goldens(name):
    """Native synthesize_world fed pyworld's OWN sp/ap/f0 goldens must match
    pw.synthesize output: this isolates synthesis parity from analysis
    differences. The harmonic part is pulse-deterministic (same phase-wrap
    pulse positions and fractional shifts), so it must correlate strongly
    sample-for-sample; the aperiodic part uses a different noise stream, so
    it is compared on framewise energy profile."""
    from diffsinger_tpu.dsp.world import synthesize_world

    with np.load(GOLDEN_NPZ) as z:
        ref_f0 = z[f"harvest_f0/{name}"]
        ref_sp = _golden_key_or_skip(z, f"cheaptrick_sp/{name}").astype(np.float64)
        ref_ap = z[f"d4c_ap/{name}"].astype(np.float64)
        gold_harm = z[f"synth_harm/{name}"].astype(np.float64)
        gold_ap = z[f"synth_ap/{name}"].astype(np.float64)
    harm = synthesize_world(
        ref_f0, np.clip(ref_sp * (1 - ref_ap ** 2), 1e-16, None),
        np.zeros_like(ref_ap), gs.FS, gs.HOP, seed=0)
    aper = synthesize_world(
        ref_f0, ref_sp * ref_ap ** 2, np.ones_like(ref_ap), gs.FS, gs.HOP, seed=1)

    n = min(len(harm), len(gold_harm)) - 2 * gs.FFT_SIZE
    a, b = harm[gs.FFT_SIZE:n], gold_harm[gs.FFT_SIZE:n]
    corr = np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b) + 1e-30)
    assert corr > 0.9, f"{name}: harmonic waveform correlation {corr:.3f}"
    # matched energy scale
    ratio = np.sqrt(np.dot(a, a) / (np.dot(b, b) + 1e-30))
    assert 0.8 < ratio < 1.25, f"{name}: harmonic RMS ratio {ratio:.3f}"

    m = min(len(aper), len(gold_ap)) // gs.HOP * gs.HOP
    ours_e = np.square(aper[:m]).reshape(-1, gs.HOP).mean(axis=1)
    gold_e = np.square(gold_ap[:m]).reshape(-1, gs.HOP).mean(axis=1)
    sl = slice(4, len(ours_e) - 4)
    db = 10 * np.log10((ours_e[sl] + 1e-20) / (gold_e[sl] + 1e-20))
    assert np.abs(np.median(db)) < 3.0, f"{name}: aperiodic energy offset {np.median(db):.2f} dB"


# ------------------------------------------------- speech-shaped behavioral

def test_harvest_vowel_pulse_train():
    """Formant-filtered pulse train at 135 Hz: the spectral envelope peaks at
    F1=800 Hz, far above f0 — the estimator must still lock to the pulse rate."""
    wave, f0_true = gs.signal_bank()["vowel_pulse"]
    f0, _ = _native_harvest(wave)
    v = f0[f0 > 0]
    assert len(v) > 0.85 * len(f0)
    cents = np.abs(1200 * np.log2(v / f0_true))
    assert np.median(cents) < 20, np.median(cents)
    assert (cents > 600).mean() < 0.05  # essentially no octave errors


def test_harvest_octave_trap():
    """Dominant 2nd harmonic: must report 110 Hz, not 220 Hz."""
    wave, f0_true = gs.signal_bank()["octave_trap"]
    f0, _ = _native_harvest(wave)
    v = f0[5:-5][f0[5:-5] > 0]
    assert len(v) > 0
    cents = 1200 * np.abs(np.log2(np.median(v) / f0_true))
    assert cents < 50, f"median {np.median(v):.1f} Hz vs true {f0_true}"


def test_harvest_octave_jump():
    """Clean step 110 -> 220 Hz: each half converges to its own pitch with a
    short transition region."""
    wave, _ = gs.signal_bank()["octave_jump"]
    f0, pos = _native_harvest(wave)
    mid = len(wave) / 2 / gs.FS
    first = f0[(pos < mid - 0.05) & (f0 > 0)]
    second = f0[(pos > mid + 0.05) & (f0 > 0)]
    assert len(first) > 10 and len(second) > 10
    assert abs(np.median(first) - 110.0) < 3
    assert abs(np.median(second) - 220.0) < 6


def test_harvest_breathy_voiced():
    """-12 dB aspiration noise must not destroy voicing or pitch accuracy."""
    wave, f0_true = gs.signal_bank()["breathy"]
    f0, _ = _native_harvest(wave)
    v = f0[f0 > 0]
    assert len(v) > 0.85 * len(f0)
    cents = np.abs(1200 * np.log2(v / f0_true))
    assert np.median(cents) < 20


def test_d4c_breathy_intermediate_aperiodicity():
    """Breathy vowel: low band stays mostly periodic, high band (where the
    aspiration noise lives) reads clearly more aperiodic."""
    wave, f0_true = gs.signal_bank()["breathy"]
    n = len(wave) // gs.HOP
    pos = np.arange(n) * (gs.HOP / gs.FS)
    ap = d4c(wave, np.full(n, f0_true), pos, gs.FS, gs.FFT_SIZE)
    low = ap[5:-5, : round(1500 * gs.FFT_SIZE / gs.FS)].mean()
    high = ap[5:-5, round(8000 * gs.FFT_SIZE / gs.FS):].mean()
    assert low < 0.45, low
    assert high > low + 0.25, (low, high)
