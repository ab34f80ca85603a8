"""Full training-loop smoke: binarize a tiny corpus, train the acoustic task a
few steps on the 8-device CPU mesh, checkpoint, resume, validate metrics."""

import pathlib
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from diffsinger_tpu.config import load_config
from tests.test_binarize import _make_corpus


@pytest.fixture(scope="module")
def acoustic_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train")
    raw, dict_path = _make_corpus(tmp, n_items=4)
    hp = load_config(str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "acoustic.yaml"), save_snapshot=False)
    work_dir = tmp / "exp"
    work_dir.mkdir()
    hp.update(
        binary_data_dir=str(tmp / "binary"),
        dictionary=str(dict_path),
        datasets=[{
            "raw_data_dir": str(raw), "speaker": "synth", "language": "zh",
            "test_prefixes": ["item0"],
        }],
        work_dir=str(work_dir),
        hidden_size=32, enc_layers=1, audio_num_mel_bins=16,
        backbone_args=dict(num_channels=32, num_layers=1, kernel_size=7,
                           dropout_rate=0.0, strong_cond=True),
        hnsep="comb",
        max_batch_frames=4000, max_batch_size=8,
        log_interval=2, val_check_interval=6, num_ckpt_keep=2,
        max_val_batch_size=2,
    )
    hp["shallow_diffusion_args"] = dict(
        hp["shallow_diffusion_args"],
        aux_decoder_args=dict(num_channels=16, num_layers=1, kernel_size=7, dropout_rate=0.1),
    )
    hp.pop("dictionaries", None)
    hp["binarization_args"] = dict(hp["binarization_args"], shuffle=False, num_workers=0)
    # binarize with the tiny mel setting
    from diffsinger_tpu.data.acoustic_binarizer import AcousticBinarizer

    AcousticBinarizer(hp).process()
    return hp


def test_acoustic_training_loop_and_resume(acoustic_setup):
    hp = acoustic_setup
    from diffsinger_tpu.training.acoustic_task import AcousticTask
    from diffsinger_tpu.utils.ckpt import list_checkpoints

    hp = dict(hp, profile_steps=2)  # also exercise the xprof capture path
    task = AcousticTask(hp)
    state = task.start(max_steps=7)
    assert int(state.step) == 7
    profile_dir = __import__("pathlib").Path(hp["work_dir"]) / "profile"
    assert profile_dir.exists() and any(profile_dir.rglob("*")), "no xprof trace captured"
    ckpts = list_checkpoints(hp["work_dir"])
    assert ckpts, "no checkpoints written"
    assert ckpts[-1][0] == 7

    # resume continues from the saved step (no profiling on the resume run)
    task2 = AcousticTask(acoustic_setup)
    state2 = task2.start(max_steps=10)
    assert int(state2.step) == 10
    steps = [s for s, _ in list_checkpoints(hp["work_dir"])]
    assert 10 in steps
    # metrics jsonl exists and has entries
    log_file = (np.sort([str(p) for p in
                 (__import__("pathlib").Path(hp["work_dir"]) / "lightning_logs" / "tb").glob("metrics.jsonl")]))
    assert len(log_file) == 1


def test_metrics_module():
    import jax.numpy as jnp

    from diffsinger_tpu.models.metrics import (
        MetricState, PhonemeDurationAccuracy, R2State, RawCurveAccuracy,
        RawCurveR2Score, RhythmCorrectness,
    )

    ph2word = jnp.asarray([[1, 1, 2, 2, 3, 3]])
    target = jnp.asarray([[2.0, 3.0, 4.0, 2.0, 5.0, 1.0]])
    # perfect prediction
    st = RhythmCorrectness(tolerance=0.05).update(MetricState(), target, target, ph2word)
    assert st.value() == 1.0
    st = PhonemeDurationAccuracy(tolerance=0.2).update(MetricState(), target, target, ph2word)
    assert st.value() == 1.0
    # word durations preserved but phonemes swapped within words -> rhythm ok
    pred = jnp.asarray([[3.0, 2.0, 2.0, 4.0, 1.0, 5.0]])
    st = RhythmCorrectness(tolerance=0.05).update(MetricState(), pred, target, ph2word)
    assert st.value() == 1.0
    st = PhonemeDurationAccuracy(tolerance=0.2).update(MetricState(), pred, target, ph2word)
    assert st.value() < 1.0

    curve_t = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    curve_p = curve_t + jnp.asarray([[0.1, -0.2, 0.9, 0.0]])
    st = RawCurveAccuracy(tolerance=0.5).update(MetricState(), curve_p, curve_t)
    assert st.value() == 0.75
    r2 = RawCurveR2Score().update(R2State(), curve_t, curve_t)
    assert abs(r2.value() - 1.0) < 1e-6
    r2b = RawCurveR2Score().update(R2State(), curve_p, curve_t)
    assert r2b.value() < 1.0


def test_staged_shallow_training_end_to_end(acoustic_setup, tmp_path):
    """The reference's two-stage shallow-diffusion recipe (BestPractices
    'Train auxiliary decoder and diffusion decoder separately') through the
    real loop: stage 1 trains encoder+denoiser with the aux decoder out of
    the graph; stage 2 resumes with the encoder frozen and only the aux
    decoder training (train_diffusion: false + frozen_params + the
    optimizer-state reset the structure change requires)."""
    import jax

    from diffsinger_tpu.training.acoustic_task import AcousticTask

    work = tmp_path / "staged"
    work.mkdir()
    base = dict(acoustic_setup, work_dir=str(work), val_check_interval=100)

    hp1 = dict(base)
    hp1["shallow_diffusion_args"] = dict(
        base["shallow_diffusion_args"],
        train_aux_decoder=False, train_diffusion=True, val_gt_start=True)
    state1 = AcousticTask(hp1).start(max_steps=4)

    # weight decay ON: pins the auto-freeze of the idle denoiser branch
    # (zero grads alone would not stop optax AdamW's decoupled decay)
    hp2 = dict(base, freezing_enabled=True, frozen_params=["model.fs2"],
               allow_optimizer_state_reset=True, lambda_aux_mel_loss=1.0,
               optimizer_args=dict(base["optimizer_args"], weight_decay=0.01))
    hp2["shallow_diffusion_args"] = dict(
        base["shallow_diffusion_args"],
        train_aux_decoder=True, train_diffusion=False)
    state2 = AcousticTask(hp2).start(max_steps=8)
    assert int(state2.step) == 8

    p1 = jax.device_get(state1.params)["params"]
    p2 = jax.device_get(state2.params)["params"]

    def flat(t):
        return {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_flatten_with_path(t)[0]}

    f1, f2 = flat(p1), flat(p2)
    assert f1.keys() == f2.keys()
    fs2_moved = [k for k in f1 if "'fs2'" in k
                 and not np.array_equal(f1[k], f2[k])]
    assert not fs2_moved, f"frozen encoder moved in stage 2: {fs2_moved[:3]}"
    den_moved = [k for k in f1 if "'denoiser'" in k
                 and not np.array_equal(f1[k], f2[k])]
    assert not den_moved, f"denoiser moved with train_diffusion=false: {den_moved[:3]}"
    aux_moved = [k for k in f1 if "'aux_decoder'" in k
                 and not np.array_equal(f1[k], f2[k])]
    assert aux_moved, "aux decoder did not train in stage 2"
