"""Variance training-loop smoke with validation metrics/plots."""

import pathlib
import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from diffsinger_tpu.config import load_config
from tests.test_binarize import _make_corpus


def test_variance_training_loop(tmp_path):
    raw, dict_path = _make_corpus(tmp_path, n_items=4)
    hp = load_config(str(pathlib.Path(__file__).resolve().parents[1] / "configs" / "variance.yaml"), save_snapshot=False)
    work_dir = tmp_path / "exp"
    work_dir.mkdir()
    hp.update(
        binary_data_dir=str(tmp_path / "binary"),
        dictionary=str(dict_path),
        datasets=[{
            "raw_data_dir": str(raw), "speaker": "synth", "language": "zh",
            "test_prefixes": ["item0"],
        }],
        work_dir=str(work_dir),
        hidden_size=32, enc_layers=1,
        predict_energy=True,
        hnsep="comb",
        max_batch_frames=4000, max_batch_size=8,
        log_interval=2, val_check_interval=4, num_ckpt_keep=2,
        max_val_batch_size=2, num_valid_plots=2,
    )
    hp["dur_prediction_args"] = dict(hp["dur_prediction_args"], hidden_size=32, num_layers=2)
    hp["pitch_prediction_args"] = dict(
        hp["pitch_prediction_args"], repeat_bins=8,
        backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
    )
    hp["variances_prediction_args"] = dict(
        hp["variances_prediction_args"], total_repeat_bins=8,
        backbone_args=dict(num_layers=2, num_channels=16, dilation_cycle_length=2),
    )
    hp.pop("dictionaries", None)
    hp["binarization_args"] = dict(hp["binarization_args"], shuffle=False, num_workers=0)

    from diffsinger_tpu.data.variance_binarizer import VarianceBinarizer

    VarianceBinarizer(hp).process()

    from diffsinger_tpu.training.variance_task import VarianceTask

    task = VarianceTask(hp)
    state = task.start(max_steps=5)
    assert int(state.step) == 5

    # metrics jsonl contains validation metrics incl. the objective ones
    metrics_file = work_dir / "lightning_logs" / "tb" / "metrics.jsonl"
    assert metrics_file.exists()
    tags = set()
    with open(metrics_file) as f:
        for line in f:
            tags.update(k for k in json.loads(line) if k != "step")
    assert any("dur_loss" in t for t in tags)
    assert any("pitch_loss" in t for t in tags)
    assert any("rhythm_corr" in t for t in tags)
    assert any("pitch_acc" in t for t in tags)
    assert any("energy_r2" in t for t in tags)
