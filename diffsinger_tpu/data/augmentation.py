"""Pitch-shift / time-stretch augmentation (reference augmentation/spec_stretch.py
+ basics/base_augmentation.py).

Re-extracts the mel with the keyshift/speed-scaled STFT (our MelSpectrogram
supports both), rescales durations and f0, and resamples variance curves.
"""

from __future__ import annotations

from copy import deepcopy

import numpy as np

from diffsinger_tpu.utils.infer_utils import load_wav, resample_align_curve

VARIANCE_CHECKLIST = ["energy", "breathiness", "voicing", "tension"]


def require_same_keys(func):
    def run(self, item, **kwargs):
        res = func(self, item, **kwargs)
        assert set(item.keys()) == set(res.keys()), (
            "Item keys mismatch after augmentation.\n"
            f"Before: {sorted(item.keys())}\nAfter: {sorted(res.keys())}"
        )
        return res

    return run


class BaseAugmentation:
    def __init__(self, hparams: dict, augmentation_args: dict):
        self.hparams = hparams
        self.augmentation_args = augmentation_args
        self.timestep = hparams["hop_size"] / hparams["audio_sample_rate"]

    def process_item(self, item: dict, **kwargs) -> dict:
        raise NotImplementedError()


class SpectrogramStretchAugmentation(BaseAugmentation):
    def __init__(self, hparams: dict, augmentation_args: dict, pe=None, mel_spec=None):
        super().__init__(hparams, augmentation_args)
        self.pe = pe
        self.mel_spec = mel_spec

    @require_same_keys
    def process_item(self, item: dict, key_shift=0.0, speed=1.0, replace_spk_id=None) -> dict:
        from diffsinger_tpu.data.acoustic_binarizer import dur_sec_to_mel2ph

        hp = self.hparams
        aug_item = deepcopy(item)
        waveform, _ = load_wav(aug_item["wav_fn"], target_sr=hp["audio_sample_rate"])
        mel = self.mel_spec.bucketed(waveform, keyshift=key_shift, speed=speed).T
        aug_item["mel"] = mel.astype(np.float32)

        if speed != 1.0 or hp.get("use_speed_embed", False):
            aug_item["length"] = mel.shape[0]
            real_speed = int(np.round(hp["hop_size"] * speed)) / hp["hop_size"]
            aug_item["speed"] = real_speed
            aug_item["seconds"] /= real_speed
            aug_item["ph_dur"] = aug_item["ph_dur"] / real_speed
            aug_item["mel2ph"] = dur_sec_to_mel2ph(
                aug_item["ph_dur"], aug_item["length"], self.timestep
            )
            f0, _ = self.pe.get_pitch(
                waveform, samplerate=hp["audio_sample_rate"], length=aug_item["length"],
                hop_size=hp["hop_size"], f0_min=hp["f0_min"], f0_max=hp["f0_max"],
                speed=speed, interp_uv=True,
            )
            aug_item["f0"] = f0.astype(np.float32)
            # variance curves resampled by speed (see the reference's note at
            # augmentation/spec_stretch.py:55-77 about this approximation)
            for v_name in VARIANCE_CHECKLIST:
                if v_name in item:
                    aug_item[v_name] = resample_align_curve(
                        aug_item[v_name],
                        original_timestep=self.timestep,
                        target_timestep=self.timestep * real_speed,
                        align_length=aug_item["length"],
                    )

        if key_shift != 0.0 or hp.get("use_key_shift_embed", False):
            if replace_spk_id is None:
                aug_item["key_shift"] = key_shift
            else:
                aug_item["spk_id"] = replace_spk_id
            aug_item["f0"] = aug_item["f0"] * 2 ** (key_shift / 12)

        return aug_item
