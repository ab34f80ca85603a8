"""Vocoder registry (reference modules/vocoders/registry.py:4-21)."""

from __future__ import annotations

VOCODERS = {}


def register_vocoder(cls):
    VOCODERS[cls.__name__.lower()] = cls
    VOCODERS[cls.__name__] = cls
    return cls


def get_vocoder_cls(hparams: dict):
    # lazy imports so registration happens on demand
    from diffsinger_tpu.vocoders import ddsp, nsf_hifigan  # noqa: F401

    return VOCODERS[hparams["vocoder"]]
