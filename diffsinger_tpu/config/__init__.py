from .hparams import load_config, HParams, override_config

__all__ = ["load_config", "HParams", "override_config"]
