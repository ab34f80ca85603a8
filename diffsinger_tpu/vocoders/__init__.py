from .registry import VOCODERS, get_vocoder_cls, register_vocoder

__all__ = ["VOCODERS", "register_vocoder", "get_vocoder_cls"]
