from .mel import MelSpectrogram, mel_filterbank, stft_magnitude

__all__ = ["MelSpectrogram", "mel_filterbank", "stft_magnitude"]
