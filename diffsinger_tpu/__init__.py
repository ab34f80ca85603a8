"""DiffSinger-TPU: a TPU-native (JAX/XLA/Pallas/pjit) singing-voice-synthesis framework.

Provides the full capability surface of the OpenVPI DiffSinger fork (see SURVEY.md):
.ds score -> variance models (duration / pitch / variance curves) -> acoustic model
(diffusion / rectified flow over mel) -> NSF-HiFiGAN vocoder -> 44.1 kHz waveform,
plus binarization, training, and deployment-oriented export.

Everything on the compute path is jit-compiled JAX designed for TPU:
channel-last layouts, static shapes with bucketing, `lax.scan` samplers, and
`jax.sharding.Mesh`-based data parallelism.
"""

__version__ = "0.1.0"
