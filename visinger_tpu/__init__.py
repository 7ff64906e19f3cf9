"""visinger_tpu — a TPU-native (JAX/XLA/Pallas) singing-voice-synthesis framework.

A ground-up rebuild of the capabilities of jisang93/VISinger (an unofficial
PyTorch implementation of VISinger, Zhang et al. 2022) designed for TPU
hardware: channels-last layouts, static shapes, fused pjit train steps, and
XLA collectives over a device mesh instead of NCCL DDP.

Package layout:
  config/    — YAML-inheritance experiment config -> immutable Config tree
  ops/       — stateless array ops (masking, alignment gather, STFT/mel, pallas)
  modules/   — flax.linen building blocks (rel-attention, WaveNet, HiFi-GAN, ...)
  models/    — model assembly (VISinger, MultiPeriodDiscriminator)
  training/  — losses, fused GAN train step, trainer loop, checkpointing
  data/      — offline preprocessing/binarization + online bucketed batching
  parallel/  — mesh construction and sharding specs
  infer/     — MIDI -> waveform inference pipeline
  utils/     — audio/text/host-side helpers
"""

__version__ = "0.1.0"
