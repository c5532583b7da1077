"""bitswap_tpu — a TPU-native Bit-Swap / BB-ANS lossless compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
implementation of "Bit-Swap: Recursive Bits-Back Coding for Lossless
Compression with Hierarchical Latent Variables" (Kingma, Abbeel, Ho — ICML
2019).  The reference (/root/reference) is pure Python+PyTorch with a
per-symbol big-int rANS loop on the host; this framework keeps the entire
codec — hierarchical-VAE forward passes, CDF table construction, and the rANS
state machine itself — resident on the TPU, vectorized over independent
stream lanes, and scales over device meshes with jax.sharding.

Layout (mirrors SURVEY.md §7's layer order):
  ans/       rANS entropy coder: numpy golden reference, lane-parallel JAX
             coder (uint32 limb arithmetic), Pallas TPU kernel
  ops/       logistic-distribution math + discretization-bin primitives
  models/    hierarchical conv ResNet VAE (weight-norm convs, data-dependent
             init), functional JAX implementation
  codec/     Bit-Swap / BB-ANS sender+receiver drivers, latent discretization,
             container formats, block extraction
  train/     training runtime: warmup/train/test loops, EMA, checkpoints, data
  parallel/  device-mesh sharding for training (DP) and pod-scale encode
  utils/     config registry, profiling, logging
"""

__version__ = "0.1.0"
