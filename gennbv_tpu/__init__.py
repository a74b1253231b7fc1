"""gennbv-tpu: a TPU-native active-3D-reconstruction RL framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of zjwzcx/GenNBV
(CVPR 2024): vectorized next-best-view drone envs with on-device depth
rendering, probabilistic occupancy mapping, surface-coverage rewards, a
hybrid grid+pose policy encoder, and a PPO learner — all jit-compiled and
sharded over TPU meshes.
"""
__version__ = "0.1.0"
