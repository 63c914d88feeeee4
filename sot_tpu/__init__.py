"""sot_tpu — a TPU-native (JAX/XLA/Pallas) spectral-optimal-transport DDSP framework.

A ground-up rebuild of the capabilities of
``bernardo-torres/1d-spectral-optimal-transport`` (ICASSP 2024,
"Unsupervised Harmonic Parameter Estimation Using Differentiable DSP and
Spectral Optimal Transport") designed TPU-first:

* functional core — every op is a pure, ``jax.jit``-able function over pytrees
* MXU-friendly feature transforms (STFT framing as gather+matmul, CQT as a
  precomputed kernel-bank convolution)
* the 1D spectral optimal-transport loss (sort / cumulative CDF / quantile
  matching) as fused XLA and Pallas kernels with custom VJPs
* scaling via a single ``jax.sharding.Mesh`` threaded through ``shard_map``:
  batch data-parallelism, frequency-sharded loss reductions (``psum`` /
  ``all_gather``) and frame-sharded STFT with overlap-save halo exchange
  (``ppermute``)

Layer map (mirrors SURVEY.md section 1):
  ops/numerics   L0  scaling + safe math
  ops/*          L1  DSP kernels (oscillator bank, resampling, FIR, STFT, CQT)
  features       L2  feature transforms with frequency metadata
  models/        L3  PESTO encoder + frozen sinusoidal synth
  losses,metrics L4  SOT/MSS losses and evaluation metrics
  training/      L5  explicit jitted train loop + Orbax checkpointing
  configs,cli    L6  experiment registry + CLI
  data           L7  synthetic harmonic-sinusoid datasets
  eval_paper     L8  paper-table reproduction harness
  parallel/      —   mesh + sharded ops
"""

__version__ = "0.2.0"
