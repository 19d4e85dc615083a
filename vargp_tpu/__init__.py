"""vargp_tpu — a TPU-native JAX framework for Variational Auto-Regressive
Gaussian Processes for continual learning.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the full
capability surface of the reference research codebase (VAR-GPs, Kapoor,
Karaletsos & Bui, ICML 2021): continual-learning sparse GPs with Bayesian
kernel hyperparameters, MC softmax likelihoods, split/permuted-MNIST and toy
task streams, global-SVGP and retraining ablations.

Layer map (mirrors reference layers, TPU-first design):
  gpmath/       L0 numerical primitives (tril packing, jittered Cholesky,
                whitened conditionals, closed-form MVN KL/logpdf)
  ops/          Pallas TPU kernels + backend dispatch (fused RBF Gram, ...)
  kernels/      RBF-ARD with variational log-hyperparameters; deep kernel
  likelihoods/  MC multiclass softmax; Gaussian
  models/       VARGP, GlobalContinualSVGP, VARGPRetrain (pure-function ELBOs)
  parallel/     device mesh, sharding rules, sharded train/eval steps
  train/        optax(Yogi) loops, early stopping, metrics (acc/entropy/BWT)
  data/         toy 4-cluster stream, MNIST (IDX loader + synthetic fallback),
                split/permuted task streams
  experiments/  CLI entry points matching the reference experiment protocol
"""

__version__ = "0.1.0"

from vargp_tpu import gpmath, kernels, likelihoods, models, train, data

__all__ = [
    "gpmath",
    "kernels",
    "likelihoods",
    "models",
    "train",
    "data",
    "__version__",
]
