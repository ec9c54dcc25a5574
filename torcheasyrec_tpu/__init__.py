"""TorchEasyRec-TPU: a TPU-native recommender framework (JAX/XLA/Pallas).

Config-driven training/eval/export/inference for industrial recommender
models, config-compatible with TorchEasyRec's proto text-format pipeline
configs, re-designed TPU-first: SPMD over a jax.sharding.Mesh, a fused
row-sharded embedding engine with sparse in-step optimizer updates, and
Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"
