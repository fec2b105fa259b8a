"""deep_kernel_transfer_tpu — a TPU-native deep-kernel few-shot learning framework.

A from-scratch JAX/Flax/Pallas rebuild of the capability surface of
BayesWatch/deep-kernel-transfer ("Bayesian Meta-Learning for the Few-Shot
Setting via Deep Kernels", NeurIPS 2020): an ExactGP engine (no GPyTorch),
episodic meta-learning methods (DKT, ProtoNet, MatchingNet, RelationNet,
MAML, Baseline/++, FeatureTransfer), Flax backbones, an episodic data
pipeline, and TPU-first batched/sharded execution.

Design principles (TPU-native, not a port):
  * The GP engine is pure functional jax.numpy + Pallas: Gram assembly,
    jittered Cholesky, triangular solves, MLL and posterior are all
    jit/vmap/grad-compatible pure functions.
  * One-vs-rest GP classification is a *batched* [n_way, N, N] Cholesky
    (vmap over the way axis), replacing the reference's sequential
    IndependentModelList python loop (reference methods/DKT.py:68-71).
  * Episodes batch along a leading axis and shard over a device mesh
    ("dp" axis) via jax.sharding; gradients reduce over ICI collectives.
"""

__version__ = "0.1.0"
