"""MC-PILCO-TPU: a TPU-native Monte-Carlo PILCO framework (JAX/XLA/Pallas/pjit).

A from-scratch re-design of the capabilities of merlresearch/MC-PILCO
(reference layout documented in SURVEY.md) built TPU-first:

- Gaussian-process dynamics models as *stacked multi-head* GPs: hyperparameters
  of all output heads live in one pytree with a leading head axis and are
  trained by a single jitted ``vmap`` + ``lax.scan`` marginal-likelihood loop.
- Monte-Carlo particle rollouts as ``lax.scan`` over the horizon, batched over
  particles, differentiable end-to-end (reparameterized sampling).
- The whole policy-optimization loop (Adam, exponential-smoothing convergence
  monitor, learning-rate / dropout schedule, NaN guard + policy re-init) is a
  single compiled program: no host round-trips per step.
- Multi-chip scaling via ``jax.sharding.Mesh`` over the particle axis.

Subpackages
-----------
- :mod:`mcpilco_tpu.models`   kernels, GP regression, dynamics models, policies, costs
- :mod:`mcpilco_tpu.ops`      numerical kernels (masked Cholesky, Pallas Gram ops)
- :mod:`mcpilco_tpu.control`  rollout engine, trainers, the MC-PILCO orchestrator
- :mod:`mcpilco_tpu.envs`     on-device ODE plants + host-side system protocol
- :mod:`mcpilco_tpu.parallel` device mesh and sharding helpers
- :mod:`mcpilco_tpu.utils`    PRNG threading and checkpointing
"""

__version__ = "0.1.0"
