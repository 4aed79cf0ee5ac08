"""svbfm_tpu — TPU-native Scalable Variational Bayesian Factorization Machines.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
rishabhmisra/Scalable-Variational-Bayesian-Factorization-Machine (a libFM
1.4.2 fork with VBFM/OVBFM inference).  The reference is a single-process
C++ program built around serial Gauss-Seidel coordinate sweeps; this
framework reformulates every learner as vectorized, conflict-free binned
column sweeps that run as fused XLA/Pallas programs on TPU, and scales over
a ``jax.sharding.Mesh`` with psum'd sufficient statistics.

Inference menu (parity with the reference CLI ``-method`` flag):
  sgd, sgda, sgd_online, als, mcmc, vb, vb_online, exp_sgd, exp_sgd_stoc
"""

__version__ = "0.1.0"

from svbfm_tpu.data.dataset import SparseDataset, SweepPlan  # noqa: F401
from svbfm_tpu.models.fm import FMParams, fm_predict  # noqa: F401
