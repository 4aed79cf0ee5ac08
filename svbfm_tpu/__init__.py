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

import os as _os

# Persistent XLA compilation cache: sweep programs over large sparse data
# take tens of seconds to compile (gather/scatter-heavy graphs); steady-state
# steps are sub-millisecond, so caching compilations across processes is the
# single biggest end-to-end win.  Opt out with SVBFM_NO_COMPILE_CACHE=1.
if _os.environ.get("SVBFM_NO_COMPILE_CACHE") != "1":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            _os.path.expanduser("~/.cache/svbfm_jax")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from svbfm_tpu.data.dataset import SparseDataset, SweepPlan  # noqa: F401
from svbfm_tpu.models.fm import FMParams, fm_predict  # noqa: F401
