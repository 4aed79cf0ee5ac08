"""Beyond-HBM batch VB: out-of-core (-cache_size) windowed training.

Trains batch VBFM on KDD-scale row counts (default 263M — the paper's
largest dataset, where it reports ONLY the online methods fit in its
16 GB) on ONE chip via learners.vb_windowed: row data and column-bucket
plans stream host->device one window per pass while the e/t and flat
q/tq/tz caches stay device-resident.  Netflix-shaped synthetic ratings
(the generator of bench_vb_big, row count scaled up).

Usage: python scripts/bench_vb_windowed.py [rows] [K] [factor_block]
                                           [iters] [num_windows] [method]

``method`` is ``vb`` (default), ``mcmc`` (windowed Gibbs) or ``als``
(learners.mcmc_windowed — the -cache_size path for the MCMC family).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import sys
import time

import numpy as np

from bench_vb_big import NUM_USERS, make_split


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 263_000_000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    fb = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    nwin = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    method = sys.argv[6] if len(sys.argv) > 6 else "vb"

    t0 = time.perf_counter()
    train, test = make_split(rows)
    print(f"# generated {rows} train rows in {time.perf_counter()-t0:.0f} s",
          flush=True)

    import resource

    from svbfm_tpu.data.meta import DataMetaInfo
    from svbfm_tpu.learners.base import FMConfig
    from svbfm_tpu.learners.mcmc_windowed import (WindowedALSLearner,
                                                  WindowedMCMCLearner)
    from svbfm_tpu.learners.vb_windowed import WindowedVBLearner

    D = train.num_features
    meta = DataMetaInfo.from_field_offsets(D, [0, NUM_USERS])
    cfg = FMConfig(num_attributes=D, num_factor=K, factor_block=fb,
                   min_target=train.min_target, max_target=train.max_target,
                   num_groups=meta.num_attr_groups, seed=7)
    cls = {"vb": WindowedVBLearner, "mcmc": WindowedMCMCLearner,
           "als": WindowedALSLearner}[method]
    t0 = time.perf_counter()
    # the windowed plan build is a ~12-minute host pass at 263M; pickle it
    # so retries and the mcmc/als variants (same plan) skip the build
    import pickle
    plan_cache = f"/tmp/vbwin_plan_{rows}_{nwin}_11.pkl"
    plan = None
    if _os.path.exists(plan_cache):
        with open(plan_cache, "rb") as f:
            plan = pickle.load(f)
        print("# windowed plan loaded from cache", flush=True)
    learner = cls(cfg, train, test, meta, num_windows=nwin,
                  write_files=False, plan=plan)
    if plan is None:
        with open(plan_cache, "wb") as f:
            pickle.dump(learner.plan, f, protocol=4)
    print(f"# windowed plan ready in {time.perf_counter()-t0:.0f} s "
          f"({learner.num_windows} windows x {learner.wlen} rows, "
          f"F={learner.F})", flush=True)
    t0 = time.perf_counter()
    state = learner.init_state()
    jax_block = __import__("jax").block_until_ready
    jax_block(state.e)
    print(f"# init in {time.perf_counter()-t0:.0f} s", flush=True)

    t0 = time.perf_counter()
    state, hist = learner.run(state, num_iter=iters, verbose=True)
    wall = time.perf_counter() - t0
    steady = (hist[-1]["time_learn"] if len(hist) > 1
              else wall / max(iters, 1))
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    from svbfm_tpu.utils.profiling import device_memory_stats
    dm = device_memory_stats() or {}
    hbm = dm.get("peak_bytes_in_use", 0) / 2**30
    print(f"# windowed {method} {rows} rows K={K} fb={fb} "
          f"windows={learner.num_windows}: "
          f"{steady:.1f} s/iter steady ({wall:.0f} s total incl. compile), "
          f"rmse {hist[0]['rmse']:.4f} -> {hist[-1]['rmse']:.4f}, "
          f"host RSS {rss:.1f} GiB, device peak {hbm:.1f} GiB", flush=True)


if __name__ == "__main__":
    main()
