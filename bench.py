"""Headline benchmark: batch VBFM training throughput on ML-1M-scale data.

Runs the flagship learner (batch variational Bayes FM, dim 1,1,20 — the
configuration of the reference paper's headline plots, `results/1M_20.png`)
on MovieLens-1M-shaped synthetic data (6040 users x 3952 items, 1M train
rows) and reports training throughput in examples/s, where one "example" is
one training row processed by one full VB sweep (all per-iteration test
metrics are computed on-device inside the same fused program).

``vs_baseline`` compares against the reference C++ implementation
(libFM-VBFM, `src/libfm/src/fm_learn_vb.h`) compiled -O3 and measured on
THIS machine's host CPU with the same data: REF_SECONDS_PER_ITER below.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np

# Reference libFM `-method vb -dim 1,1,20` per-iteration wall time on this
# machine (g++ -O3 build of /root/reference/src, 1M-row synthetic ML-1M data,
# measured over 9 iteration intervals of a 10-iteration run: 25 s / 9;
# includes its per-iteration test-set evaluation, as does ours).
REF_SECONDS_PER_ITER = 2.78

NUM_USERS, NUM_ITEMS = 6040, 3952
NUM_TRAIN = 1_000_000
K = 20
WARM_ITERS = 10
TIMED_ITERS = 20


def main() -> None:
    import jax

    from svbfm_tpu.data.dataset import SparseDataset
    from svbfm_tpu.data.meta import DataMetaInfo
    from svbfm_tpu.data.synth import make_movielens_like, train_test_split
    from svbfm_tpu.learners.base import FMConfig
    from svbfm_tpu.learners.vb import VBLearner

    coo = make_movielens_like(num_users=NUM_USERS, num_items=NUM_ITEMS,
                              num_ratings=NUM_TRAIN + NUM_TRAIN // 10,
                              rank=8, noise=0.6, seed=42)
    tr, te = train_test_split(coo, 1.0 / 11.0, seed=43)
    D = coo.num_features
    meta = DataMetaInfo.from_field_offsets(D, [0, NUM_USERS])
    cfg = FMConfig(num_attributes=D, num_factor=K,
                   min_target=float(tr.target.min()),
                   max_target=float(tr.target.max()),
                   num_groups=meta.num_attr_groups, seed=7)
    learner = VBLearner(cfg, SparseDataset.from_coo(tr, D),
                        SparseDataset.from_coo(te, D), meta, write_files=False)
    state = learner.init_state()

    # warmup: compiles the fused multi-iteration program.  Force a real
    # value fetch afterwards: on a remotely-attached chip, deferred device
    # work can drain AFTER run() returns and would be absorbed into the
    # first timed iteration (see PARITY_RUNS.md round-3 measurement notes)
    state, _ = learner.run(state, num_iter=WARM_ITERS, verbose=False,
                           chunk=WARM_ITERS)
    np.asarray(state.mu_0)

    t0 = time.perf_counter()
    state, history = learner.run(state, num_iter=TIMED_ITERS, verbose=False,
                                 chunk=WARM_ITERS)  # 2 fused calls of 10
    np.asarray(state.mu_0)
    wall = time.perf_counter() - t0
    sec_per_iter = wall / TIMED_ITERS

    examples_per_s = tr.num_rows / sec_per_iter
    ref_examples_per_s = tr.num_rows / REF_SECONDS_PER_ITER

    print(json.dumps({
        "metric": "vbfm_ml1m_k20_train_throughput",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / ref_examples_per_s, 3),
        "sec_per_iter": round(sec_per_iter, 4),
        "test_rmse_final": round(history[-1]["rmse"], 5),
        "free_energy_final": round(history[-1]["free_energy"], 1),
        "device": jax.devices()[0].platform,
    }))


def _wait_for_device(attempts: int = 25, probe_timeout: int = 150,
                     sleep_s: int = 45) -> bool:
    """The tunneled TPU backend HANGS (not raises) while the worker is
    wedged (e.g. right after a crashed attempt).  Probe it in a subprocess
    with a hard timeout and retry with backoff so a transient wedge at
    bench time doesn't hang the whole benchmark run forever."""
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "print(float(jnp.ones((8, 128)).sum()))")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=probe_timeout,
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.DEVNULL)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"# device probe {i + 1}/{attempts} failed; retrying",
              flush=True)
        time.sleep(sleep_s)
    return False


if __name__ == "__main__":
    if not _wait_for_device():
        print(json.dumps({
            "metric": "vbfm_ml1m_k20_train_throughput", "value": 0,
            "unit": "examples/s", "vs_baseline": 0,
            "error": "device unavailable (tunnel wedged; probe timed out)",
        }))
        raise SystemExit(1)
    main()
