"""Round-2 TPU validation battery (run when the chip is reachable).

Checks, in order:
1. Blocked-vs-sequential BS parity ON TPU — the blocked relation sweep adds
   a lax.scan nested inside the fused iteration scan, a shape CLAUDE.md
   flags as a known miscompile risk on this stack; CPU tests cannot catch
   it, so the trajectories must be compared on the real compiler path.
   (The factor-sequential BS/MCMC f_step scan has the same nesting and has
   been TPU-validated since round 1; this pins the NEW scan.)
2. Small blocked-BS timing (mcmc + als) at the bench shape, then optionally
   the full 1M benchmark via scripts/bench_bs.py.

Usage: python scripts/tpu_checks_r2.py [rows=200000]
"""

import os as _os
import sys as _sys

# the image ships no site-packages .pth for the repo: running
# "python scripts/x.py" puts scripts/ (not the repo root) on
# sys.path, so bootstrap the package path explicitly
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys
import time

import numpy as np


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    import dataclasses

    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_bs import make_bs_problem

    from svbfm_tpu.data.dataset import SparseDataset
    from svbfm_tpu.data.libfm_text import COOData
    from svbfm_tpu.data.meta import DataMetaInfo
    from svbfm_tpu.data.relation import build_joined_meta
    from svbfm_tpu.learners.base import FMConfig
    from svbfm_tpu.learners.mcmc_bs import MCMCBSLearner

    main_c, rel_u, rel_i, users, items, y = make_bs_problem(rows, 4, 4)
    meta = build_joined_meta(DataMetaInfo(0), [rel_u, rel_i])
    D = meta.num_attributes
    cfg = FMConfig(num_attributes=D, num_factor=8,
                   min_target=float(y.min()), max_target=float(y.max()),
                   num_groups=meta.num_attr_groups, seed=7,
                   regw=0.05, regv=0.05)
    te_n = min(rows // 10, 100_000)
    te = COOData(row=np.zeros(0, np.int32), col=np.zeros(0, np.int32),
                 val=np.zeros(0, np.float32), target=y[:te_n],
                 num_rows=te_n, num_features=0)
    tr_ds = SparseDataset.from_coo(main_c, D)
    te_ds = SparseDataset.from_coo(te, D)

    def run(c, label, iters=8):
        l = MCMCBSLearner(c, tr_ds, te_ds, [rel_u, rel_i], [users, items],
                          [users[:te_n], items[:te_n]], meta, 0,
                          write_files=False)
        print(f"# {label}: factor_block={l.cfg.factor_block}", flush=True)
        t0 = time.perf_counter()
        _, h = l.run(num_iter=iters, verbose=False)
        wall = time.perf_counter() - t0
        traj = [round(r["rmse"], 4) for r in h]
        print(f"# {label}: {wall/iters:.2f} s/iter (incl. compile) "
              f"rmse {traj}", flush=True)
        return traj

    blk = run(cfg, "blocked")
    seq = run(dataclasses.replace(cfg, factor_block=1), "sequential")
    d = abs(blk[-1] - seq[-1])
    print(f"# final-rmse delta blocked vs sequential: {d:.4f}")
    assert d < 0.05, (
        "TPU blocked-BS trajectory diverges from sequential — suspect the "
        "nested-scan miscompile; force factor_block=1 for BS on this stack")
    assert blk[-1] < blk[0], "blocked BS RMSE did not decrease on TPU"
    print("# TPU blocked-BS parity: OK")


if __name__ == "__main__":
    main()
