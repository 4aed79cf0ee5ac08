"""Emit the bench_bs.py problem instance in the reference binary's BS format.

Writes, under an output directory:
  main.train / main.test      libFM text, target-only rows (empty main block)
  rel_u.xt / rel_i.xt         binary transposed relation designs (via the
                              reference convert+transpose tools)
  rel_u.train/.test, rel_i..  join files (one relation-row id per line)

and prints the reference command to run.  The reference's MCMC loads
relations transpose-only (libfm.cpp:198-202 passes has_x=false for mcmc) and
joins per RelationJoin::load text mode (relation.h:65-88).

Usage: python scripts/make_bs_ref_data.py <outdir> [rows] [ua] [ia] \
           [convert_bin] [transpose_bin]
"""

import importlib.util
import os
import subprocess
import sys


def _load_bench_bs():
    spec = importlib.util.spec_from_file_location(
        "bench_bs", os.path.join(os.path.dirname(__file__), "bench_bs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def write_relation_text(path, rel):
    """libFM text rows of the relation design (dummy 0 target)."""
    import numpy as np
    first = np.searchsorted(rel.row, np.arange(rel.num_rows + 1))
    with open(path, "w") as f:
        for r in range(rel.num_rows):
            ent = " ".join(f"{rel.col[j]}:{rel.val[j]:g}"
                           for j in range(first[r], first[r + 1]))
            f.write(f"0 {ent}\n")


def main():
    args = [a for a in sys.argv[1:] if a != "--holdout"]
    # --holdout: emit a real 90/10 split (test rows held OUT of train) for
    # convergence-parity runs; the default keeps the bench_bs semantics
    # (test = first 10% of train) so perf numbers stay comparable across
    # rounds.
    holdout = "--holdout" in sys.argv[1:]
    out = args[0]
    rows = int(args[1]) if len(args) > 1 else 1_000_000
    ua = int(args[2]) if len(args) > 2 else 20
    ia = int(args[3]) if len(args) > 3 else 20
    convert = args[4] if len(args) > 4 else "/tmp/refbuild/convert"
    transpose = args[5] if len(args) > 5 else "/tmp/refbuild/transpose"
    os.makedirs(out, exist_ok=True)

    bench_bs = _load_bench_bs()
    main_coo, rel_u, rel_i, users, items, y = bench_bs.make_bs_problem(
        rows, ua, ia)
    te_n = min(rows // 10, 1_000_000)
    tr_lo = te_n if holdout else 0

    with open(os.path.join(out, "main.train"), "w") as f:
        f.write("".join(f"{t:g}\n" for t in y[tr_lo:]))
    with open(os.path.join(out, "main.test"), "w") as f:
        f.write("".join(f"{t:g}\n" for t in y[:te_n]))

    for name, rel, join in (("rel_u", rel_u, users), ("rel_i", rel_i, items)):
        pfx = os.path.join(out, name)
        write_relation_text(pfx + ".libfm", rel)
        subprocess.run([convert, "-ifile", pfx + ".libfm",
                        "-ofilex", pfx + ".x", "-ofiley", pfx + ".y"],
                       check=True)
        subprocess.run([transpose, "-ifile", pfx + ".x",
                        "-ofile", pfx + ".xt"], check=True)
        with open(pfx + ".train", "w") as f:
            f.write("".join(f"{int(j)}\n" for j in join[tr_lo:]))
        with open(pfx + ".test", "w") as f:
            f.write("".join(f"{int(j)}\n" for j in join[:te_n]))

    print("reference command:")
    print(f"  cd {out} && /tmp/refbuild/libFM -task r -train main.train "
          f"-test main.test -dim '1,1,20' -method mcmc -iter 8 "
          f"-relation rel_u,rel_i")


if __name__ == "__main__":
    main()
