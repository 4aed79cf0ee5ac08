#!/usr/bin/env python
"""Convert whitespace/char-separated triple-format files to libFM format.

Functional equivalent of the reference's ``scripts/triple_format_to_libfm.pl``
(:29-117): each input line ``v0 v1 ... target ...`` becomes
``<target> <id0>:1 <id1>:1 ...`` where ids are assigned first-come within a
shared dictionary keyed by (field position, raw value).  Field positions
(after removing the target and deleted columns) double as group ids written
to the optional ``--outmeta`` file, one line per assigned id.

Example:
  python scripts/triples_to_libfm.py --in train.txt,test.txt --header 0 \
      --target_column 2 --delete_column 3,4 --offset 0 --outmeta groups
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="file_in", required=True,
                    help="comma/semicolon separated input files")
    ap.add_argument("--header", type=int, default=0)
    ap.add_argument("--target_column", type=int, required=True)
    ap.add_argument("--delete_column", default="")
    ap.add_argument("--offset", type=int, default=0,
                    help="first id (libsvm wants 1; libfm handles 0)")
    ap.add_argument("--separator", default=" ")
    ap.add_argument("--outmeta", default=None)
    args = ap.parse_args(argv)

    files = [f for f in args.file_in.replace(";", ",").split(",") if f]
    delete = {int(c) for c in args.delete_column.replace(";", ",").split(",")
              if c != ""}

    ids: dict[tuple[int, str], int] = {}
    id_cntr = args.offset
    out_groups = open(args.outmeta, "w") if args.outmeta else None

    for fname in files:
        fout_name = fname + ".libfm"
        print(f"transforming file {fname} to {fout_name}...")
        with open(fname) as fin, open(fout_name, "w") as fout:
            if args.header:
                next(fin, None)
            for lineno, line in enumerate(fin):
                line = line.rstrip("\n\r")
                if line == "":
                    continue
                data = line.split(args.separator)
                if len(data) <= args.target_column:
                    raise SystemExit(
                        f"not enough values in line {lineno}, expected at "
                        f"least {args.target_column} values\nfound {line}")
                out = [data[args.target_column]]
                group = 0
                for i, v in enumerate(data):
                    if i == args.target_column or i in delete:
                        continue
                    key = (group, v)
                    if key not in ids:
                        ids[key] = id_cntr
                        id_cntr += 1
                        if out_groups is not None:
                            out_groups.write(f"{group}\n")
                    out.append(f"{ids[key]}:1")
                    group += 1
                fout.write(" ".join(out) + "\n")
    if out_groups is not None:
        out_groups.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
