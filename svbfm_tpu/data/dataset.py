"""Device-resident sparse data layouts for TPU factorization machines.

Two layouts, both static-shaped (XLA requirement):

1. **Row layout** — ``ids[N, P] int32`` / ``vals[N, P] f32`` padded to the max
   row nnz ``P`` (pad id 0 with value 0; every kernel multiplies by the value,
   so zero-padding is inert).  Used for forward scoring, SGD, and the per-row
   e/q/t cache recomputations.  This is the TPU-native replacement for the
   reference's in-memory CSR (``src/util/fmatrix.h:235-254``).

2. **SweepPlan (column layout)** — the replacement for the reference's CSC
   transpose + serial per-column Gauss-Seidel sweeps
   (``fm_learn_vb.h:383-501``, ``fm_learn_mcmc.h:411-623``).  Columns are
   partitioned into *conflict-free bins*: no two columns in a bin co-occur in
   any row, so all columns of a bin can be updated simultaneously with
   *exactly* the sequential semantics (their residual updates touch disjoint
   rows).  For one-hot field data (all the paper's benchmarks) the bins are
   the fields and the sweep order matches the reference's ascending-id order.
   Per-bin arrays are sorted by column id so per-column sufficient statistics
   are sorted-segment reductions; residual updates are unique-index scatters
   (i.e. permutations), which XLA lowers efficiently on TPU.

Both layouts shard over the ``data`` axis of a mesh: rows (and therefore bin
entries) are partitioned by shard; per-column statistics become local
segment-sums followed by ``psum`` over the data axis.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from svbfm_tpu.data.libfm_text import COOData


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class SparseDataset:
    """Padded row-layout dataset (host-side numpy; moved to device lazily)."""

    ids: np.ndarray  # int32 [N, P]
    vals: np.ndarray  # float32 [N, P]
    target: np.ndarray  # float32 [N]
    num_rows: int  # true number of rows (<= ids.shape[0] after padding)
    num_features: int
    min_target: float
    max_target: float
    row_nnz: np.ndarray  # int32 [N]

    @property
    def max_row_nnz(self) -> int:
        return int(self.ids.shape[1])

    @staticmethod
    def from_coo(coo: COOData, num_features: Optional[int] = None, pad_rows_to: int = 1) -> "SparseDataset":
        D = coo.num_features if num_features is None else num_features
        N = coo.num_rows
        nnz_per_row = coo.row_nnz()
        P = max(int(nnz_per_row.max()) if N else 1, 1)
        N_pad = _ceil_to(max(N, 1), pad_rows_to)
        ids = np.zeros((N_pad, P), dtype=np.int32)
        vals = np.zeros((N_pad, P), dtype=np.float32)
        # stable sort by row keeps within-row (file) order, matching the
        # reference's per-row entry order
        order = np.argsort(coo.row, kind="stable")
        r, c, v = coo.row[order], coo.col[order], coo.val[order]
        # position within row
        ptr = np.zeros(N + 1, dtype=np.int64)
        np.cumsum(nnz_per_row, out=ptr[1:])
        pos = np.arange(r.shape[0], dtype=np.int64) - ptr[r]
        ids[r, pos] = c
        vals[r, pos] = v
        target = np.zeros(N_pad, dtype=np.float32)
        target[:N] = coo.target
        row_nnz = np.zeros(N_pad, dtype=np.int32)
        row_nnz[:N] = nnz_per_row
        if N:
            tmin = float(coo.target.min())
            tmax = float(coo.target.max())
        else:
            tmin, tmax = 0.0, 0.0
        return SparseDataset(
            ids=ids, vals=vals, target=target, num_rows=N, num_features=D,
            min_target=tmin, max_target=tmax, row_nnz=row_nnz,
        )

    def to_coo(self) -> COOData:
        rows, cols, vals = [], [], []
        for n in range(self.num_rows):
            k = int(self.row_nnz[n])
            rows.append(np.full(k, n, dtype=np.int32))
            cols.append(self.ids[n, :k])
            vals.append(self.vals[n, :k])
        return COOData(
            row=np.concatenate(rows) if rows else np.zeros(0, np.int32),
            col=np.concatenate(cols) if cols else np.zeros(0, np.int32),
            val=np.concatenate(vals) if vals else np.zeros(0, np.float32),
            target=self.target[: self.num_rows].copy(),
            num_rows=self.num_rows,
            num_features=self.num_features,
        )

    def col_count(self) -> np.ndarray:
        """Occurrences of each column in the data (OVBFM col_count,
        reference ``fm_learn_vb_online.h:704-726``)."""
        mask = np.arange(self.ids.shape[1])[None, :] < self.row_nnz[:, None]
        return np.bincount(self.ids[mask].ravel(), minlength=self.num_features).astype(np.int32)

    def padded_to(self, n_shards: int) -> "SparseDataset":
        """Pad row count to a multiple of n_shards (for data-axis sharding)."""
        N_pad = _ceil_to(max(self.num_rows, 1), n_shards)
        if N_pad == self.ids.shape[0]:
            return self
        def pad(a, n):
            out = np.zeros((n,) + a.shape[1:], dtype=a.dtype)
            out[: a.shape[0]] = a
            return out
        return SparseDataset(
            ids=pad(self.ids, N_pad)[:N_pad], vals=pad(self.vals, N_pad)[:N_pad],
            target=pad(self.target, N_pad)[:N_pad], num_rows=self.num_rows,
            num_features=self.num_features, min_target=self.min_target,
            max_target=self.max_target, row_nnz=pad(self.row_nnz, N_pad)[:N_pad],
        )


def assign_bins_greedy(coo: COOData, num_features: int) -> np.ndarray:
    """Conflict-free column coloring, processed in ascending column id.

    Two columns conflict iff they co-occur in some row.  Greedy smallest-
    available-color in ascending id order: for one-hot field data this
    recovers the fields exactly, and the (bin, ascending-id) sweep order then
    coincides with the reference's sequential 0..D-1 order restricted to
    conflict-free groups — giving *exact* Gauss-Seidel equivalence.
    """
    D = num_features
    color = np.full(D, -1, dtype=np.int32)
    # rows sorted by row id; iterate row-wise entry lists
    order = np.argsort(coo.row, kind="stable")
    r, c = coo.row[order], coo.col[order]
    nnz_per_row = np.bincount(coo.row, minlength=coo.num_rows)
    ptr = np.zeros(coo.num_rows + 1, dtype=np.int64)
    np.cumsum(nnz_per_row, out=ptr[1:])
    # column -> list of rows is implicit; we color by scanning columns in
    # ascending order and checking colors already used in each row touching
    # the column.  Build col->entries index:
    corder = np.argsort(c, kind="stable")
    cc, cr = c[corder], r[corder]
    cptr = np.zeros(D + 1, dtype=np.int64)
    np.cumsum(np.bincount(cc, minlength=D), out=cptr[1:])
    # per-row set of used colors, maintained as bitmask per row (small #colors)
    row_used = np.zeros(coo.num_rows, dtype=np.int64)
    for col in range(D):
        lo, hi = cptr[col], cptr[col + 1]
        if lo == hi:
            color[col] = 0  # unobserved column: any bin (it has no entries)
            continue
        used = np.int64(0)
        for k in range(lo, hi):
            used |= row_used[cr[k]]
        b = 0
        while used & (np.int64(1) << b):
            b += 1
            if b >= 63:
                raise ValueError("greedy coloring needs >63 bins; use jacobi bins")
        color[col] = b
        bit = np.int64(1) << b
        for k in range(lo, hi):
            row_used[cr[k]] |= bit
    return color


def assign_bins_jacobi(num_features: int) -> np.ndarray:
    """All columns in one bin (parallel Jacobi sweep; approximate)."""
    return np.zeros(num_features, dtype=np.int32)


def detect_field_bins(coo: COOData, num_features: int) -> Optional[np.ndarray]:
    """Fast path: if every row's k-th smallest column falls in the same
    contiguous id range across rows (classic one-hot field layout), the
    ranges are conflict-free bins.  Returns None when the structure doesn't
    hold; callers then fall back to greedy coloring."""
    if coo.nnz == 0:
        return None
    nnz_per_row = np.bincount(coo.row, minlength=coo.num_rows)
    k = nnz_per_row.max()
    if k == 0 or (nnz_per_row != k).any():
        return None
    order = np.lexsort((coo.col, coo.row))
    cols = coo.col[order].reshape(coo.num_rows, k)
    # field p covers [max of field p-1 + 1 ... ]; check ranges are disjoint
    lo = cols.min(axis=0)
    hi = cols.max(axis=0)
    if not ((hi[:-1] < lo[1:]).all()):
        return None
    color = np.zeros(num_features, dtype=np.int32)
    bounds = np.concatenate([lo[1:], [num_features]])
    start = 0
    for p in range(k):
        color[start : bounds[p]] = p
        start = bounds[p]
    return color


@dataclass
class SweepPlan:
    """Binned, column-sorted entry arrays for vectorized coordinate sweeps.

    All arrays are stacked over bins (axis 0) and padded so a single
    ``lax.scan`` over bins compiles once:

      rows      int32 [S, B, M]  row index of each entry (pad: N -> drop)
      x         f32   [S, B, M]  value of each entry (pad: 0)
      seg       int32 [S, B, M]  per-entry index into the bin's column slots
                                 (pad: C, an extra dropped segment)
      cols      int32 [B, C]     column ids per slot (pad: D -> dropped)
      col_group int32 [B, C]     group id per slot (pad: 0)
      col_valid bool  [B, C]
      sx2       f32   [B, C]     global sum of x^2 per column (static)
      cnt       f32   [B, C]     global entry count per column (in this data)
      col_count f32   [B, C]     full-data occurrence count per column

    S = number of data shards.  Per-column statistics are segment-sums over
    the shard-local entries followed by a psum over the data axis.
    """

    rows: np.ndarray
    x: np.ndarray
    seg: np.ndarray
    cols: np.ndarray
    col_group: np.ndarray
    col_valid: np.ndarray
    sx2: np.ndarray
    cnt: np.ndarray
    col_count: np.ndarray
    num_bins: int
    num_features: int
    rows_per_shard: int
    unobserved: np.ndarray  # bool [D] columns with no entries in the data
    color: np.ndarray  # int32 [D] bin of each column
    conflict_free: bool = True  # False for jacobi bins (rows repeat in a bin)

    @property
    def num_shards(self) -> int:
        return int(self.rows.shape[0])

    @staticmethod
    def build(
        coo: COOData,
        num_features: int,
        meta_groups: Optional[np.ndarray] = None,
        bins: str = "auto",
        n_shards: int = 1,
        col_count: Optional[np.ndarray] = None,
    ) -> "SweepPlan":
        D = num_features
        conflict_free = True
        if bins == "auto":
            color = detect_field_bins(coo, D)
            if color is None:
                # greedy is O(nnz * row_nnz); cap to keep preprocessing sane
                if coo.nnz <= 20_000_000:
                    color = assign_bins_greedy(coo, D)
                else:
                    color = assign_bins_jacobi(D)
                    conflict_free = False
        elif bins == "greedy":
            color = assign_bins_greedy(coo, D)
        elif bins == "jacobi":
            color = assign_bins_jacobi(D)
            conflict_free = False
        elif bins == "fields":
            color = detect_field_bins(coo, D)
            if color is None:
                raise ValueError("data has no one-hot field structure")
        else:
            raise ValueError(f"unknown bins mode {bins!r}")

        num_bins = int(color.max()) + 1 if D else 1
        groups = meta_groups if meta_groups is not None else np.zeros(D, np.int32)

        N_pad = _ceil_to(max(coo.num_rows, 1), n_shards)
        rows_per_shard = N_pad // n_shards
        shard_of = coo.row // rows_per_shard
        local_row = coo.row % rows_per_shard

        observed = np.zeros(D, dtype=bool)
        observed[coo.col] = True

        if col_count is None:
            col_count_full = np.bincount(coo.col, minlength=D).astype(np.float32)
        else:
            col_count_full = col_count.astype(np.float32)

        # --- column slots per bin (global, shard-independent) ---
        # ascending column id within each bin == reference sweep order
        bin_cols: list[np.ndarray] = []
        for b in range(num_bins):
            cols_b = np.where((color == b) & observed)[0].astype(np.int32)
            bin_cols.append(cols_b)
        C = max((len(cb) for cb in bin_cols), default=1)
        C = max(C, 1)
        cols_arr = np.full((num_bins, C), D, dtype=np.int32)
        col_group_arr = np.zeros((num_bins, C), dtype=np.int32)
        col_valid_arr = np.zeros((num_bins, C), dtype=bool)
        col_count_arr = np.zeros((num_bins, C), dtype=np.float32)
        slot_of_col = np.zeros(D + 1, dtype=np.int64)
        for b, cb in enumerate(bin_cols):
            cols_arr[b, : len(cb)] = cb
            col_group_arr[b, : len(cb)] = groups[cb]
            col_valid_arr[b, : len(cb)] = True
            col_count_arr[b, : len(cb)] = col_count_full[cb]
            slot_of_col[cb] = np.arange(len(cb))

        # --- entries per (shard, bin), sorted by column id ---
        entry_bin = color[coo.col]
        M = 0
        per = {}
        for s in range(n_shards):
            for b in range(num_bins):
                sel = np.where((shard_of == s) & (entry_bin == b))[0]
                # sort by column id (stable keeps row-file order per column,
                # matching the transpose iteration order of the reference)
                sel = sel[np.argsort(coo.col[sel], kind="stable")]
                per[(s, b)] = sel
                M = max(M, len(sel))
        M = max(M, 1)

        # pad rows with a unique out-of-range ramp: scatters drop them
        # (mode='drop') while keeping the unique_indices promise honest
        rows_arr = np.broadcast_to(
            rows_per_shard + np.arange(M, dtype=np.int32), (n_shards, num_bins, M)
        ).copy()
        x_arr = np.zeros((n_shards, num_bins, M), dtype=np.float32)
        seg_arr = np.full((n_shards, num_bins, M), C, dtype=np.int32)
        sx2_arr = np.zeros((num_bins, C), dtype=np.float32)
        cnt_arr = np.zeros((num_bins, C), dtype=np.float32)
        for (s, b), sel in per.items():
            k = len(sel)
            rows_arr[s, b, :k] = local_row[sel]
            x_arr[s, b, :k] = coo.val[sel]
            seg_arr[s, b, :k] = slot_of_col[coo.col[sel]]
            if k:
                np.add.at(sx2_arr[b], seg_arr[s, b, :k], coo.val[sel].astype(np.float64) ** 2)
                np.add.at(cnt_arr[b], seg_arr[s, b, :k], 1.0)

        return SweepPlan(
            rows=rows_arr, x=x_arr, seg=seg_arr, cols=cols_arr,
            col_group=col_group_arr, col_valid=col_valid_arr, sx2=sx2_arr,
            cnt=cnt_arr, col_count=col_count_arr, num_bins=num_bins,
            num_features=D, rows_per_shard=rows_per_shard,
            unobserved=~observed, color=color, conflict_free=conflict_free,
        )
