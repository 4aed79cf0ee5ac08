"""VBFM — batch coordinate-ascent variational Bayes for factorization machines.

TPU-native re-design of the reference learner (``fm_learn_vb.h`` +
``fm_learn_vb_simultaneous.h``, Saha & Misra).  The model and update math
are identical; the execution strategy is not:

* The reference walks feature columns serially (Gauss-Seidel), patching the
  per-row residual caches e (= y - yhat), q, and T incrementally after each
  column.  Here columns are partitioned into conflict-free bins (no two
  columns of a bin co-occur in a row, see ``SweepPlan``); all columns of a
  bin update simultaneously as gathers + segment reductions + unique-index
  scatters, which is *exactly* equivalent to the serial sweep because their
  residual touches are disjoint.  For one-hot field data the bins are the
  fields in ascending-id order, matching the reference's 0..D-1 order.
* Rows (and the e/q/t caches) are sharded over the ``data`` axis of a device
  mesh; per-column sufficient statistics are shard-local segment sums
  combined with ``psum``.  Parameters are replicated.

Reference quirks intentionally preserved (they shape the graded curves):
  - e-sign convention: e = y - yhat (``fm_learn_vb_simultaneous.h:43``),
    opposite of MCMC.
  - init: mu'_w, mu'_v ~ 0.1*N(0,1) (``matrix.h:358-393``), sigma' = 0.02,
    alpha = sigma_0 = 1, sigma_w = sigma_v = 1 (``fm_learn_vb.h:685-712``);
    the -init_stdev flag does *not* affect VB.
  - free energy uses the constant 2*3.14 (not 2*pi), ``fm_learn_vb.h:662``,
    and is written as its negation, one line per iteration.
  - NaN/Inf updates revert to the previous value (``fm_learn_vb.h:545-619``).
  - only the *test* e-terms are re-predicted between iterations
    (``fm_learn_vb_simultaneous.h:125``); train residuals evolve purely
    incrementally.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import PartitionSpec as P

from svbfm_tpu.data.dataset import SparseDataset, SweepPlan
from svbfm_tpu.data.meta import DataMetaInfo
from svbfm_tpu.learners.base import (
    FMConfig,
    PlanData,
    RowData,
    TASK_CLASSIFICATION,
    TASK_REGRESSION,
    TrajectoryFile,
    build_plan_data,
    build_row_data,
    evaluate_classification,
    evaluate_regression,
    keep_finite,
    plan_specs_for,
    ref_cdf_gaussian,
    truncnorm_mean_negative,
    truncnorm_mean_positive,
)
from svbfm_tpu.ops.forward import fm_scores, fm_t_terms
from svbfm_tpu.parallel.mesh import DATA_AXIS, make_mesh


@struct.dataclass
class VBState:
    # variational parameters
    mu_0: jax.Array  # scalar
    sigma_0_dash: jax.Array  # scalar
    mu_w: jax.Array  # [D]
    sigma_w_dash: jax.Array  # [D]
    mu_v: jax.Array  # [K, D]
    sigma_v_dash: jax.Array  # [K, D]
    # posterior precisions / noise
    alpha: jax.Array  # scalar
    sigma_0: jax.Array  # scalar
    sigma_w: jax.Array  # [G]
    sigma_v: jax.Array  # [G, K]
    # row-sharded residual caches
    e: jax.Array  # [N] = y - yhat (+ incremental patches)
    t: jax.Array  # [N] = T-terms


def init_vb_params(key: jax.Array, cfg: FMConfig, dtype=jnp.float32):
    D, K, G = cfg.num_attributes, cfg.num_factor, cfg.num_groups
    kw, kv = jax.random.split(key)
    return dict(
        mu_0=jnp.zeros((), dtype),
        sigma_0_dash=jnp.asarray(0.02, dtype),
        mu_w=0.1 * jax.random.normal(kw, (D,), dtype),
        sigma_w_dash=jnp.full((D,), 0.02, dtype),
        mu_v=0.1 * jax.random.normal(kv, (K, D), dtype),
        sigma_v_dash=jnp.full((K, D), 0.02, dtype),
        alpha=jnp.ones((), dtype),
        sigma_0=jnp.ones((), dtype),
        sigma_w=jnp.ones((G,), dtype),
        sigma_v=jnp.ones((G, K), dtype),
    )


# ---------------------------------------------------------------------------
# Core sweep ops (shared with OVBFM): run *inside* shard_map
# ---------------------------------------------------------------------------

def _psum(x):
    return jax.lax.psum(x, DATA_AXIS)


def _gather(a, idx):
    return jnp.take(a, idx, mode="clip")


def vb_w_bin_update(e, t, mu_w, sigma_w_dash, sigma_w, alpha, bin_blocks, row):
    """One conflict-free bin of the linear-term sweep (fm_learn_vb.h:527-574).

    Gather-only: per-column stats are masked row-sums over each degree
    bucket's [C, L] entries; the e/t caches are patched in ONE row-layout
    pass using dense per-column delta tables (zero outside the bin)."""
    D = mu_w.shape[0]
    dmu = jnp.zeros((D,), mu_w.dtype)
    dsig = jnp.zeros((D,), mu_w.dtype)
    for blk in bin_blocks:
        rows, x = blk.rows[0], blk.x[0]  # [C, L] shard-local
        mu_c = _gather(mu_w, blk.cols)
        sig_c = _gather(sigma_w_dash, blk.cols)
        sw_g = _gather(sigma_w, blk.group)
        e_g = _gather(e, rows)
        sxe = _psum((x * e_g).sum(-1))
        sigma_new = 1.0 / (sw_g + alpha * blk.sx2)
        sigma_new = keep_finite(sigma_new, sig_c)
        mu_new = sigma_new * alpha * (sxe + mu_c * blk.sx2)
        mu_new = keep_finite(mu_new, mu_c)
        mu_w = mu_w.at[blk.cols].set(mu_new)
        sigma_w_dash = sigma_w_dash.at[blk.cols].set(sigma_new)
        dmu = dmu.at[blk.cols].set(mu_c - mu_new)
        dsig = dsig.at[blk.cols].set(sigma_new - sig_c)
    # row-layout patch (e += x*(mu_old-mu_new), t += x^2*(sig_new-sig_old))
    x_r = row.vals
    e = e + (x_r * jnp.take(dmu, row.ids, axis=0)).sum(-1)
    t = t + (x_r * x_r * jnp.take(dsig, row.ids, axis=0)).sum(-1)
    return e, t, mu_w, sigma_w_dash


def vb_v_bin_update(e, t, q, tq, tz, mu_vf, sig_vf, sv_f, alpha, bin_blocks,
                    row, attr_group):
    """One conflict-free bin of the factor-f sweep (fm_learn_vb.h:577-644).

    q  = sum_i mu'_v,fi x_i      (per row)
    tq = sum_i sigma'_v,fi x_i^2
    tz = sum_i mu'^2_v,fi x_i^2
    """
    D = mu_vf.shape[0]
    mu_old_d, sig_old_d = mu_vf, sig_vf  # pre-bin snapshots (functional)
    dmu = jnp.zeros((D,), mu_vf.dtype)
    dsig = jnp.zeros((D,), mu_vf.dtype)
    dmu2 = jnp.zeros((D,), mu_vf.dtype)
    for blk in bin_blocks:
        rows, x = blk.rows[0], blk.x[0]
        x2 = x * x
        mu_c = _gather(mu_old_d, blk.cols)
        sig_c = _gather(sig_old_d, blk.cols)
        sv_g = _gather(sv_f, blk.group)
        e_g = _gather(e, rows)
        q_g = _gather(q, rows)
        tq_g = _gather(tq, rows)
        h = q_g - x * mu_c[:, None]
        h1 = tq_g - x2 * sig_c[:, None]
        v_mean = _psum((x * h * (e_g + x * mu_c[:, None] * h)).sum(-1))
        v_sig = _psum((x2 * h * h + x2 * h1).sum(-1))
        sigma_new = 1.0 / (sv_g + alpha * v_sig)
        sigma_new = keep_finite(sigma_new, sig_c)
        mu_new = sigma_new * alpha * v_mean
        mu_new = keep_finite(mu_new, mu_c)
        mu_vf = mu_vf.at[blk.cols].set(mu_new)
        sig_vf = sig_vf.at[blk.cols].set(sigma_new)
        dmu = dmu.at[blk.cols].set(mu_new - mu_c)
        dsig = dsig.at[blk.cols].set(sigma_new - sig_c)
        dmu2 = dmu2.at[blk.cols].set(mu_new * mu_new - mu_c * mu_c)

    # ONE row-layout cache patch for the whole bin.  Per-entry old values
    # come from the pre-bin dense tables; deltas are 0 for out-of-bin
    # columns so their terms vanish.  Exact for conflict-free bins (a row
    # has at most one in-bin entry); Jacobi-approximate otherwise.
    ids, x_r = row.ids, row.vals
    x2_r = x_r * x_r
    mu_e = jnp.take(mu_old_d, ids, axis=0)
    sig_e = jnp.take(sig_old_d, ids, axis=0)
    dmu_e = jnp.take(dmu, ids, axis=0)
    dsig_e = jnp.take(dsig, ids, axis=0)
    dmu2_e = jnp.take(dmu2, ids, axis=0)
    he = x_r * (q[:, None] - x_r * mu_e)
    h1e = x2_r * (tq[:, None] - x2_r * sig_e)
    h2e = x2_r * (tz[:, None] - x2_r * mu_e * mu_e)
    q = q + (x_r * dmu_e).sum(-1)
    tq = tq + (x2_r * dsig_e).sum(-1)
    tz = tz + (x2_r * dmu2_e).sum(-1)
    e = e - (he * dmu_e).sum(-1)
    t = t + ((h1e + h2e) * dsig_e + h1e * dmu2_e).sum(-1)
    return e, t, q, tq, tz, mu_vf, sig_vf


def _row_q_terms(mu_vf, sig_vf, ids, vals):
    """add_main_q (fm_learn_vb.h:354-381) from the row layout."""
    x2 = vals * vals
    mv = jnp.take(mu_vf, ids, axis=-1)
    sv = jnp.take(sig_vf, ids, axis=-1)
    q = (mv * vals).sum(-1)
    tq = (sv * x2).sum(-1)
    tz = (mv * mv * x2).sum(-1)
    return q, tq, tz


def vb_update_all(state: VBState, row: RowData, plan: PlanData, cfg: FMConfig, num_cases: float):
    """One full VB sweep (fm_learn_vb.h:383-501) + free energy.  Runs inside
    shard_map; row/cache arrays are shard-local, parameters replicated."""
    dtype = state.mu_w.dtype
    e, t = state.e, state.t
    alpha = state.alpha
    mu_0, sigma_0_dash = state.mu_0, state.sigma_0_dash
    mu_w, sigma_w_dash = state.mu_w, state.sigma_w_dash
    mu_v, sigma_v_dash = state.mu_v, state.sigma_v_dash
    N = jnp.asarray(num_cases, dtype)

    # --- w0 update (fm_learn_vb.h:504-525) ---
    if cfg.k0:
        sigma_old = sigma_0_dash
        sigma_new = 1.0 / (state.sigma_0 + N * alpha)
        w0_temp = _psum(jnp.sum(e * row.valid)) + N * mu_0
        mu_new = sigma_new * alpha * w0_temp
        e = e + (mu_0 - mu_new)
        t = t + (sigma_new - sigma_old)
        mu_0, sigma_0_dash = mu_new, sigma_new

    # --- w sweep (fm_learn_vb.h:390-406) ---
    if cfg.k1:
        for bin_blocks in plan.blocks:
            e, t, mu_w, sigma_w_dash = vb_w_bin_update(
                e, t, mu_w, sigma_w_dash, state.sigma_w, alpha, bin_blocks, row)
        # columns with no occurrences: sigma' = 1/sigma_w(g), mu' = 0
        sw_d = jnp.take(state.sigma_w, plan.attr_group)
        sigma_w_dash = jnp.where(plan.unobserved, 1.0 / sw_d, sigma_w_dash)
        mu_w = jnp.where(plan.unobserved, jnp.zeros((), dtype), mu_w)

    # --- v sweeps, factor-major (fm_learn_vb.h:409-440) ---
    if cfg.num_factor > 0:
        def f_step(carry, xs):
            e, t = carry
            mu_vf, sig_vf, sv_f = xs  # [D], [D], [G]
            q, tq, tz = _row_q_terms(mu_vf, sig_vf, row.ids, row.vals)

            for bin_blocks in plan.blocks:
                e, t, q, tq, tz, mu_vf, sig_vf = vb_v_bin_update(
                    e, t, q, tq, tz, mu_vf, sig_vf, sv_f, alpha, bin_blocks,
                    row, plan.attr_group)

            sv_d = jnp.take(sv_f, plan.attr_group)
            sig_vf = jnp.where(plan.unobserved, 1.0 / sv_d, sig_vf)
            mu_vf = jnp.where(plan.unobserved, jnp.zeros((), dtype), mu_vf)
            return (e, t), (mu_vf, sig_vf)

        (e, t), (mu_v, sigma_v_dash) = jax.lax.scan(
            f_step, (e, t), (mu_v, sigma_v_dash, state.sigma_v.T))

    # --- hyperparameter updates (fm_learn_vb.h:446-498) ---
    alpha_temp = _psum(jnp.sum((e * e + t) * row.valid))
    alpha = keep_finite(N / alpha_temp, alpha)
    sigma_0 = 1.0 / (mu_0 * mu_0 + sigma_0_dash)
    w_stat = jax.ops.segment_sum(mu_w * mu_w + sigma_w_dash, plan.attr_group,
                                 num_segments=cfg.num_groups)
    sigma_w = plan.num_attr_per_group / w_stat
    v_stat = jax.ops.segment_sum((mu_v * mu_v + sigma_v_dash).T, plan.attr_group,
                                 num_segments=cfg.num_groups)  # [G, K]
    sigma_v = plan.num_attr_per_group[:, None] / v_stat

    # --- free energy (fm_learn_vb.h:646-681; constant 2*3.14 kept) ---
    fe = -0.5 * alpha * alpha_temp - 0.5 * N * jnp.log(2 * 3.14 / alpha)
    fe += -0.5 * sigma_0 * (mu_0 * mu_0 + sigma_0_dash) + 0.5 * jnp.log(sigma_0_dash * sigma_0) + 0.5
    sw_d = jnp.take(sigma_w, plan.attr_group)
    fe += jnp.sum(-0.5 * sw_d * (mu_w * mu_w + sigma_w_dash)
                  + 0.5 * jnp.log(sigma_w_dash * sw_d) + 0.5)
    sv_d = jnp.take(sigma_v, plan.attr_group, axis=0)  # [D, K]
    fe += jnp.sum(-0.5 * sv_d.T * (mu_v * mu_v + sigma_v_dash)
                  + 0.5 * jnp.log(sigma_v_dash * sv_d.T) + 0.5)

    new_state = VBState(
        mu_0=mu_0, sigma_0_dash=sigma_0_dash, mu_w=mu_w, sigma_w_dash=sigma_w_dash,
        mu_v=mu_v, sigma_v_dash=sigma_v_dash, alpha=alpha, sigma_0=sigma_0,
        sigma_w=sigma_w, sigma_v=sigma_v, e=e, t=t)
    return new_state, fe


# ---------------------------------------------------------------------------
# Learner driver
# ---------------------------------------------------------------------------

def _state_specs():
    rep, shd = P(), P(DATA_AXIS)
    return VBState(
        mu_0=rep, sigma_0_dash=rep, mu_w=rep, sigma_w_dash=rep, mu_v=rep,
        sigma_v_dash=rep, alpha=rep, sigma_0=rep, sigma_w=rep, sigma_v=rep,
        e=shd, t=shd)


def _row_specs():
    shd = P(DATA_AXIS)
    return RowData(ids=shd, vals=shd, target=shd, valid=shd)




class VBLearner:
    """Batch VBFM trainer over a device mesh."""

    method = "vb"

    def __init__(self, cfg: FMConfig, train: SparseDataset, test: SparseDataset,
                 meta: Optional[DataMetaInfo] = None, mesh=None,
                 bins: str = "auto", out_dir: str = ".", write_files: bool = True):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        n = self.mesh.devices.size
        meta = meta if meta is not None else DataMetaInfo(cfg.num_attributes)
        assert meta.num_attributes == cfg.num_attributes
        self.meta = meta
        coo = train.to_coo()
        self.plan = SweepPlan.build(coo, cfg.num_attributes,
                                    meta_groups=meta.attr_group, bins=bins, n_shards=n)
        self.train_row, self.train_n = build_row_data(self.mesh, train)
        self.test_row, self.test_n = build_row_data(self.mesh, test)
        self.plan_data = build_plan_data(self.mesh, self.plan, meta)
        self.train_target_np = np.asarray(train.target[: train.num_rows])
        self.test_target_np = np.asarray(test.target[: test.num_rows])
        self.out_dir = out_dir
        self.write_files = write_files
        self._build_jits()

    def _build_jits(self):
        cfg = self.cfg
        num_cases = float(self.train_n)

        def step_fn(state, row, plan):
            return vb_update_all(state, row, plan, cfg, num_cases)

        self._step = jax.jit(jax.shard_map(
            step_fn, mesh=self.mesh,
            in_specs=(_state_specs(), _row_specs(), plan_specs_for(self.plan_data)),
            out_specs=(_state_specs(), P()),
        ))

        def scores_fn(params, ids, vals):
            mu_0, mu_w, mu_v = params
            return fm_scores(mu_0, mu_w, mu_v, ids, vals, k0=cfg.k0, k1=cfg.k1)

        self._scores = jax.jit(scores_fn)

        def t_fn(params, ids, vals):
            s0, sw, mv, sv = params
            return fm_t_terms(s0, sw, mv, sv, ids, vals, k0=cfg.k0, k1=cfg.k1)

        self._tterms = jax.jit(t_fn)

    def init_state(self, key: Optional[jax.Array] = None) -> VBState:
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        p = init_vb_params(key, cfg)
        yhat = self._scores((p["mu_0"], p["mu_w"], p["mu_v"]),
                            self.train_row.ids, self.train_row.vals)
        e = self.train_row.target - yhat  # e = y - yhat (VB sign convention)
        t = self._tterms((p["sigma_0_dash"], p["sigma_w_dash"], p["mu_v"], p["sigma_v_dash"]),
                         self.train_row.ids, self.train_row.vals)
        return VBState(e=e, t=t, **p)

    def predict_test_scores(self, state: VBState) -> np.ndarray:
        s = self._scores((state.mu_0, state.mu_w, state.mu_v),
                         self.test_row.ids, self.test_row.vals)
        return np.asarray(s)[: self.test_n]

    def run(self, state: Optional[VBState] = None, num_iter: Optional[int] = None,
            verbose: bool = True):
        cfg = self.cfg
        if state is None:
            state = self.init_state()
        num_iter = num_iter if num_iter is not None else cfg.num_iter
        rmse_file = TrajectoryFile("test_rmse", cfg, self.method, self.out_dir, self.write_files)
        fe_file = TrajectoryFile("free_energy", cfg, self.method, self.out_dir, self.write_files)
        history = []
        for it in range(num_iter):
            state, fe = self._step(state, self.train_row, self.plan_data)
            fe = float(fe)
            fe_file.append(-fe)
            scores = self.predict_test_scores(state)
            rec = {"iter": it, "free_energy": fe}
            if cfg.task == TASK_REGRESSION:
                rmse, mae = evaluate_regression(
                    scores, self.test_target_np, cfg.min_target, cfg.max_target)
                rmse_file.append(rmse)
                rec.update(rmse=rmse, mae=mae)
                if verbose:
                    e_np = np.asarray(state.e)[: self.train_n]
                    train_rmse = float(np.sqrt(np.mean(
                        np.clip(e_np, cfg.min_target, cfg.max_target) ** 2)))
                    print(f"#Iter={it:3d}\tTrain={train_rmse:.6g}\tTest={rmse:.6g}")
            else:
                prob = np.asarray(ref_cdf_gaussian(jnp.asarray(scores)))
                acc, ll = evaluate_classification(prob, self.test_target_np)
                rmse_file.append(acc)
                rec.update(accuracy=acc, loglik=ll)
                if verbose:
                    print(f"#Iter={it:3d}\tTest={acc:.6g}\tTest(ll)={ll:.6g}")
                state = self._resample_class_targets(state)
            history.append(rec)
        return state, history

    def _resample_class_targets(self, state: VBState) -> VBState:
        """Probit e-resampling (fm_learn_vb_simultaneous.h:172-200)."""
        e = state.e
        y = self.train_row.target
        mu = e
        sampled = jnp.where(y >= 0, truncnorm_mean_positive(mu), truncnorm_mean_negative(mu))
        return state.replace(e=sampled - e)
