"""FM forward kernels over the padded row layout.

The canonical O(K * nnz) pairwise trick (reference ``fm_model.h:107-130``):

    y(x) = w0 + sum_i w_i x_i + 0.5 * sum_f [ (sum_i v_fi x_i)^2
                                              - sum_i v_fi^2 x_i^2 ]

and the VBFM variance-propagation T-terms (reference
``fm_learn_vb.h:207-312``, paper Eq. 26): with m = mu'_v, s = sigma'_v,

    T(x) = sigma'_0 + sum_i sigma'_w,i x_i^2
         + sum_f [ 0.5 * z_f^2 + z_f * q2_f
                   - sum_i (m_fi^2 x_i^4 s_fi + 0.5 x_i^4 s_fi^2) ]
    where q2_f = sum_i (m_fi x_i)^2,  z_f = sum_i s_fi x_i^2.

All shapes static; padding entries have value 0 so they contribute nothing.
On TPU these are embedding-style gathers + VPU elementwise work; XLA fuses
the chain.  `factor_chunk` bounds the (chunk, N, P) gather intermediate so
HBM use stays flat for large N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svbfm_tpu.ops.segment import take_cols as _gather_rows


def fm_scores_and_sums(w0, w, v, ids, vals, k0: bool = True, k1: bool = True):
    """Returns (scores [N], sum_f [K, N]) — sum_f is the per-factor
    linear term cached by the SGD kernel (reference ``fm_sgd.h:44-50``)."""
    N = ids.shape[0]
    dtype = v.dtype
    acc = jnp.zeros((N,), dtype)
    if k0:
        acc = acc + w0
    if k1:
        for p in range(ids.shape[1]):
            acc = acc + jnp.take(w, ids[:, p], axis=-1) * vals[:, p]
    vg = _gather_rows(v, ids)  # [K, N, P]
    d = vg * vals[None]
    s = d.sum(-1)  # [K, N]
    s2 = (d * d).sum(-1)
    acc = acc + 0.5 * (s * s - s2).sum(0)
    return acc, s


def fm_scores(w0, w, v, ids, vals, k0: bool = True, k1: bool = True,
              factor_chunk: int | None = None) -> jax.Array:
    """FM scores for a batch of rows; factor loop chunked to bound memory."""
    N = ids.shape[0]
    K = v.shape[0]
    dtype = v.dtype
    acc = jnp.zeros((N,), dtype)
    if k0:
        acc = acc + w0
    if k1:
        for p in range(ids.shape[1]):
            acc = acc + jnp.take(w, ids[:, p], axis=-1) * vals[:, p]
    if K == 0:
        return acc
    chunk = K if factor_chunk is None else min(factor_chunk, K)
    if K % chunk != 0:
        chunk = K  # keep shapes static; fall back to single chunk

    def blk(v_blk):
        # per-position flat gathers: a [chunk, N, P] temp would get its
        # size-P minor dim tile-padded up to 64x on TPU
        s = 0.0
        s2 = 0.0
        for p in range(ids.shape[1]):
            d = jnp.take(v_blk, ids[:, p], axis=-1) * vals[:, p]  # [chunk, N]
            s = s + d
            s2 = s2 + d * d
        return 0.5 * (s * s - s2).sum(0)

    if chunk == K:
        return acc + blk(v)
    vc = v.reshape(K // chunk, chunk, v.shape[1])
    # stacked-output scan (carry-free: plays nice with shard_map vma tracking)
    _, parts = jax.lax.scan(lambda c, vb: (c, blk(vb)), 0, vc)
    return acc + parts.sum(0)


def fm_t_terms(sigma_0_dash, sigma_w_dash, mu_v_dash, sigma_v_dash, ids, vals,
               k0: bool = True, k1: bool = True,
               factor_chunk: int | None = None) -> jax.Array:
    """VBFM T-terms (predictive-variance propagation) per row."""
    N = ids.shape[0]
    K = mu_v_dash.shape[0]
    dtype = mu_v_dash.dtype
    x2 = vals * vals
    acc = jnp.zeros((N,), dtype)
    if k0:
        acc = acc + sigma_0_dash
    if k1:
        for p in range(ids.shape[1]):
            acc = acc + jnp.take(sigma_w_dash, ids[:, p], axis=-1) * x2[:, p]
    if K == 0:
        return acc
    chunk = K if factor_chunk is None else min(factor_chunk, K)
    if K % chunk != 0:
        chunk = K

    def blk(m_blk, s_blk):
        # per-position flat gathers (see fm_scores: avoids P-minor padding)
        q2 = 0.0
        z = 0.0
        neg = 0.0
        for p in range(ids.shape[1]):
            mg = jnp.take(m_blk, ids[:, p], axis=-1)  # [chunk, N]
            sg = jnp.take(s_blk, ids[:, p], axis=-1)
            x2p = x2[:, p]
            mx = mg * vals[:, p]
            q2 = q2 + mx * mx
            z = z + sg * x2p
            neg = neg + mg * mg * (x2p * x2p) * sg + 0.5 * (x2p * x2p) * sg * sg
        t = 0.5 * z * z + z * q2 - neg
        return t.sum(0)

    if chunk == K:
        return acc + blk(mu_v_dash, sigma_v_dash)
    mc = mu_v_dash.reshape(K // chunk, chunk, mu_v_dash.shape[1])
    sc = sigma_v_dash.reshape(K // chunk, chunk, sigma_v_dash.shape[1])
    _, parts = jax.lax.scan(lambda c, b: (c, blk(*b)), 0, (mc, sc))
    return acc + parts.sum(0)
