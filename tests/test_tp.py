"""Feature-axis (tensor-parallel) scoring: sharded V/w across the mesh."""
import numpy as np
import jax.numpy as jnp

from svbfm_tpu.models.fm import init_fm_params
from svbfm_tpu.ops.forward import fm_scores
from svbfm_tpu.parallel.mesh import make_mesh
from svbfm_tpu.parallel.tp import (make_tp_scorer, pad_feature_dim,
                                   shard_params_by_feature)


def test_tp_scores_match_replicated():
    import jax
    rng = np.random.default_rng(0)
    D, K, N, P = 1000, 8, 512, 3
    w0 = np.float32(0.3)
    w = rng.standard_normal(D).astype(np.float32)
    v = (0.1 * rng.standard_normal((K, D))).astype(np.float32)
    ids = rng.integers(0, D, size=(N, P)).astype(np.int32)
    vals = rng.random((N, P)).astype(np.float32)

    ref = np.asarray(fm_scores(jnp.asarray(w0), jnp.asarray(w), jnp.asarray(v),
                               jnp.asarray(ids), jnp.asarray(vals)))

    mesh = make_mesh(8)
    scorer, d_pad = make_tp_scorer(mesh, D)
    w0_s, w_s, v_s = shard_params_by_feature(
        mesh, w0, pad_feature_dim(w, d_pad), pad_feature_dim(v, d_pad))
    out = np.asarray(scorer(w0_s, w_s, v_s, jnp.asarray(ids), jnp.asarray(vals)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_tp_no_k0_k1():
    rng = np.random.default_rng(1)
    D, K, N, P = 64, 4, 128, 2
    v = (0.1 * rng.standard_normal((K, D))).astype(np.float32)
    ids = rng.integers(0, D, size=(N, P)).astype(np.int32)
    vals = rng.random((N, P)).astype(np.float32)
    ref = np.asarray(fm_scores(jnp.asarray(0.0), jnp.zeros(D, jnp.float32),
                               jnp.asarray(v), jnp.asarray(ids),
                               jnp.asarray(vals), k0=False, k1=False))
    mesh = make_mesh(4)
    scorer, d_pad = make_tp_scorer(mesh, D, k0=False, k1=False)
    w0_s, w_s, v_s = shard_params_by_feature(
        mesh, 0.0, pad_feature_dim(np.zeros(D, np.float32), d_pad),
        pad_feature_dim(v, d_pad))
    out = np.asarray(scorer(w0_s, w_s, v_s, jnp.asarray(ids), jnp.asarray(vals)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
