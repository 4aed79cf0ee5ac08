import numpy as np
import pytest

from svbfm_tpu.data.dataset import SparseDataset
from svbfm_tpu.data.meta import DataMetaInfo
from svbfm_tpu.data.synth import make_movielens_like, train_test_split
from svbfm_tpu.learners.base import FMConfig, TASK_CLASSIFICATION
from svbfm_tpu.learners.sgd import SGDALearner, SGDLearner, SGDOnlineLearner
from svbfm_tpu.parallel.mesh import make_mesh


def _setup(num_rows=2000, num_users=30, num_items=25, K=4, n_dev=1, seed=3,
           task=0, **cfg_kw):
    coo = make_movielens_like(num_users=num_users, num_items=num_items,
                              num_ratings=num_rows, rank=2, noise=0.4, seed=seed)
    tr, te = train_test_split(coo, 0.2, seed=seed + 1)
    D = coo.num_features
    meta = DataMetaInfo.from_field_offsets(D, [0, num_users])
    if task == TASK_CLASSIFICATION:
        thresh = np.median(tr.target)
        tr.target = np.where(tr.target > thresh, 1.0, -1.0).astype(np.float32)
        te.target = np.where(te.target > thresh, 1.0, -1.0).astype(np.float32)
    cfg = FMConfig(num_attributes=D, num_factor=K, task=task,
                   min_target=float(tr.target.min()), max_target=float(tr.target.max()),
                   num_groups=meta.num_attr_groups, seed=7, learn_rate=0.05,
                   regw=0.01, regv=0.01, batch_size=128, **cfg_kw)
    mesh = make_mesh(n_dev)
    return (SparseDataset.from_coo(tr, D), SparseDataset.from_coo(te, D),
            cfg, meta, mesh, tr, te)


@pytest.mark.parametrize("n_dev", [1, 4])
def test_sgd_regression_converges(n_dev):
    tr_ds, te_ds, cfg, meta, mesh, tr, te = _setup(n_dev=n_dev)
    learner = SGDLearner(cfg, tr_ds, te_ds, meta, mesh=mesh, write_files=False)
    state, history = learner.run(num_iter=15, verbose=False)
    assert history[-1]["rmse"] < history[0]["rmse"]
    assert history[-1]["rmse"] < 1.0


def test_sgd_classification_learns():
    tr_ds, te_ds, cfg, meta, mesh, tr, te = _setup(task=TASK_CLASSIFICATION,
                                                   num_rows=3000)
    learner = SGDLearner(cfg, tr_ds, te_ds, meta, mesh=mesh, write_files=False)
    state, history = learner.run(num_iter=15, verbose=False)
    assert history[-1]["accuracy"] > 0.6


def test_sgd_sharding_invariance():
    tr_ds, te_ds, cfg, meta, mesh1, *_ = _setup(n_dev=1, num_rows=512)
    *_ignore, mesh8 = _setup(n_dev=8, num_rows=512)[:5] + (make_mesh(8),)
    l1 = SGDLearner(cfg, tr_ds, te_ds, meta, mesh=make_mesh(1), write_files=False)
    l8 = SGDLearner(cfg, tr_ds, te_ds, meta, mesh=make_mesh(8), write_files=False)
    s1, h1 = l1.run(num_iter=3, verbose=False)
    s8, h8 = l8.run(num_iter=3, verbose=False)
    # different shard-local shuffles -> not bitwise equal, but same
    # optimization trajectory statistically
    assert abs(h1[-1]["rmse"] - h8[-1]["rmse"]) < 0.08


def test_sgda_adapts_regularization():
    tr_ds, te_ds, cfg, meta, mesh, tr, te = _setup(num_rows=3000)
    # carve validation out of train
    val_ds = SparseDataset(
        ids=tr_ds.ids[:400], vals=tr_ds.vals[:400], target=tr_ds.target[:400],
        num_rows=400, num_features=tr_ds.num_features,
        min_target=tr_ds.min_target, max_target=tr_ds.max_target,
        row_nnz=tr_ds.row_nnz[:400])
    learner = SGDALearner(cfg, tr_ds, te_ds, val_ds, meta, mesh=mesh,
                          write_files=False)
    state, history = learner.run(num_iter=10, verbose=False)
    assert history[-1]["rmse"] < history[0]["rmse"]
    # regs were adapted away from 0 at some point
    assert np.all(np.asarray(state.reg_w) >= 0)


def test_sgd_online_matches_sgd_quality():
    tr_ds, te_ds, cfg, meta, mesh, tr, te = _setup(num_rows=3000)
    import dataclasses
    cfg_o = dataclasses.replace(cfg, num_batches=4)
    learner = SGDOnlineLearner(cfg_o, tr_ds, te_ds, meta, mesh=mesh,
                               write_files=False)
    state, history = learner.run(num_iter=10, verbose=False)
    assert history[-1]["rmse"] < history[0]["rmse"]
    assert history[-1]["rmse"] < 1.0
