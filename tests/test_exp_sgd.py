import numpy as np

from svbfm_tpu.data.dataset import SparseDataset
from svbfm_tpu.data.meta import DataMetaInfo
from svbfm_tpu.data.synth import make_movielens_like, train_test_split
from svbfm_tpu.learners.base import FMConfig
from svbfm_tpu.learners.exp_sgd import ExpSGDLearner, ExpSGDStocLearner
from svbfm_tpu.parallel.mesh import make_mesh


def _setup(num_rows=2000, num_users=30, num_items=25, K=4, n_dev=1, seed=3,
           **cfg_kw):
    coo = make_movielens_like(num_users=num_users, num_items=num_items,
                              num_ratings=num_rows, rank=2, noise=0.4, seed=seed)
    tr, te = train_test_split(coo, 0.2, seed=seed + 1)
    D = coo.num_features
    meta = DataMetaInfo.from_field_offsets(D, [0, num_users])
    cfg = FMConfig(num_attributes=D, num_factor=K,
                   min_target=float(tr.target.min()), max_target=float(tr.target.max()),
                   num_groups=meta.num_attr_groups, seed=7, **cfg_kw)
    return (SparseDataset.from_coo(tr, D), SparseDataset.from_coo(te, D),
            cfg, meta, make_mesh(n_dev))


def test_exp_sgd_full_batch_converges():
    tr_ds, te_ds, cfg, meta, mesh = _setup(learn_rate=0.5, stdev=1.0)
    learner = ExpSGDLearner(cfg, tr_ds, te_ds, meta, mesh=mesh,
                            write_files=False)
    state, history = learner.run(num_iter=20, verbose=False)
    assert history[-1]["rmse"] < history[0]["rmse"]
    assert np.isfinite(history[-1]["rmse"])


def test_exp_sgd_stoc_converges():
    tr_ds, te_ds, cfg, meta, mesh = _setup(learn_rate=0.05, batch_size=128,
                                           regw=0.01, regv=0.01)
    learner = ExpSGDStocLearner(cfg, tr_ds, te_ds, meta, mesh=mesh,
                                write_files=False)
    state, history = learner.run(num_iter=10, verbose=False)
    assert history[-1]["rmse"] < history[0]["rmse"]
