"""Edge dimension configs: k0/k1 off, K=0 (dim '1,1,0' / '0,0,K' etc.)."""
import numpy as np
import pytest

from svbfm_tpu.data.dataset import SparseDataset
from svbfm_tpu.data.meta import DataMetaInfo
from svbfm_tpu.data.synth import make_movielens_like, train_test_split
from svbfm_tpu.learners.base import FMConfig
from svbfm_tpu.learners.mcmc import ALSLearner
from svbfm_tpu.learners.sgd import SGDLearner
from svbfm_tpu.learners.vb import VBLearner
from svbfm_tpu.parallel.mesh import make_mesh


def _data(seed=2):
    coo = make_movielens_like(num_users=12, num_items=9, num_ratings=600,
                              rank=2, noise=0.4, seed=seed)
    tr, te = train_test_split(coo, 0.2, seed=seed + 1)
    D = coo.num_features
    meta = DataMetaInfo.from_field_offsets(D, [0, 12])
    return tr, te, D, meta


@pytest.mark.parametrize("k0,k1,K", [(True, True, 0), (False, False, 3),
                                     (True, False, 2), (False, True, 0)])
@pytest.mark.parametrize("cls", [VBLearner, ALSLearner, SGDLearner])
def test_edge_dims_run_and_stay_finite(k0, k1, K, cls):
    tr, te, D, meta = _data()
    cfg = FMConfig(num_attributes=D, num_factor=K, k0=k0, k1=k1,
                   min_target=float(tr.target.min()),
                   max_target=float(tr.target.max()),
                   num_groups=meta.num_attr_groups, seed=7,
                   learn_rate=0.05, regw=0.05, regv=0.05, batch_size=64)
    learner = cls(cfg, SparseDataset.from_coo(tr, D),
                  SparseDataset.from_coo(te, D), meta, mesh=make_mesh(2),
                  write_files=False)
    state, history = learner.run(num_iter=3, verbose=False)
    key = "rmse" if "rmse" in history[-1] else "rmse_this"
    assert np.isfinite(history[-1][key])
    if k0:  # without the bias term the model can't center 1..5 targets fast
        assert history[-1][key] < 2.0
