import numpy as np

from svbfm_tpu.data.dataset import SparseDataset
from svbfm_tpu.data.meta import DataMetaInfo
from svbfm_tpu.data.synth import make_movielens_like, train_test_split
from svbfm_tpu.learners.base import FMConfig
from svbfm_tpu.learners.vb import VBLearner
from svbfm_tpu.parallel.mesh import make_mesh
from svbfm_tpu.utils.checkpoint import (CheckpointManager, load_checkpoint,
                                        save_checkpoint)


def _learner(seed=2):
    coo = make_movielens_like(num_users=12, num_items=9, num_ratings=400,
                              rank=2, noise=0.4, seed=seed)
    tr, te = train_test_split(coo, 0.25, seed=seed + 1)
    D = coo.num_features
    meta = DataMetaInfo.from_field_offsets(D, [0, 12])
    cfg = FMConfig(num_attributes=D, num_factor=3,
                   min_target=float(tr.target.min()), max_target=float(tr.target.max()),
                   num_groups=meta.num_attr_groups, seed=7)
    return VBLearner(cfg, SparseDataset.from_coo(tr, D),
                     SparseDataset.from_coo(te, D), meta, mesh=make_mesh(2),
                     write_files=False)


def test_save_load_roundtrip(tmp_path):
    l = _learner()
    s = l.init_state()
    p = str(tmp_path / "c.npz")
    save_checkpoint(p, s, 5, {"k": "v"})
    s2, step, meta = load_checkpoint(p, s)
    assert step == 5 and meta == {"k": "v"}
    np.testing.assert_array_equal(np.asarray(s.mu_v), np.asarray(s2.mu_v))
    np.testing.assert_array_equal(np.asarray(s.e), np.asarray(s2.e))


def test_resume_matches_uninterrupted(tmp_path):
    # continuous run of 6 iters
    l1 = _learner()
    s_full, h_full = l1.run(num_iter=6, verbose=False, chunk=3)

    # run 3, checkpoint, new learner resumes for the remaining 3
    l2 = _learner()
    mgr = CheckpointManager(str(tmp_path / "ck"))
    import os
    os.makedirs(str(tmp_path / "ck"), exist_ok=True)
    s_half, _ = l2.run(num_iter=3, verbose=False, chunk=3, ckpt=mgr,
                       ckpt_every=3)
    l3 = _learner()
    s_res, h_res = l3.run(num_iter=6, verbose=False, chunk=3, ckpt=mgr,
                          ckpt_every=100)
    np.testing.assert_allclose(np.asarray(s_res.mu_v), np.asarray(s_full.mu_v),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(s_res.alpha), float(s_full.alpha), rtol=1e-5)
    assert h_res[-1]["iter"] == 5


def test_mcmc_resume_matches(tmp_path):
    from svbfm_tpu.learners.mcmc import ALSLearner
    import dataclasses
    coo = make_movielens_like(num_users=12, num_items=9, num_ratings=400,
                              rank=2, noise=0.4, seed=2)
    tr, te = train_test_split(coo, 0.25, seed=3)
    D = coo.num_features
    meta = DataMetaInfo.from_field_offsets(D, [0, 12])
    cfg = FMConfig(num_attributes=D, num_factor=3,
                   min_target=float(tr.target.min()), max_target=float(tr.target.max()),
                   num_groups=meta.num_attr_groups, seed=7, regw=0.1, regv=0.1)
    mk = lambda: ALSLearner(cfg, SparseDataset.from_coo(tr, D),
                            SparseDataset.from_coo(te, D), meta,
                            mesh=make_mesh(2), write_files=False)
    s_full, h_full = mk().run(num_iter=6, verbose=False, chunk=3)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mk().run(num_iter=3, verbose=False, chunk=3, ckpt=mgr, ckpt_every=3)
    s_res, h_res = mk().run(num_iter=6, verbose=False, chunk=3, ckpt=mgr,
                            ckpt_every=100)
    np.testing.assert_allclose(np.asarray(s_res.v), np.asarray(s_full.v),
                               rtol=1e-5, atol=1e-7)
    # posterior-mean accumulator continuity: running-mean RMSE matches
    np.testing.assert_allclose(h_res[-1]["rmse"], h_full[-1]["rmse"], rtol=1e-5)


def test_ovb_resume_matches(tmp_path):
    from svbfm_tpu.learners.vb_online import OVBLearner
    coo = make_movielens_like(num_users=12, num_items=9, num_ratings=400,
                              rank=2, noise=0.4, seed=2)
    tr, te = train_test_split(coo, 0.25, seed=3)
    D = coo.num_features
    meta = DataMetaInfo.from_field_offsets(D, [0, 12])
    cfg = FMConfig(num_attributes=D, num_factor=3,
                   min_target=float(tr.target.min()), max_target=float(tr.target.max()),
                   num_groups=meta.num_attr_groups, seed=7, num_batches=3)
    mk = lambda: OVBLearner(cfg, SparseDataset.from_coo(tr, D),
                            SparseDataset.from_coo(te, D), meta,
                            mesh=make_mesh(2), write_files=False)
    s_full, h_full = mk().run(num_iter=6, verbose=False)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mk().run(num_iter=3, verbose=False, ckpt=mgr, ckpt_every=3)
    s_res, h_res = mk().run(num_iter=6, verbose=False, ckpt=mgr, ckpt_every=100)
    np.testing.assert_allclose(np.asarray(s_res.mu_v), np.asarray(s_full.mu_v),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(h_res[-1]["rmse"], h_full[-1]["rmse"], rtol=1e-5)
