"""Mid-box checkpoint/resume: joint inference interrupted after a Cyclades
batch resumes from the cursor and produces the same results as an
uninterrupted run."""

import numpy as np

from celeste_jl_tpu.ops.newton import NewtonConfig
from celeste_jl_tpu.parallel.run import InferenceState, one_node_joint_infer
from celeste_jl_tpu.synthetic import (gen_images, make_blank_images,
                                      sample_star)
from celeste_jl_tpu.utils.config import Config

CFG = Config(min_radius_pix=6.0, num_joint_vi_iters=2)
NEWT = NewtonConfig(max_iters=8, hess_every=4)


def _scene():
    truth = [sample_star(pos=(12.0, 12.0), r_flux=30.0),
             sample_star(pos=(30.0, 30.0), r_flux=25.0)]
    images = make_blank_images(H=44, W=44)
    gen_images(images, truth, seed=9)
    return truth, images


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    truth, images = _scene()
    ck = str(tmp_path / "state.npz")

    ref = one_node_joint_infer(truth, images, config=CFG, newton_config=NEWT)

    # run once writing checkpoints, then "crash" and resume: restoring from
    # the final checkpoint must skip all work and reproduce the results
    res1 = one_node_joint_infer(truth, images, config=CFG,
                                newton_config=NEWT, checkpoint_path=ck)
    res2 = one_node_joint_infer(truth, images, config=CFG,
                                newton_config=NEWT, checkpoint_path=ck)
    for a, b, c in zip(ref, res1, res2):
        np.testing.assert_allclose(b.vs, a.vs, rtol=1e-10)
        np.testing.assert_allclose(c.vs, b.vs, rtol=0)   # pure restore
        assert c.elbo == b.elbo


def test_state_save_restore_roundtrip(tmp_path):
    truth, images = _scene()
    st = InferenceState(truth, images, CFG)
    st.vps[:] = np.random.default_rng(0).normal(size=st.vps.shape)
    st.elbos[:] = [-1.0, -2.0]
    st.converged[:] = [True, False]
    path = str(tmp_path / "st.npz")
    st.save(path, cursor=3)

    st2 = InferenceState(truth, images, CFG)
    cursor = st2.restore(path)
    assert cursor == 3
    np.testing.assert_array_equal(st2.vps, st.vps)
    np.testing.assert_array_equal(st2.converged, st.converged)
