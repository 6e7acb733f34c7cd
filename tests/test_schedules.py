"""Schedule numerics: closed-form checks + golden parity vs reference degraders."""

import numpy as np
import jax.numpy as jnp
import torch

from sdm_tpu.ops.schedules import LinearSchedule, CosineSchedule, make_schedule
from tests.reference_loader import load_reference

REF = load_reference()


def test_linear_tables_match_reference():
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    ref = REF.NoiseDegradation(5e-3, 9e-3, 1000, "cpu")
    np.testing.assert_allclose(np.asarray(sched.beta), ref.beta.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alpha), ref.alpha.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alpha_bar),
                               ref.alpha_cumulative_prod.numpy(), rtol=1e-5)
    assert sched.beta.shape == (1001,)  # T+1 entries (degraders.py:26-30)


def test_linear_timestep_params_and_q_sample():
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    ref = REF.NoiseDegradation(5e-3, 9e-3, 1000, "cpu")
    steps = np.array([0, 1, 500, 999, 1000])
    b, a, ab = sched.timestep_params(jnp.asarray(steps))
    rb, ra, rab = ref.get_timestep_params(torch.from_numpy(steps))
    np.testing.assert_allclose(np.asarray(b), rb.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a), ra.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ab), rab.numpy(), rtol=1e-5)

    rng = np.random.default_rng(1)
    img = rng.standard_normal((5, 8, 8, 3)).astype(np.float32)
    eps = rng.standard_normal((5, 8, 8, 3)).astype(np.float32)
    ours = sched.q_sample(jnp.asarray(img), jnp.asarray(steps), jnp.asarray(eps))
    # Reference is NCHW; transpose for comparison.
    theirs = ref.forward(torch.from_numpy(img.transpose(0, 3, 1, 2)),
                         torch.from_numpy(steps),
                         torch.from_numpy(eps.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.numpy().transpose(0, 2, 3, 1), rtol=2e-5, atol=1e-6)


def test_cosine_matches_reference():
    sched = CosineSchedule.create(1000)
    ref = REF.CosineNoiseDegradation(1000)
    steps = np.array([1, 2, 250, 500, 999, 1000])
    b, a, ab = sched.timestep_params(jnp.asarray(steps))
    rb, ra, rab = ref.get_timestep_params(torch.from_numpy(steps).float())
    np.testing.assert_allclose(np.asarray(b), rb.numpy(), rtol=1e-5, atol=5e-7)
    np.testing.assert_allclose(np.asarray(a), ra.numpy(), rtol=1e-5, atol=5e-7)
    np.testing.assert_allclose(np.asarray(ab), rab.numpy(), rtol=1e-5, atol=5e-7)
    # Beta clipping to [0.001, 0.999] (degraders.py:91).
    bigsteps = jnp.arange(1, 1001)
    b_all, _, _ = sched.timestep_params(bigsteps)
    assert float(jnp.min(b_all)) >= 0.001 - 1e-6
    assert float(jnp.max(b_all)) <= 0.999 + 1e-6


def test_make_schedule_vocabulary():
    assert isinstance(make_schedule("LINEAR"), LinearSchedule)
    assert isinstance(make_schedule("COSINE"), CosineSchedule)
    try:
        make_schedule("WRONG")
        assert False
    except ValueError:
        pass
