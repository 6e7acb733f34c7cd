"""Learning smoke: the fused train step actually optimizes — loss on a fixed
tiny batch drops substantially; bf16 compute path trains too."""

import numpy as np
import jax
import jax.numpy as jnp

from sdm_tpu.enums import Objective
from sdm_tpu.models import UNet
from sdm_tpu.ops.schedules import LinearSchedule
from sdm_tpu.train import make_optimizer, make_train_step, create_train_state

CFG = dict(num_resnet_blocks=1, in_channel=3, out_channel=3, time_dim=8,
           cond_dim=None, num_layers=1, attn_layers=(), num_heads=1,
           dim_per_head=None, groups=8, min_channel=8, max_channel=16,
           image_recon=False)


def _train(dtype, steps=150, lr=3e-3, objective=Objective.X0):
    net = UNet(**CFG, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3),
                              minval=-1, maxval=1)
    params = net.init(rng, imgs[:1], jnp.array([1], jnp.int32))["params"]
    schedule = LinearSchedule.create(5e-3, 9e-3, 100)
    tx = make_optimizer(lr, 10_000)
    state = create_train_state(params, tx)
    apply_fn = lambda p, x, t, l: net.apply({"params": p}, x, t, l)
    step = jax.jit(make_train_step(apply_fn, schedule, tx,
                                   objective=objective,
                                   min_noise_step=1,
                                   max_actual_noise_step=100))
    losses = []
    for i in range(steps):
        state, m = step(state, {"image": imgs},
                        jax.random.fold_in(jax.random.PRNGKey(2), i))
        losses.append(float(m["loss"]))
    return losses


def test_loss_decreases_fp32():
    losses = _train(None)
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < 0.6 * first, (first, last)


def test_loss_decreases_bf16():
    losses = _train(jnp.bfloat16)
    assert np.all(np.isfinite(losses))
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < 0.7 * first, (first, last)
