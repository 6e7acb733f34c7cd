"""Tensor-parallel correctness: a dp=2 x tp=4 mesh train step (kernels
channel-sharded over "model", batch sharded over "data") must match the
single-device step — SPMD shardings never change numerics."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sdm_tpu.enums import Objective
from sdm_tpu.models import UNet
from sdm_tpu.ops.schedules import LinearSchedule
from sdm_tpu.train import make_optimizer, make_train_step, create_train_state
from sdm_tpu.parallel.tp import make_2d_mesh, tp_param_shardings

CFG = dict(num_resnet_blocks=1, in_channel=3, out_channel=3, time_dim=16,
           cond_dim=None, num_layers=2, attn_layers=(1,), num_heads=1,
           dim_per_head=None, groups=32, min_channel=128, max_channel=256,
           image_recon=False)


def test_tp_dp_step_matches_single_device():
    net = UNet(**CFG)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))
    t = jnp.asarray(np.arange(1, 9, dtype=np.int32) * 100)

    params = net.init(jax.random.PRNGKey(0), imgs[:1], t[:1])["params"]
    schedule = LinearSchedule.create(5e-3, 9e-3, 1000)
    tx = make_optimizer(1e-3, 100_000)
    apply_fn = lambda p, x, tt, l: net.apply({"params": p}, x, tt, l)
    step_fn = make_train_step(apply_fn, schedule, tx, objective=Objective.EPS)
    batch = {"image": imgs, "eps": eps, "t": t}

    # Single device.
    s1, m1 = jax.jit(step_fn)(create_train_state(params, tx), batch,
                              jax.random.PRNGKey(0))

    # dp=2 x tp=4.
    mesh = make_2d_mesh(2, 4)
    pshard = tp_param_shardings(params, mesh, min_width=256)
    # At least the widest kernels must actually be sharded.
    specs = jax.tree.leaves(jax.tree.map(lambda s: s.spec, pshard),
                            is_leaf=lambda x: isinstance(x, P))
    assert any("model" in str(s) for s in specs)

    params_tp = jax.tree.map(jax.device_put, params, pshard)
    state_tp = create_train_state(params_tp, tx)
    batch_tp = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)
    s2, m2 = jax.jit(step_fn)(state_tp, batch_tp, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, s1.params)),
                    jax.tree.leaves(jax.tree.map(np.asarray, s2.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_collective_cost_analysis_dp_vs_tp():
    """The compiled-HLO collective analysis (parallel/analysis.py) must see
    (a) exactly one param-sized gradient all-reduce under pure DP and
    (b) extra activation all-gather traffic once kernels are channel-sharded
    — the measurement behind the DP-vs-TP note in ARCHITECTURE.md."""
    from sdm_tpu.parallel.analysis import compiled_collective_bytes

    net = UNet(**CFG)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))
    t = jnp.asarray(np.arange(1, 9, dtype=np.int32) * 100)
    params = net.init(jax.random.PRNGKey(0), imgs[:1], t[:1])["params"]
    schedule = LinearSchedule.create(5e-3, 9e-3, 1000)
    tx = make_optimizer(1e-3, 100_000)
    apply_fn = lambda p, x, tt, l: net.apply({"params": p}, x, tt, l)
    step_fn = jax.jit(make_train_step(apply_fn, schedule, tx,
                                      objective=Objective.EPS))
    batch = {"image": imgs}
    param_bytes = sum(np.asarray(p).nbytes for p in jax.tree.leaves(params))

    # Pure DP over all 8 virtual devices.
    mesh_dp = make_2d_mesh(8, 1)
    st = create_train_state(
        jax.tree.map(lambda x: jax.device_put(
            x, NamedSharding(mesh_dp, P())), params), tx)
    b = jax.tree.map(lambda x: jax.device_put(
        x, NamedSharding(mesh_dp, P("data"))), batch)
    dp_cost = compiled_collective_bytes(step_fn, st, b, jax.random.PRNGKey(0))
    # One fp32 gradient all-reduce of every param. Slightly less than
    # param_bytes: the parity dead weights (AdaGN y_shift, attention norm)
    # have constant-zero grads whose all-reduce XLA elides.
    assert dp_cost["all-reduce"] >= 0.98 * param_bytes, (dp_cost, param_bytes)
    assert dp_cost["all-reduce"] < 3 * param_bytes, (dp_cost, param_bytes)
    assert dp_cost["all-gather"] == 0

    # dp=4 x tp=2: channel-sharded kernels add activation collectives.
    mesh = make_2d_mesh(4, 2)
    pshard = tp_param_shardings(params, mesh, min_width=256)
    st_tp = create_train_state(jax.tree.map(jax.device_put, params, pshard),
                               tx)
    b_tp = jax.tree.map(lambda x: jax.device_put(
        x, NamedSharding(mesh, P("data"))), batch)
    tp_cost = compiled_collective_bytes(step_fn, st_tp, b_tp,
                                        jax.random.PRNGKey(0))
    assert tp_cost["all-gather"] + tp_cost["reduce-scatter"] > 0, tp_cost
    assert tp_cost["total"] > dp_cost["total"] * 0.5  # sanity: nonzero scale
