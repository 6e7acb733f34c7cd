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


def test_tp_through_training_loop(tmp_path):
    """Config "tp": 2 through run_training (VERDICT r3 item 2: TP reachable
    by users, not just the dryrun) must reproduce the default 1-D data-mesh
    run: same seeded draws, same losses, identical checkpoint params — and
    actually shard the wide kernels over the "model" axis."""
    import glob
    import torch
    from sdm_tpu.train.loop import run_training, BASE_SPEC
    from tests.test_train_loop import _mk_images, _base_config

    _mk_images(tmp_path, n=8)
    results = {}
    for tp in (1, 2):
        cfg = _base_config(
            tmp_path, batch_size=8, seed=7, checkpoint_steps=2,
            min_channel=32, max_channel=64, num_layers=2, attn_layers=[1],
            out_dir=str(tmp_path / f"out_tp_{tp}"), tp=tp, tp_min_width=32)
        results[tp] = run_training(BASE_SPEC, cfg, max_steps=2)
        assert np.isfinite(results[tp]["last_loss"])
        if tp > 1:
            # The state really is model-sharded in the returned TrainState.
            specs = [str(l.sharding.spec) for l in
                     jax.tree.leaves(results[tp]["state"].params)]
            assert any("model" in s for s in specs), specs
    assert np.isclose(results[1]["last_loss"], results[2]["last_loss"],
                      rtol=5e-4)

    ckpts = {t: sorted(glob.glob(str(
        tmp_path / f"out_tp_{t}" / "checkpoint" / "diffusion_*.pt")))
        for t in (1, 2)}
    a = torch.load(ckpts[1][-1], map_location="cpu", weights_only=False)
    b = torch.load(ckpts[2][-1], map_location="cpu", weights_only=False)
    for k in a["model"]:
        np.testing.assert_allclose(a["model"][k].numpy(),
                                   b["model"][k].numpy(),
                                   rtol=1e-3, atol=2.5e-4, err_msg=k)


def test_tp_fsdp_sp_composed_training_loop(tmp_path):
    """tp=2 x sp=2 x fsdp on the 8-device virtual mesh (dp=2) — the full
    composition the driver dryrun runs, now through the USER-facing config —
    pinned to the plain run and resumable from its own checkpoint."""
    import glob
    from sdm_tpu.train.loop import run_training, BASE_SPEC
    from tests.test_train_loop import _mk_images, _base_config

    _mk_images(tmp_path, n=8)
    base = dict(batch_size=8, seed=3, checkpoint_steps=100,
                min_channel=32, max_channel=64, num_layers=2, attn_layers=[1],
                tp_min_width=32, fsdp_min_size=1024)
    r_plain = run_training(BASE_SPEC, _base_config(
        tmp_path, out_dir=str(tmp_path / "out_plain"), **base), max_steps=2)
    r_comp = run_training(BASE_SPEC, _base_config(
        tmp_path, out_dir=str(tmp_path / "out_comp"), tp=2, sp=2, fsdp=True,
        **base), max_steps=2)
    assert np.isclose(r_plain["last_loss"], r_comp["last_loss"], rtol=5e-4)

    # Resume from the composed run's checkpoint with the same parallelism.
    ckpt = sorted(glob.glob(str(
        tmp_path / "out_comp" / "checkpoint" / "diffusion_*.pt")))[-1]
    cfg2 = _base_config(
        tmp_path, out_dir=str(tmp_path / "out_resume"), tp=2, sp=2,
        fsdp=True, model_checkpoint=ckpt, load_diffusion_optim=True, **base)
    r_resume = run_training(BASE_SPEC, cfg2, max_steps=1)
    assert np.isfinite(r_resume["last_loss"])


def test_tp_loop_validation_errors(tmp_path):
    import pytest
    from sdm_tpu.train.loop import run_training, BASE_SPEC
    from tests.test_train_loop import _mk_images, _base_config

    _mk_images(tmp_path, n=8)
    with pytest.raises(ValueError, match="must divide the device count"):
        run_training(BASE_SPEC, _base_config(tmp_path, batch_size=4, tp=3),
                     max_steps=1)
    with pytest.raises(ValueError, match='"tp" must be >= 1'):
        run_training(BASE_SPEC, _base_config(tmp_path, batch_size=4, tp=0),
                     max_steps=1)
