"""Train-step parity and data-parallel correctness.

- full single-step parity vs torch (same weights, same t/eps): loss, grads,
  and post-Adam params must match;
- LR-halving schedule matches the reference's post-step halving semantics;
- one step on a 1-device mesh == one step with the batch sharded over all 8
  virtual devices (gradient psum over the mesh);
- SR objective reproduces the reference's residual target & fixed-cond_t
  noising; area_resize matches torch F.interpolate(mode="area").
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from sdm_tpu.enums import Objective
from sdm_tpu.models import UNet
from sdm_tpu.ops.schedules import LinearSchedule
from sdm_tpu.ops.resize import area_resize
from sdm_tpu.io.torch_interop import (
    torch_state_dict_to_params, params_to_torch_state_dict)
from sdm_tpu.train import (
    TrainState, make_optimizer, make_train_step, create_train_state,
    reference_lr_schedule)
from sdm_tpu.parallel import make_mesh, shard_batch, replicated_sharding
from tests.reference_loader import load_reference

REF = load_reference()

CFG = dict(
    num_resnet_blocks=1, in_channel=3, out_channel=3, time_dim=16,
    cond_dim=None, num_layers=2, attn_layers=[1], num_heads=1,
    dim_per_head=None, groups=32, min_channel=32, max_channel=64,
    image_recon=False,
)


def _setup(cfg=CFG, lr=1e-3):
    torch.manual_seed(0)
    ref_net = REF.U_Net(**cfg)
    params = torch_state_dict_to_params(ref_net.state_dict())
    net = UNet(**dict(cfg, attn_layers=tuple(cfg["attn_layers"])))
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    ref_sched = REF.NoiseDegradation(5e-3, 9e-3, 1000, "cpu")
    tx = make_optimizer(lr, lr_steps=100_000)
    apply_fn = lambda p, x, t, l: net.apply({"params": p}, x, t, l)
    return ref_net, ref_sched, net, sched, params, tx, apply_fn


def test_single_step_loss_and_grad_parity_vs_torch():
    lr = 1e-3
    ref_net, ref_sched, net, sched, params, tx, apply_fn = _setup(lr=lr)
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    eps = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    t = np.array([3, 400, 999, 57], dtype=np.int64)

    # --- torch side (exact reference math, fp32 / no autocast) ---
    x_t = ref_sched.forward(torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                            torch.from_numpy(t),
                            torch.from_numpy(eps.transpose(0, 3, 1, 2)))
    pred = ref_net(x_t, torch.from_numpy(t), None)
    loss_ref = F.mse_loss(pred, torch.from_numpy(eps.transpose(0, 3, 1, 2)))
    loss_ref.backward()
    torch_grads = {k: p.grad.numpy() if p.grad is not None else None
                   for k, p in ref_net.named_parameters()}

    # --- our side: fused q_sample -> forward -> mse -> grad ---
    def loss_fn(p):
        x_t_j = sched.q_sample(jnp.asarray(imgs), jnp.asarray(t),
                               jnp.asarray(eps))
        out = apply_fn(p, x_t_j, jnp.asarray(t), None)
        return jnp.mean(jnp.square(out - jnp.asarray(eps)))

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(loss), float(loss_ref.detach()), rtol=1e-3)

    ours_grads = params_to_torch_state_dict(jax.tree.map(np.asarray, grads))
    checked = 0
    for k, g_ref in torch_grads.items():
        if g_ref is None:
            continue
        g_ours = ours_grads[k].numpy()
        scale = max(np.abs(g_ref).max(), 1e-6)
        np.testing.assert_allclose(g_ours / scale, g_ref / scale,
                                   atol=5e-3, err_msg=k)
        checked += 1
    assert checked > 40


def test_multi_step_trajectory_parity_vs_torch():
    """8 CONSECUTIVE train steps in both frameworks from the same converted
    init, with injected per-step t/eps batches and lr_steps=3 so two LR
    halvings land mid-trajectory (after steps 3 and 6): per-step losses and
    the final parameter trajectory must stay within tolerance. Pins the
    integration of Adam state, LR halving and step counting over time that
    the single-step tests above cannot (reference loop:
    train_diffusion.py:333-371)."""
    lr, lr_steps, n_steps = 1e-3, 3, 8
    ref_net, ref_sched, net, sched, params, _, apply_fn = _setup(lr=lr)
    tx = make_optimizer(lr, lr_steps=lr_steps)
    rng = np.random.default_rng(11)
    batches = [
        (rng.standard_normal((4, 16, 16, 3)).astype(np.float32),
         rng.standard_normal((4, 16, 16, 3)).astype(np.float32),
         rng.integers(1, 1000, size=(4,)).astype(np.int64))
        for _ in range(n_steps)]

    # --- torch side: the reference's loop order — q_sample -> fwd -> mse ->
    # backward -> Adam step -> halve LR when global_steps % lr_steps == 0
    # (train_diffusion.py:333-371), fp32 / no autocast.
    optim = torch.optim.Adam(ref_net.parameters(), lr=lr, betas=(0.5, 0.999))
    ref_losses = []
    for global_steps, (imgs, eps, t) in enumerate(batches):
        optim.zero_grad()
        x_t = ref_sched.forward(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            torch.from_numpy(eps.transpose(0, 3, 1, 2)))
        pred = ref_net(x_t, torch.from_numpy(t), None)
        loss = F.mse_loss(pred, torch.from_numpy(eps.transpose(0, 3, 1, 2)))
        loss.backward()
        optim.step()
        ref_losses.append(float(loss.detach()))
        if global_steps % lr_steps == 0 and global_steps > 0:
            for g in optim.param_groups:
                g["lr"] = g["lr"] * 0.5

    # --- our side: the real jitted train step, chained state.
    step_fn = jax.jit(make_train_step(apply_fn, sched, tx,
                                      objective=Objective.EPS))
    state = create_train_state(params, tx)
    our_losses = []
    for imgs, eps, t in batches:
        batch = {"image": jnp.asarray(imgs), "eps": jnp.asarray(eps),
                 "t": jnp.asarray(t)}
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
        our_losses.append(float(metrics["loss"]))

    assert int(state.step) == n_steps
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3)
    ours_sd = params_to_torch_state_dict(jax.tree.map(np.asarray, state.params))
    for k, v in ref_net.state_dict().items():
        # Adam normalizes each update to ~lr, so tiny cross-framework grad
        # noise can deflect individual near-zero-grad params by a fraction
        # of lr per step; bound the drift at ~1/4 of one step's update.
        np.testing.assert_allclose(ours_sd[k].numpy(), v.numpy(),
                                   rtol=2e-3, atol=2.5e-4, err_msg=k)


def test_adam_update_matches_torch_given_same_grads():
    """Feed identical gradients to torch Adam(0.5, 0.999) and our optimizer:
    the resulting parameter deltas must match tightly (same algorithm, same
    bias correction, eps=1e-8)."""
    lr = 1e-3
    ref_net, ref_sched, net, sched, params, tx, apply_fn = _setup(lr=lr)

    rng = np.random.default_rng(5)
    grads = jax.tree.map(
        lambda a: jnp.asarray(
            rng.standard_normal(np.shape(a)).astype(np.float32)) * 0.1,
        jax.tree.map(np.asarray, params))

    # torch: copy the same grads in and step twice.
    grads_sd = params_to_torch_state_dict(jax.tree.map(np.asarray, grads))
    optim = torch.optim.Adam(ref_net.parameters(), lr=lr, betas=(0.5, 0.999))
    state = create_train_state(params, tx)
    for _ in range(2):
        optim.zero_grad()
        for k, p in ref_net.named_parameters():
            p.grad = grads_sd[k].clone()
        optim.step()
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        import optax
        state = TrainState(step=state.step + 1,
                           params=optax.apply_updates(state.params, updates),
                           opt_state=new_opt_state)

    ours_sd = params_to_torch_state_dict(jax.tree.map(np.asarray, state.params))
    for k, v in ref_net.state_dict().items():
        np.testing.assert_allclose(ours_sd[k].numpy(), v.numpy(),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_lr_schedule_matches_reference_halving():
    sched = reference_lr_schedule(2e-5, lr_steps=10)
    # Reference: step s uses the lr halved after every earlier step s'>0 with
    # s' % 10 == 0 (train_diffusion.py:368-371).
    lr = 2e-5
    expected = []
    for s in range(35):
        expected.append(lr)
        if s % 10 == 0 and s > 0:
            lr *= 0.5
    got = [float(sched(jnp.asarray(s))) for s in range(35)]
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_data_parallel_step_matches_single_device():
    ref_net, ref_sched, net, sched, params, tx, apply_fn = _setup()
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    eps = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    t = np.arange(1, 9, dtype=np.int32) * 100

    step_fn = make_train_step(apply_fn, sched, tx, objective=Objective.EPS)
    batch = {"image": jnp.asarray(imgs), "eps": jnp.asarray(eps),
             "t": jnp.asarray(t)}
    state = create_train_state(params, tx)
    s1, m1 = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    rep = replicated_sharding(mesh)
    state_r = jax.device_put(create_train_state(params, tx), rep)
    batch_s = shard_batch(batch, mesh)
    s8, m8 = jax.jit(step_fn)(state_r, batch_s, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # Tolerances: the sharded grad all-reduce changes fp32 summation order by
    # a few ulps, and Adam's first-step update amplifies that wherever the
    # gradient is near zero — functional equality, not bitwise.
    l1 = jax.tree.leaves(jax.tree.map(np.asarray, s1.params))
    l8 = jax.tree.leaves(jax.tree.map(np.asarray, s8.params))
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_area_resize_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for out in [(8, 8), (16, 16), (5, 7), (32, 32)]:
        ours = area_resize(jnp.asarray(x), *out)
        theirs = F.interpolate(xt, size=out, mode="area")
        np.testing.assert_allclose(np.asarray(ours),
                                   theirs.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-5, atol=1e-6)
    # Round trip down->up as used by the SR trainer (train_SR_diffusion.py:320-328).
    down_up = area_resize(area_resize(jnp.asarray(x), 8, 8), 16, 16)
    t_down_up = F.interpolate(F.interpolate(xt, size=(8, 8), mode="area"),
                              size=(16, 16), mode="area")
    np.testing.assert_allclose(np.asarray(down_up),
                               t_down_up.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-6)


def test_sr_objective_residual_target():
    cfg = dict(CFG, in_channel=6, image_recon=True)
    ref_net, ref_sched, net, sched, params, tx, apply_fn = _setup(cfg)
    rng = np.random.default_rng(3)
    imgs = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    eps = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([100, 500], dtype=np.int32)
    cond_t = 250

    # Reference math (train_SR_diffusion.py:321-374), fp32.
    xt_torch = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    lr_data = F.interpolate(F.interpolate(xt_torch, size=(8, 8), mode="area"),
                            size=(16, 16), mode="area")
    diff = xt_torch - lr_data
    x_t_sr = ref_sched.forward(xt_torch, torch.from_numpy(t.astype(np.int64)),
                               torch.from_numpy(eps.transpose(0, 3, 1, 2)))
    x_t_lr = ref_sched.forward(lr_data, torch.tensor([cond_t]),
                               torch.from_numpy(eps.transpose(0, 3, 1, 2)))
    pred = ref_net(torch.cat((x_t_sr, x_t_lr), dim=1),
                   torch.from_numpy(t.astype(np.int64)), None)
    loss_ref = F.mse_loss(pred, diff)

    step_fn = jax.jit(make_train_step(
        apply_fn, sched, tx, objective=Objective.RESIDUAL_X0,
        cond_t=cond_t, lr_dim=8))
    state = create_train_state(params, tx)
    batch = {"image": jnp.asarray(imgs), "eps": jnp.asarray(eps),
             "t": jnp.asarray(t)}
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]), float(loss_ref),
                               rtol=1e-4)


def test_flip_augmentation_only_flips_width():
    _, _, net, sched, params, tx, apply_fn = _setup()
    imgs = np.arange(2 * 16 * 16 * 3, dtype=np.float32).reshape(2, 16, 16, 3)
    step_fn = make_train_step(apply_fn, sched, tx, objective=Objective.EPS,
                              flip_imgs=True)
    state = create_train_state(params, tx)
    batch = {"image": jnp.asarray(imgs)}
    # Just exercises the flip path under jit; numerics covered above.
    new_state, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_resumed_state_applies_halved_lr():
    """create_train_state(step=s) seeds the LR-schedule count so a resumed
    run applies the same halved LR it logs/exports (continued-run semantics;
    Adam moments/bias-correction stay fresh like the reference's new Adam on
    resume, train_diffusion.py:214-227)."""
    import optax
    lr, L = 1e-2, 10
    tx = make_optimizer(lr, L)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}

    fresh = create_train_state(params, tx, step=0)
    resumed = create_train_state(params, tx, step=25)  # 2 halvings passed

    up_fresh, _ = tx.update(grads, fresh.opt_state, fresh.params)
    up_resumed, _ = tx.update(grads, resumed.opt_state, resumed.params)
    # First Adam update magnitude ~= applied lr (|g| >> eps).
    ratio = float(jnp.abs(up_resumed["w"][0]) / jnp.abs(up_fresh["w"][0]))
    np.testing.assert_allclose(ratio, 0.25, rtol=1e-4)
    # And it matches what the loop logs for step 25.
    expected = lr * 0.5 ** max(0, (25 - 1) // L)
    np.testing.assert_allclose(float(jnp.abs(up_resumed["w"][0])), expected,
                               rtol=1e-3)


def test_uint8_batch_equals_fp32_batch():
    """Raw-uint8 batches (device-side normalization) must give the exact
    same loss as host-normalized fp32 batches."""
    _, _, net, sched, params, tx, apply_fn = _setup()
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    f32 = (u8.astype(np.float32) - 127.5) / 127.5
    eps = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([10, 500], dtype=np.int32)

    step_fn = jax.jit(make_train_step(apply_fn, sched, tx,
                                      objective=Objective.EPS))
    state = create_train_state(params, tx)
    _, m_u8 = step_fn(state, {"image": jnp.asarray(u8),
                              "eps": jnp.asarray(eps), "t": jnp.asarray(t)},
                      jax.random.PRNGKey(0))
    state = create_train_state(params, tx)
    _, m_f32 = step_fn(state, {"image": jnp.asarray(f32),
                               "eps": jnp.asarray(eps), "t": jnp.asarray(t)},
                       jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m_u8["loss"]), float(m_f32["loss"]),
                               rtol=1e-6)


def test_grad_accum_matches_full_batch_step():
    """grad_accum_steps=2 with the batch pre-split into (2, N/2, ...) must
    produce the same loss and post-Adam params as one full-batch step (same
    injected t/eps; MSE mean of equal-size means == full mean)."""
    _, _, net, sched, params, tx, apply_fn = _setup()
    rng = np.random.default_rng(7)
    imgs = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    eps = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    t = np.array([3, 400, 999, 57], dtype=np.int64)

    def run(accum):
        step = make_train_step(apply_fn, sched, tx, objective=Objective.EPS,
                               grad_accum_steps=accum)
        state = create_train_state(jax.tree.map(jnp.asarray, params), tx)
        batch = {"image": jnp.asarray(imgs), "t": jnp.asarray(t),
                 "eps": jnp.asarray(eps)}
        if accum > 1:
            batch = {k: v.reshape((accum, v.shape[0] // accum) + v.shape[1:])
                     for k, v in batch.items()}
        new_state, m = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
        return float(m["loss"]), new_state.params

    loss1, p1 = run(1)
    loss2, p2 = run(2)
    np.testing.assert_allclose(loss2, loss1, rtol=1e-6)
    # Adam's m/sqrt(v) normalizer amplifies fp-reassociation noise in tiny
    # grads; 1e-5 abs is ~1% of a single lr=1e-3 update.
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-5)


def test_remat_unet_matches_plain_forward_and_grads():
    """remat=True is a pure memory/flops tradeoff: outputs and grads equal,
    parameter tree identical (checkpoint compatibility)."""
    cfg = dict(CFG, attn_layers=tuple(CFG["attn_layers"]))
    net = UNet(**cfg)
    net_r = UNet(**cfg, remat=True)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    t = jnp.array([5, 900])
    params = net.init(jax.random.PRNGKey(0), x, t)["params"]
    assert (jax.tree.structure(params) ==
            jax.tree.structure(net_r.init(jax.random.PRNGKey(0), x, t)["params"]))

    def loss(n, p):
        return jnp.mean(n.apply({"params": p}, x, t) ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(net, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(net_r, p))(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-7)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_grad_clip_norm_scales_large_gradients():
    """grad_clip_norm (TPU-build extension, default off): the update equals
    plain Adam fed the gradient rescaled to the clip norm when its global
    norm exceeds the threshold, and is untouched below it."""
    _, _, _, sched, params, tx, apply_fn = _setup()
    params = jax.tree.map(jnp.asarray, params)
    rng = np.random.default_rng(3)
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((4, 8, 8, 3)).astype(np.float32)),
        "t": jnp.asarray([2, 400, 700, 990], dtype=jnp.int32),
        "eps": jnp.asarray(
            rng.standard_normal((4, 8, 8, 3)).astype(np.float32)),
    }
    key = jax.random.PRNGKey(0)

    def run(clip):
        step = make_train_step(apply_fn, sched, tx, objective=Objective.EPS,
                               flip_imgs=False, grad_clip_norm=clip)
        state, m = jax.jit(step)(create_train_state(params, tx), batch, key)
        return state, m

    # Reference gradient norm of this setup.
    import optax
    from sdm_tpu.train.step import make_train_step as _mts  # noqa: F401
    loss_fn = lambda p: jnp.mean(jnp.square(
        apply_fn(p, sched.q_sample(batch["image"], batch["t"], batch["eps"]),
                 batch["t"], None).astype(jnp.float32) - batch["eps"]))
    grads = jax.jit(jax.grad(loss_fn))(params)
    gnorm = float(optax.global_norm(grads))
    assert gnorm > 0

    # A clip ABOVE the actual norm is a no-op: bit-identical params.
    s_plain, _ = run(None)
    s_loose, _ = run(gnorm * 10.0)
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_loose.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # A clip BELOW the norm equals Adam fed grads * (clip / gnorm).
    clip = gnorm / 4.0
    s_tight, _ = run(clip)
    scaled = jax.tree.map(lambda g: g * (clip / gnorm), grads)
    updates, _ = tx.update(scaled, tx.init(params), params)
    expected = optax.apply_updates(params, updates)
    for a, b in zip(jax.tree.leaves(s_tight.params),
                    jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-6)
    # And clipping visibly changed the step vs the unclipped baseline.
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree.leaves(s_tight.params),
                             jax.tree.leaves(s_plain.params))]
    assert max(diffs) > 1e-4
