"""Guard the driver contract: entry() stays jittable (lowering check — full
compile of the flagship is exercised on TPU by bench.py) and
dryrun_multichip runs a real sharded train step on a small CPU mesh."""

import jax

import __graft_entry__ as ge


def test_entry_lowers():
    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
    # Output shape matches input image shape.
    out_info = jax.eval_shape(fn, *args)
    assert out_info.shape == args[1].shape


def test_dryrun_multichip_two_devices():
    assert len(jax.devices()) >= 2
    ge.dryrun_multichip(2)


def test_dryrun_multichip_subprocess_16_devices():
    # 16 > the 8 virtual devices of this test env, so this exercises the
    # driver-facing path: re-exec on a virtual 16-device CPU mesh in a
    # subprocess (dp8 x tp2). This is exactly what the driver hits on the
    # 1-chip TPU host.
    assert len(jax.devices()) < 16
    ge.dryrun_multichip(16)
