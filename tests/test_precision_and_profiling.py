"""bf16-vs-fp32 sampling sanity + profiler trace smoke."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import torch

from sdm_tpu.models import UNet
from sdm_tpu.ops.schedules import LinearSchedule
from sdm_tpu.diffusion.samplers import ddim_sample
from sdm_tpu.io.torch_interop import torch_state_dict_to_params
from tests.reference_loader import load_reference

REF = load_reference()

CFG = dict(num_resnet_blocks=1, in_channel=3, out_channel=3, time_dim=16,
           cond_dim=None, num_layers=2, attn_layers=[1], num_heads=1,
           dim_per_head=None, groups=32, min_channel=32, max_channel=64,
           image_recon=False)


def test_bf16_sampling_close_to_fp32():
    """The bf16 compute default must produce samples close to fp32 on the
    same weights — guards against precision-policy regressions (e.g. stats
    accidentally computed in bf16)."""
    torch.manual_seed(0)
    ref_net = REF.U_Net(**CFG)
    params = torch_state_dict_to_params(ref_net.state_dict())
    jcfg = dict(CFG, attn_layers=tuple(CFG["attn_layers"]))
    net32 = UNet(**jcfg)
    net16 = UNet(**jcfg, dtype=jnp.bfloat16)
    sched = LinearSchedule.create(5e-3, 9e-3, 1000)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))

    def run(net):
        mf = lambda xx, tt, ll: net.apply({"params": params}, xx, tt, ll)
        return np.asarray(ddim_sample(mf, sched, x, min_noise=1, max_noise=30,
                                      ddim_step_size=10))

    out32, out16 = run(net32), run(net16)
    # Correlated and close in absolute terms (bf16 has ~3 decimal digits).
    denom = np.abs(out32).max()
    assert denom > 0
    rel_err = np.abs(out16 - out32).max() / denom
    assert rel_err < 0.12, rel_err
    corr = np.corrcoef(out16.ravel(), out32.ravel())[0, 1]
    assert corr > 0.995, corr


def test_profiler_trace_smoke(tmp_path):
    from sdm_tpu.utils.profiling import trace, StepTimer
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        _ = jnp.sum(jnp.ones((64, 64)) * 2.0)
    # jax.profiler writes a plugins/profile tree under the logdir.
    found = []
    for root, dirs, files in os.walk(logdir):
        found.extend(files)
    assert found, "no trace files written"

    timer = StepTimer(window=4)
    import time
    for _ in range(3):
        timer.tick()
        time.sleep(0.01)
    assert timer.steps_per_sec() > 0

    with trace(None):  # no-op path
        pass
