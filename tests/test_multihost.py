"""Multi-host data parallelism: two real processes (gloo over localhost),
2 virtual CPU devices each -> a 4-device global "data" mesh. Validates the
scale-out path the reference lacks entirely (SURVEY.md §2.10): per-process
dataset sharding, global-batch assembly, SPMD train steps with psum'd grads,
and process-0-only checkpointing — asserting the replicated parameters end
up bit-identical on both processes."""

import os
import glob
import json
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = textwrap.dedent("""
    import json, os, sys
    import numpy as np
    sys.path.insert(0, os.environ["SDM_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    from sdm_tpu.train.loop import run_training, BASE_SPEC

    cfg = json.load(open(sys.argv[1]))
    res = run_training(BASE_SPEC, cfg, max_steps=2)
    params = res["state"].params
    leaves = jax.tree.leaves(params)
    if any(not x.is_fully_replicated for x in leaves):
        # FSDP run: report the sharded footprint, then all-gather back to
        # the replicated layout (same collective the checkpoint path runs)
        # so the host can read every leaf.
        from jax.sharding import NamedSharding, PartitionSpec as P
        from sdm_tpu.parallel.fsdp import state_bytes_per_device
        total_b = sum(x.nbytes for x in leaves)
        print(f"SHARDFRAC {state_bytes_per_device(params) / total_b:.4f}")
        mesh = leaves[0].sharding.mesh
        rep = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
        params = jax.jit(lambda t: t, out_shardings=rep)(params)
    leaves = jax.tree.leaves(jax.tree.map(np.asarray, params))
    total = float(sum(np.float64(np.sum(np.asarray(x, np.float64)))
                      for x in leaves))
    print(f"PARAMSUM {total:.10e}")
    print(f"LOSS {res['last_loss']:.8e}")
    print(f"STEPS {res['global_steps']}")
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _base_cfg(tmp_path):
    import cv2
    rng = np.random.default_rng(0)
    if not (tmp_path / "imgs").exists():
        (tmp_path / "imgs").mkdir()
        for i in range(8):
            cv2.imwrite(str(tmp_path / "imgs" / f"im_{i}.png"),
                        rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    return dict(
        dataset_path=str(tmp_path / "imgs" / "*.png"),
        use_conditional=False, cond_dim=None,
        out_dir=str(tmp_path / "out"),
        # big checkpoint_steps: skip mid-run previews (no sampler compile);
        # the end-of-epoch checkpoint still exercises process-0 saving.
        checkpoint_steps=1000, lr_steps=100, max_epoch=1, plot_img_count=2,
        flip_imgs=False, model_checkpoint=None, load_diffusion_optim=False,
        config_checkpoint=None, diffusion_lr=1e-4, batch_size=4,  # global
        noise_scheduler="LINEAR", beta1=5e-3, betaT=9e-3,
        diffusion_alg="DDIM", skip_step=5, min_noise_step=1,
        max_noise_step=10, max_actual_noise_step=10,
        in_channel=3, out_channel=3, num_layers=1, num_resnet_block=1,
        attn_layers=[0], attn_heads=1, attn_dim_per_head=None,
        time_dim=8, min_channel=32, max_channel=32, img_recon=False,
        compute_dtype="float32", seed=0,
    )


def _run_two_procs(tmp_path, cfg):
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            SDM_REPO=REPO,
            SDM_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            SDM_NUM_PROCESSES="2",
            SDM_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(driver), str(cfg_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO))

    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"proc failed:\n{out}\n{err[-3000:]}"
        outs.append(out)
    return outs


def _grab(out, key):
    return [l.split()[1] for l in out.splitlines() if l.startswith(key)][0]


def _assert_common(tmp_path, outs):
    sums = [_grab(o, "PARAMSUM") for o in outs]
    assert sums[0] == sums[1], f"replicated params diverged: {sums}"
    assert all(np.isfinite(float(_grab(o, "LOSS"))) for o in outs)
    assert all(_grab(o, "STEPS") == "2" for o in outs)
    # Process 0 wrote reference-format checkpoints; process 1 wrote nothing.
    assert glob.glob(str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt"))


def test_two_process_training(tmp_path):
    outs = _run_two_procs(tmp_path, _base_cfg(tmp_path))
    _assert_common(tmp_path, outs)
    assert "SHARDFRAC" not in outs[0]


def test_two_process_fsdp_training(tmp_path):
    # FSDP over a cross-host 4-device mesh: the checkpoint path must
    # all-gather the sharded state before process-0 I/O (train/loop.py
    # submit_checkpoint). fsdp_min_size is lowered so the tiny test model's
    # leaves actually shard.
    cfg = _base_cfg(tmp_path)
    cfg.update(fsdp=True, fsdp_min_size=1024)
    outs = _run_two_procs(tmp_path, cfg)
    _assert_common(tmp_path, outs)
    # The state really was sharded (per-device footprint well under the
    # whole-state bytes), on both processes.
    fracs = [float(_grab(o, "SHARDFRAC")) for o in outs]
    assert all(f < 0.7 for f in fracs), fracs
    # The checkpoint process 0 wrote is a complete, reference-format state.
    import torch
    pt = sorted(glob.glob(
        str(tmp_path / "out" / "checkpoint" / "diffusion_*.pt")))[-1]
    sd = torch.load(pt, map_location="cpu", weights_only=False)
    assert "model" in sd and all(
        np.isfinite(v.numpy()).all() for v in sd["model"].values())


def test_two_process_sp_training(tmp_path):
    # sp x multihost (VERDICT r3 item 3): global mesh (data=2, space=2),
    # each host's 2 devices holding the H/2 slabs of its own batch rows.
    # Replicated params must still end up bit-identical across processes.
    cfg = _base_cfg(tmp_path)
    cfg.update(sp=2)
    outs = _run_two_procs(tmp_path, cfg)
    _assert_common(tmp_path, outs)


def test_two_process_tp_training(tmp_path):
    # tp x multihost: global mesh (data=2, model=2), wide kernels channel-
    # sharded within each host; checkpoint path all-gathers before I/O.
    cfg = _base_cfg(tmp_path)
    cfg.update(tp=2, tp_min_width=32)
    outs = _run_two_procs(tmp_path, cfg)
    _assert_common(tmp_path, outs)
