"""IO + data layer: optimizer interop, checkpoint roundtrips (reference can
resume from our files), TinyDB-JSON datasets, loader, plot grid."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch

from sdm_tpu.models import UNet
from sdm_tpu.train import make_optimizer, create_train_state, TrainState
from sdm_tpu.io.torch_interop import (
    torch_state_dict_to_params, torch_param_order,
    optax_adam_to_torch, torch_adam_to_optax)
from sdm_tpu.io.checkpoint import (
    save_model, load_checkpoint, diffusion_checkpoint_dict,
    load_params_from_checkpoint, load_optimizer_from_checkpoint)
from sdm_tpu.io.plotting import make_grid, plot_sampled_images
from sdm_tpu.data.tinydb_compat import read_tables, write_tables
from sdm_tpu.data.datasets import (
    ImageDataset, ConditionalImgDataset, DoodleImgDataset)
from sdm_tpu.data.loader import DataLoader
from tests.reference_loader import load_reference

REF = load_reference()

CFG = dict(
    num_resnet_blocks=1, in_channel=3, out_channel=3, time_dim=16,
    cond_dim=None, num_layers=2, attn_layers=[1], num_heads=1,
    dim_per_head=None, groups=32, min_channel=32, max_channel=64,
    image_recon=False,
)


def test_torch_param_order_matches_reference():
    torch.manual_seed(0)
    ref_net = REF.U_Net(**CFG)
    ref_order = [k for k, _ in ref_net.named_parameters()]
    params = torch_state_dict_to_params(ref_net.state_dict())
    ours = torch_param_order(params)

    def to_torch_key(path):
        import re
        parts = []
        for comp in path[:-1]:
            m = re.match(r"^(.*)_(\d+)$", comp)
            if m and m.group(1) in {"in_layer", "down_layers", "middle_layer",
                                    "up_layers", "out_layers", "res_layers",
                                    "attn_layers", "conv_layer", "time_layer",
                                    "cond_layer"}:
                parts.extend([m.group(1), m.group(2)])
            else:
                parts.append(comp)
        leaf = {"kernel": "weight", "scale": "weight", "bias": "bias"}[path[-1]]
        return ".".join(parts + [leaf])

    assert [to_torch_key(p) for p in ours] == ref_order


def test_adam_state_roundtrip_through_torch():
    """Train 3 steps -> export optimizer to torch format -> import back ->
    continue; must equal continuing without the roundtrip."""
    torch.manual_seed(0)
    ref_net = REF.U_Net(**CFG)
    params = jax.tree.map(jnp.asarray,
                          torch_state_dict_to_params(ref_net.state_dict()))
    tx = make_optimizer(1e-3, 100)
    state = create_train_state(params, tx)

    rng = np.random.default_rng(0)
    grads = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(np.shape(a)).astype(np.float32)),
        params)
    for _ in range(3):
        up, no = tx.update(grads, state.opt_state, state.params)
        state = TrainState(state.step + 1, optax.apply_updates(state.params, up), no)

    torch_opt_sd = optax_adam_to_torch(state.opt_state,
                                       jax.tree.map(np.asarray, state.params),
                                       lr=1e-3)
    restored = torch_adam_to_optax(torch_opt_sd,
                                   jax.tree.map(np.asarray, state.params),
                                   tx.init(state.params))

    up_a, _ = tx.update(grads, state.opt_state, state.params)
    up_b, _ = tx.update(grads, restored, state.params)
    for a, b in zip(jax.tree.leaves(up_a), jax.tree.leaves(up_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_reference_torch_adam_accepts_our_optimizer_export():
    torch.manual_seed(0)
    ref_net = REF.U_Net(**CFG)
    params = jax.tree.map(jnp.asarray,
                          torch_state_dict_to_params(ref_net.state_dict()))
    tx = make_optimizer(2e-5, 1000)
    state = create_train_state(params, tx)
    grads = jax.tree.map(lambda a: jnp.ones_like(a) * 0.01, params)
    up, no = tx.update(grads, state.opt_state, state.params)
    state = TrainState(state.step + 1, optax.apply_updates(state.params, up), no)

    ckpt = diffusion_checkpoint_dict(state.params, state.opt_state, lr=2e-5)
    optim = torch.optim.Adam(ref_net.parameters(), lr=2e-5, betas=(0.5, 0.999))
    optim.load_state_dict(ckpt["optimizer"])  # raises on structure mismatch
    ref_net.load_state_dict(ckpt["model"])    # strict


def test_checkpoint_save_load_roundtrip(tmp_path):
    torch.manual_seed(0)
    ref_net = REF.U_Net(**CFG)
    params = torch_state_dict_to_params(ref_net.state_dict())
    tx = make_optimizer(1e-3, 100)
    state = create_train_state(jax.tree.map(jnp.asarray, params), tx)

    ckpt = diffusion_checkpoint_dict(state.params, state.opt_state, lr=1e-3)
    ok = save_model(ckpt, "diffusion", str(tmp_path), checkpoint=True, steps=42)
    assert ok
    path = os.path.join(str(tmp_path), "checkpoint", "diffusion_42.pt")
    ok, loaded = load_checkpoint(path, log=lambda *a, **k: None)
    assert ok

    net = UNet(**dict(CFG, attn_layers=tuple(CFG["attn_layers"])))
    own = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                   jnp.array([1]))["params"]
    merged = load_params_from_checkpoint(loaded, own, log=lambda *a, **k: None)
    for a, b in zip(jax.tree.leaves(merged),
                    jax.tree.leaves(jax.tree.map(np.asarray, dict(params)))):
        np.testing.assert_allclose(a, b, rtol=1e-6)

    restored_opt = load_optimizer_from_checkpoint(loaded, merged,
                                                  tx.init(state.params))
    assert restored_opt is not None

    # Config checkpoint roundtrip (train_diffusion.py:375-381).
    cfg_state = {"starting_epoch": 3, "global_steps": 42,
                 "beta_1": 5e-3, "beta_T": 9e-3}
    save_model(cfg_state, "config", str(tmp_path), checkpoint=True, steps=42)
    ok, loaded_cfg = load_checkpoint(
        os.path.join(str(tmp_path), "checkpoint", "config_42.pt"),
        log=lambda *a, **k: None)
    assert ok and loaded_cfg == cfg_state


def _write_png(path, rgb_uint8):
    import cv2
    cv2.imwrite(str(path), rgb_uint8[..., ::-1])


def test_datasets_and_loader(tmp_path):
    import cv2
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(7):
        arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        p = img_dir / f"img_{i}.png"
        cv2.imwrite(str(p), arr)
        paths.append(str(p))

    ds = ImageDataset(paths)
    assert len(ds) == 7
    sample = ds[0]["image"]
    assert sample.shape == (8, 8, 3)
    assert sample.min() >= -1.0 and sample.max() <= 1.0
    raw = cv2.imread(paths[0]).astype(np.float32)
    np.testing.assert_allclose(sample, (raw - 127.5) / 127.5, rtol=1e-6)

    # TinyDB-backed conditional dataset.
    db_path = tmp_path / "cond.json"
    write_tables(str(db_path), {
        "Data": [{"filename": p, "smiling": float(i % 2), "male": 0.5}
                 for i, p in enumerate(paths)],
        "Labels": [{"labels": ["smiling", "male"]}],
    })
    cds = ConditionalImgDataset(str(db_path), seed=0)
    assert cds.get_labels() == ["smiling", "male"]
    s = cds[0]
    assert s["image"].shape == (8, 8, 3) and s["labels"].shape == (2,)

    # Doodle dataset: cond image path under first label name.
    db2 = tmp_path / "doodle.json"
    write_tables(str(db2), {
        "Data": [{"filename": p, "doodle": paths[(i + 1) % 7]}
                 for i, p in enumerate(paths)],
        "Labels": [{"labels": ["doodle"]}],
    })
    dds = DoodleImgDataset(str(db2), seed=0)
    s = dds[0]
    assert s["image"].shape == (8, 8, 3) and s["cond_img"].shape == (8, 8, 3)

    # Loader: static shapes, drop_last, full coverage when exact.
    loader = DataLoader(ds, batch_size=3, shuffle=True, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 2  # 7 // 3, last partial dropped
    for b in batches:
        assert b["image"].shape == (3, 8, 8, 3)

    loader2 = DataLoader(cds, batch_size=7, shuffle=False, num_workers=2)
    (b,) = list(loader2)
    assert b["image"].shape == (7, 8, 8, 3) and b["labels"].shape == (7, 2)


def test_plot_grid(tmp_path):
    imgs = np.zeros((7, 8, 8, 3), dtype=np.float32)
    imgs[..., 0] = 1.0  # blue channel (BGR) saturated
    grid = make_grid(imgs, nrow=5, padding=2, value_range=(-1, 1))
    assert grid.shape == (2 * 8 + 3 * 2, 5 * 8 + 6 * 2, 3)
    assert grid.max() <= 1.0 and grid.min() >= 0.0
    path = plot_sampled_images(imgs, "test_plot", str(tmp_path),
                               log=lambda *a, **k: None)
    assert path is not None and os.path.exists(path)


def test_decode_cache_equivalence_and_hit(tmp_path):
    import cv2
    rng = np.random.default_rng(9)
    p = str(tmp_path / "img.png")
    cv2.imwrite(p, rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    cold = ImageDataset([p])
    warm = ImageDataset([p], cache_decoded=True)
    np.testing.assert_array_equal(cold[0]["image"], warm[0]["image"])
    # Second read comes from cache: delete the file, must still work.
    os.remove(p)
    np.testing.assert_array_equal(cold[0]["image"]
                                  if False else warm[0]["image"],
                                  warm[0]["image"])
