"""Fuzz the torch<->flax checkpoint converter over random architectures.

Samples the U_Net constructor space (num_layers x attn_layers x heads x
resnet blocks x cond_dim x image_recon, U_Net.py:11-25), and for each config
asserts (a) the converted param tree is leaf-identical to our init tree,
(b) forward parity with the reference on the same input, and (c) the
flax->torch roundtrip strict-loads into a fresh reference model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from sdm_tpu.models import UNet
from sdm_tpu.io.torch_interop import (
    torch_state_dict_to_params, params_to_torch_state_dict)
from tests.reference_loader import load_reference

REF = load_reference()


def _random_config(rng: np.random.Generator) -> dict:
    num_layers = int(rng.integers(1, 4))
    # attn_layers must be valid layer indices (U_Net.py:29-38); allow empty.
    attn_pool = list(range(num_layers))
    k = int(rng.integers(0, num_layers + 1))
    attn_layers = sorted(rng.choice(attn_pool, size=k, replace=False).tolist())
    num_heads = int(rng.choice([1, 2, 4]))
    dim_per_head = int(rng.choice([8, 16])) if rng.random() < 0.5 else None
    return dict(
        num_resnet_blocks=int(rng.integers(1, 3)),
        in_channel=3,
        out_channel=3,
        time_dim=16,
        cond_dim=int(rng.integers(1, 6)) if rng.random() < 0.5 else None,
        num_layers=num_layers,
        attn_layers=[int(a) for a in attn_layers],
        num_heads=num_heads,
        dim_per_head=dim_per_head,
        groups=32,
        min_channel=32,
        max_channel=int(rng.choice([32, 64])),
        image_recon=bool(rng.random() < 0.5),
    )


def _leaves(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_leaves(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.shape(v)
    return out


@pytest.mark.parametrize("seed", range(6))
def test_converter_fuzz(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = _random_config(rng)

    torch.manual_seed(seed)
    ref_net = REF.U_Net(**cfg)
    ref_net.eval()
    params = torch_state_dict_to_params(ref_net.state_dict())

    jcfg = dict(cfg, attn_layers=tuple(cfg["attn_layers"]))
    net = UNet(**jcfg)

    # (a) tree structure identical to our own init.
    init_cond = (jnp.zeros((1, cfg["cond_dim"]), jnp.float32)
                 if cfg["cond_dim"] is not None else None)
    side = 8 * 2 ** (cfg["num_layers"] - 1)   # keep >=8x8 at the bottleneck
    own = net.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, side, side, 3)), jnp.array([1]),
                   init_cond)["params"]
    assert _leaves(jax.tree.map(np.asarray, dict(own))) == _leaves(params)

    # (b) forward parity on the same random input.
    x = rng.standard_normal((2, side, side, 3)).astype(np.float32)
    t = np.asarray(rng.integers(1, 1000, size=2))
    cond = (rng.standard_normal((2, cfg["cond_dim"])).astype(np.float32)
            if cfg["cond_dim"] is not None else None)
    with torch.no_grad():
        theirs = ref_net(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t),
            torch.from_numpy(cond) if cond is not None else None
        ).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(net.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(cond) if cond is not None else None))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=3e-4,
                               err_msg=f"config={cfg}")

    # (c) roundtrip strict-loads into a fresh reference model.
    back = params_to_torch_state_dict(params)
    ref2 = REF.U_Net(**cfg)
    ref2.load_state_dict(back)  # strict=True
