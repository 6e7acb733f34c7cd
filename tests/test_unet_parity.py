"""Golden parity: sdm_tpu UNet vs the reference torch U_Net, weights converted.

Builds the actual reference model (imported from /root/reference), converts its
state_dict with sdm_tpu.io.torch_interop, and asserts the two forwards agree on
the same inputs — pinning layout transposes, all quirk reproductions (AdaGN
scale-as-shift, query-axis softmax, dead weights) and the NCHW<->NHWC boundary.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from sdm_tpu.models import UNet
from sdm_tpu.io.torch_interop import (
    torch_state_dict_to_params,
    params_to_torch_state_dict,
    merge_partial_params,
)
from tests.reference_loader import load_reference

REF = load_reference()

SMALL = dict(
    num_resnet_blocks=2,
    in_channel=3,
    out_channel=3,
    time_dim=16,
    cond_dim=None,
    num_layers=2,
    attn_layers=[1],
    num_heads=1,
    dim_per_head=None,
    groups=32,
    min_channel=32,
    max_channel=64,
    image_recon=False,
)


def _run_pair(cfg, x, t, cond=None, labels_t=None):
    torch.manual_seed(0)
    ref_net = REF.U_Net(**cfg)
    ref_net.eval()
    with torch.no_grad():
        ref_out = ref_net(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t) if t is not None else None,
            labels_t)

    jcfg = dict(cfg)
    jcfg["attn_layers"] = tuple(jcfg["attn_layers"])
    net = UNet(**jcfg)
    params = torch_state_dict_to_params(ref_net.state_dict())
    our_out = net.apply(
        {"params": params}, jnp.asarray(x),
        jnp.asarray(t) if t is not None else None,
        jnp.asarray(cond) if cond is not None else None)
    return np.asarray(our_out), ref_out.numpy().transpose(0, 2, 3, 1), ref_net, net, params


def test_unet_forward_parity_unconditional():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([977, 3], dtype=np.int64)
    ours, theirs, *_ = _run_pair(SMALL, x, t)
    assert ours.shape == theirs.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


def test_unet_forward_parity_conditional_and_recon():
    cfg = dict(SMALL, cond_dim=5, image_recon=True)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([500, 10], dtype=np.int64)
    cond = rng.standard_normal((2, 5)).astype(np.float32)
    ours, theirs, *_ = _run_pair(cfg, x, t, cond=cond,
                                 labels_t=torch.from_numpy(cond))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)
    assert np.abs(ours).max() <= 1.0  # tanh output head


def test_param_tree_structure_matches_torch():
    """Every torch param (incl. dead AdaGN.y_shift / Attention.norm) has a
    converted twin, and our init tree has the exact same leaves."""
    torch.manual_seed(0)
    ref_net = REF.U_Net(**SMALL)
    converted = torch_state_dict_to_params(ref_net.state_dict())

    net = UNet(**{**SMALL, "attn_layers": tuple(SMALL["attn_layers"])})
    ours = net.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 16, 16, 3)),
                    jnp.array([1]))["params"]

    def leaves(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(leaves(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = np.shape(v)
        return out

    ours_l = leaves(jax.tree.map(np.asarray, dict(ours)))
    conv_l = leaves(converted)
    assert ours_l == conv_l
    # Dead weights present (custom_layers.py:31, :113).
    assert any("y_shift" in p for path in conv_l for p in path)
    assert any("norm" == p for path in conv_l for p in path)


def test_roundtrip_and_reference_loads_our_checkpoint():
    """flax -> torch state_dict roundtrips numerically AND loads cleanly into
    a fresh reference model (strict load)."""
    torch.manual_seed(0)
    ref_net = REF.U_Net(**SMALL)
    params = torch_state_dict_to_params(ref_net.state_dict())
    back = params_to_torch_state_dict(params)
    ref2 = REF.U_Net(**SMALL)
    ref2.load_state_dict(back)  # strict=True raises on any mismatch
    for k, v in ref_net.state_dict().items():
        np.testing.assert_allclose(back[k].numpy(), v.numpy(), rtol=1e-6)


def test_merge_partial_params_skips_mismatches():
    torch.manual_seed(0)
    ref_net = REF.U_Net(**SMALL)
    converted = torch_state_dict_to_params(ref_net.state_dict())
    # Perturb: wrong shape for one leaf + an unknown key.
    converted["in_layer_0"]["conv_layer_0"]["kernel"] = np.zeros((1, 1, 1, 1), np.float32)
    converted["bogus_layer"] = {"kernel": np.zeros((2, 2), np.float32)}

    net = UNet(**{**SMALL, "attn_layers": tuple(SMALL["attn_layers"])})
    own = jax.tree.map(np.asarray,
                       dict(net.init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 16, 16, 3)),
                                     jnp.array([1]))["params"]))
    msgs = []
    merged = merge_partial_params(own, converted, log=msgs.append)
    assert any("Skipped" in m for m in msgs)
    assert any("No Layer found" in m for m in msgs)
    # Mismatched leaf kept the model's own value.
    np.testing.assert_array_equal(
        merged["in_layer_0"]["conv_layer_0"]["kernel"],
        own["in_layer_0"]["conv_layer_0"]["kernel"])
    # A matching leaf took the loaded value.
    np.testing.assert_array_equal(
        merged["middle_layer_0"]["conv_layer_0"]["kernel"],
        converted["middle_layer_0"]["conv_layer_0"]["kernel"])


def test_unet_forward_parity_multihead_attention():
    """heads>1 + explicit dim_per_head exercises the qkv reshape/split and
    output-projection paths that the default (heads=1, d_k=channels) never
    touches (custom_layers.py:116-153)."""
    cfg = dict(SMALL, num_heads=4, dim_per_head=16, num_resnet_blocks=1)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([250, 750], dtype=np.int64)
    ours, theirs, *_ = _run_pair(cfg, x, t)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


def test_unet_forward_parity_deeper_resnet():
    cfg = dict(SMALL, num_resnet_blocks=3, num_layers=1, attn_layers=[0])
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    t = np.array([42], dtype=np.int64)
    ours, theirs, *_ = _run_pair(cfg, x, t)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)
