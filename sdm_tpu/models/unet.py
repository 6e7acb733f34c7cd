"""Conditional diffusion U-Net (flax.linen, NHWC).

Capability parity with /root/reference/models/U_Net.py:10-173, rebuilt
TPU-first: NHWC everywhere so the 3x3 convs land on the MXU in their natural
layout, fp32 params with an optional bf16 compute dtype, and skip connections
concatenated on the channel (last) axis.

Topology (matching U_Net.py):
  * channel schedule: start min_channel, double per layer, clamp to
    max_channel (U_Net.py:41-46);
  * in_layer: 2 plain conv blocks (:55-66);
  * down path: num_layers UNetBlocks (DOWN), attention on layers listed in
    attn_layers (:69-82); skip outputs captured AFTER each down block (:158-160);
  * middle: 2 plain conv blocks (:85-95);
  * up path: reversed UNetBlocks (UP) consuming channel-concatenated skips
    (:98-111, :166-168);
  * out: conv+Swish, conv (no activation), optional Tanh when image_recon
    (:113-130).

Conditioning: `t` (+ optional `cond` vector) -> ConditionalEmbedding -> AdaGN
FiLM in every ResidualBlock. Conditional *images* are channel-concatenated by
callers (doodle/SR pipelines), which simply widen in_channel.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from sdm_tpu.enums import UNetBlockType
from sdm_tpu.models.layers import (
    ConditionalEmbedding,
    UNetBlock,
    UNetConvBlock,
)

Dtype = Any


class UNet(nn.Module):
    """Denoiser U-Net. Constructor surface mirrors U_Net.py:11-25."""

    num_resnet_blocks: int = 5
    in_channel: int = 3
    out_channel: int = 3
    time_dim: Optional[int] = 64
    cond_dim: Optional[int] = None
    num_layers: int = 5
    attn_layers: Sequence[int] = (2, 3, 4)
    num_heads: int = 1
    dim_per_head: Optional[int] = None
    groups: int = 32
    min_channel: int = 128
    max_channel: int = 512
    image_recon: bool = False
    # TPU-build extensions (not in the reference constructor):
    parity: bool = True          # reproduce reference quirks bit-for-bit
    use_pallas: Any = "auto"     # Pallas kernels: False=never (pure XLA
    #                              parity path), True=prefer fused kernels,
    #                              "auto"=XLA for small grids, streaming
    #                              attention for S>=2048 token grids where
    #                              XLA's S^2 score tensor OOMs (256^2 SR)
    remat: bool = False          # jax.checkpoint each U-Net block: trade
    #                              ~1/3 more FLOPs for O(depth) less HBM held
    #                              across the backward pass (bigger batches /
    #                              resolutions per chip); numerics unchanged
    dtype: Optional[Dtype] = None  # compute dtype (e.g. jnp.bfloat16)
    param_dtype: Dtype = jnp.float32

    def __post_init__(self):
        super().__post_init__()
        # Validation parity with U_Net.py:29-38.
        if not isinstance(self.num_layers, int) or not isinstance(
                self.attn_layers, (list, tuple)):
            raise TypeError("Invalid type!")
        if self.num_layers < 1:
            raise ValueError("Invalid num layer value!")
        for attn_layer in self.attn_layers:
            if not isinstance(attn_layer, int):
                raise ValueError("Invalid type in attention layer!")
            if attn_layer < 0 or attn_layer >= self.num_layers:
                raise ValueError("Invalid Attention Layer values!")

    def channel_schedule(self) -> list:
        channel_layers = [self.min_channel]
        channel = self.min_channel
        for _ in range(self.num_layers):
            channel = channel * 2
            channel_layers.append(
                self.max_channel if channel > self.max_channel else channel)
        return channel_layers

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: Optional[jnp.ndarray] = None,
                 cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        channel_layers = self.channel_schedule()
        common = dict(groups=self.groups, parity=self.parity,
                      use_pallas=self.use_pallas, dtype=self.dtype,
                      param_dtype=self.param_dtype)
        # Lifted remat preserves module naming, so checkpoints are identical
        # with or without it. The in/middle/out conv stacks are rematted too:
        # at 256^2 batch 128 each un-rematted conv+Swish in the full-res
        # stacks holds a 2.1 GB pre-activation across the backward — extending
        # remat there is what fits the 256^2 SR flagship at batch 64/chip
        # (batch 128 needs grad-accum 2x64; see BASELINE.md memory table).
        Block = nn.checkpoint(UNetBlock) if self.remat else UNetBlock

        # The full-resolution in/out conv stacks are each ONE remat unit: a
        # per-conv checkpoint would still store the conv-to-conv boundary
        # (2 GB at 256^2 batch 128); pairing them keeps only the stack input.
        def in_stack(mdl, xx):
            xx = UNetConvBlock(channel_layers[0], True, None,
                               name="in_layer_0", **common)(xx)
            return UNetConvBlock(channel_layers[0], True, None,
                                 name="in_layer_1", **common)(xx)

        def mid_stack(mdl, xx):
            xx = UNetConvBlock(channel_layers[-1], True, None,
                               name="middle_layer_0", **common)(xx)
            return UNetConvBlock(channel_layers[-1], True, None,
                                 name="middle_layer_1", **common)(xx)

        def out_stack(mdl, xx):
            xx = UNetConvBlock(channel_layers[0], True, None,
                               name="out_layers_0", **common)(xx)
            return UNetConvBlock(mdl.out_channel, False, None,
                                 name="out_layers_1", **common)(xx)

        if self.remat:
            in_stack = nn.checkpoint(in_stack)
            mid_stack = nn.checkpoint(mid_stack)
            out_stack = nn.checkpoint(out_stack)

        if self.dtype is not None:
            x = x.astype(self.dtype)

        if self.time_dim is not None:
            cond_emb = ConditionalEmbedding(
                self.time_dim, self.cond_dim, dtype=self.dtype,
                param_dtype=self.param_dtype, name="cond_emb")(t, cond)
            emb_dim = self.time_dim
        else:
            cond_emb = None
            emb_dim = None

        x = in_stack(self, x)

        skips = []
        for layer_count in range(self.num_layers):
            x = Block(
                features=channel_layers[layer_count + 1],
                num_resnet_blocks=self.num_resnet_blocks,
                use_attn=layer_count in self.attn_layers,
                num_heads=self.num_heads,
                dim_per_head=self.dim_per_head,
                block_type=UNetBlockType.DOWN,
                remat=self.remat,
                emb_dim=emb_dim,
                name=f"down_layers_{layer_count}",
                **common)(x, cond_emb)
            skips.append(x)

        x = mid_stack(self, x)

        for i, layer_count in enumerate(range(self.num_layers - 1, -1, -1)):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = Block(
                features=channel_layers[layer_count],
                num_resnet_blocks=self.num_resnet_blocks,
                use_attn=layer_count in self.attn_layers,
                num_heads=self.num_heads,
                dim_per_head=self.dim_per_head,
                block_type=UNetBlockType.UP,
                remat=self.remat,
                emb_dim=emb_dim,
                name=f"up_layers_{i}",
                **common)(x, cond_emb)

        x = out_stack(self, x)
        if self.image_recon:
            x = jnp.tanh(x)
        return x

    @classmethod
    def from_config(cls, config: dict, **overrides) -> "UNet":
        """Build from a reference-format training config or bundle model dict
        (keys per create_diffusion_config.py:156-202 / export_models.py:72-92)."""
        recon = config.get("img_recon", config.get("image_recon", False))
        kwargs = dict(
            in_channel=config["in_channel"],
            out_channel=config["out_channel"],
            num_layers=config["num_layers"],
            num_resnet_blocks=config["num_resnet_block"],
            attn_layers=tuple(config["attn_layers"]),
            num_heads=config["attn_heads"],
            dim_per_head=config["attn_dim_per_head"],
            time_dim=config["time_dim"],
            cond_dim=config["cond_dim"],
            min_channel=config["min_channel"],
            max_channel=config["max_channel"],
            image_recon=recon,
            remat=bool(config.get("remat", False)),
            use_pallas=config.get("use_pallas", "auto"),
        )
        kwargs.update(overrides)
        return cls(**kwargs)
