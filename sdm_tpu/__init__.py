"""sdm_tpu — TPU-native diffusion framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
Vinmwaura/Simple-Diffusion-Model (reference at /root/reference): conditional
U-Net denoiser, linear/cosine noise schedules, DDPM/DDIM/Cold-diffusion
sampling compiled as single on-device `lax.scan` programs, four training
pipelines (base, cold, doodle-conditioned, cascaded super-resolution),
ensemble/cascade model chaining at inference, and the reference's JSON
config / checkpoint-bundle workflow — with data-parallel training over a
`jax.sharding.Mesh`, bf16 compute, and fused Pallas kernels.
"""

__version__ = "0.1.0"
