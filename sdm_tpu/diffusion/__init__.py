from sdm_tpu.diffusion.samplers import (
    ddpm_sample,
    ddim_sample,
    cold_sample,
    dpmpp_sample,
    ddim_step_list,
)
