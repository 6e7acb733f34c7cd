from sdm_tpu.diffusion.samplers import (
    ddpm_sample,
    ddim_sample,
    cold_sample,
    dpmpp_sample,
    heun_sample,
    ddim_step_list,
    karras_step_list,
)
