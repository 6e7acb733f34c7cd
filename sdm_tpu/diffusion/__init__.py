from sdm_tpu.diffusion.samplers import (
    ddpm_sample,
    ddim_sample,
    cold_sample,
    ddim_step_list,
)
