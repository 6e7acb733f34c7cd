from sdm_tpu.io.torch_interop import (
    torch_state_dict_to_params,
    params_to_torch_state_dict,
    merge_partial_params,
)
