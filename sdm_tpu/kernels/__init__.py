from sdm_tpu.kernels.attention import fused_attention
from sdm_tpu.kernels.adagn import fused_adagn
