from sdm_tpu.ops.schedules import LinearSchedule, CosineSchedule, make_schedule
from sdm_tpu.ops.norms import group_norm
from sdm_tpu.ops.conv import conv2d, conv_transpose2d
