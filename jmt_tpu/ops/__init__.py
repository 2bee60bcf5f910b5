from jmt_tpu.ops.ccc import ccc_loss, ccc_metric, ccc_loss_masked
from jmt_tpu.ops.smoothing import uniform_filter1d, clip_and_smooth
