from jmt_tpu.core.rng import RngStream, set_global_seed
from jmt_tpu.core.logging import JsonLinesLogger, get_logger, init_logger
