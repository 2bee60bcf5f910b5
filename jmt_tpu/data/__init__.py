from jmt_tpu.data.windowing import (train_windows, eval_windows,
                                    decimate_subsequence, coverage_check,
                                    TRAIN_SKIP_VIDS)
