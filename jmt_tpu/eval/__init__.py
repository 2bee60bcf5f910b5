from jmt_tpu.eval.stitch import Stitcher, write_challenge_txt
