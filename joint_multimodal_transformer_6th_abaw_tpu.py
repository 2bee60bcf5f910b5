"""Import alias: the full project name re-exports the `jmt_tpu` package.

`import joint_multimodal_transformer_6th_abaw_tpu as jmt` == `import jmt_tpu`.
"""
import sys

from jmt_tpu import *  # noqa: F401,F403

for _sub in ("core", "ops", "models", "data", "train", "parallel", "eval"):
    sys.modules[f"{__name__}.{_sub}"] = __import__(
        f"jmt_tpu.{_sub}", fromlist=[_sub])
