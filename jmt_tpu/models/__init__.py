from jmt_tpu.models.encoder import TransformerEncoderLayer, TransformerEncoderBlock
from jmt_tpu.models.jmt import (JointMultimodalTransformer,
                                MultimodalTransformerNoJR, FeatureConcatFC)
from jmt_tpu.models.intra_modal import IntraModalTransformerFusion, FcLayer
from jmt_tpu.models.fusion import TwoTransformers, SingleBackbonePretrainer
from jmt_tpu.models.wavlm import (WavLMConfig, wavlm_apply,
                                  wavlm_params_from_torch)
