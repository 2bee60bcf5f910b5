from jmt_tpu.models.encoder import TransformerEncoderLayer, TransformerEncoderBlock
from jmt_tpu.models.jmt import (JointMultimodalTransformer,
                                MultimodalTransformerNoJR, FeatureConcatFC)
from jmt_tpu.models.intra_modal import IntraModalTransformerFusion, FcLayer
from jmt_tpu.models.fusion import TwoTransformers, SingleBackbonePretrainer
