from .common import LayerScale, Mean, Mlp, MlpConfig, SubjectLayers
from .fmri_encoder import FmriEncoder, FmriEncoderConfig
from .fmri_mlp import FmriMlp, FmriMlpConfig
from .transformer import TransformerEncoder, TransformerEncoderConfig
