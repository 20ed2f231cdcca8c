from .audio import Wav2VecBert
from .base import FeatureBase, LayeredFeatureBase
from .neuro import Fmri
from .subject import SubjectEncoder
from .text import LLAMA3p2
from .video import VJEPA2
