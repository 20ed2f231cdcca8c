from .data import Data
from .experiment import Experiment
from .tracking import RunLogger, WandbLoggerConfig
