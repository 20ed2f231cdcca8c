from .losses import LossConfig, build_loss
from .metrics import Metric, MetricConfig, build_metric
from .optim import OptimConfig, OptimizerConfig, SchedulerConfig
from .trainer import BrainTrainer, TrainerConfig, TrainState
