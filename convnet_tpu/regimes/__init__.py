from convnet_tpu.regimes.regime import Regime, eval_setting
from convnet_tpu.regimes.optim import OptimRegime, sgd_step, adam_step, OPTIMIZERS
from convnet_tpu.regimes import schedules
