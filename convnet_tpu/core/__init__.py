from convnet_tpu.core.module import (
    Module,
    Sequential,
    Context,
    init_module,
    apply_module,
)
from convnet_tpu.core.dtypes import Policy, DEFAULT_POLICY, BF16_POLICY, get_policy
from convnet_tpu.core import initializers
