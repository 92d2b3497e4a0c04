from convnet_tpu.utils.param_filter import (
    filter_params,
    wd_mask,
    is_bn_param,
    is_bias_param,
)
