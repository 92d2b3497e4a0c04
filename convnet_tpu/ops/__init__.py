from convnet_tpu.ops.conv import conv2d, conv2d_transpose_output_shape
from convnet_tpu.ops.norm import batch_norm_train, batch_norm_inference
from convnet_tpu.ops.pool import max_pool2d, avg_pool2d, global_avg_pool
from convnet_tpu.ops.linear import linear
from convnet_tpu.ops.activation import relu, relu6
