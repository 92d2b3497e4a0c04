"""convnet_tpu — a TPU-native image-classification training framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``eladhoffer/convNet.pytorch`` (see SURVEY.md for the blueprint):

- ``core/``     functional module system (params/state pytrees, dtype policy)
- ``ops/``      numerical ops: XLA (`lax`) path + Pallas TPU kernels
- ``nn/``       layer modules built on ops (Conv2d, BatchNorm, SE, ...)
- ``models/``   model zoo with embedded training regimes
- ``regimes/``  time-indexed declarative config engine + optimizer regimes
- ``data/``     host-side input pipeline with device-side augmentation
- ``train/``    Trainer: jitted train/eval steps, losses, mixup, meters
- ``parallel/`` device mesh, data parallelism, cross-replica BN
- ``utils/``    logging, checkpointing, BN folding, param filtering

Design: NHWC layout throughout (TPU-native), bf16 compute with fp32
parameters/BN statistics by default, SPMD via ``jax.sharding.Mesh`` +
``shard_map``, and Pallas kernels for fused hot paths behind an
``impl={'xla','pallas'}`` switch.
"""

__version__ = "0.1.0"
