"""Zero-init-residual ResNet variant.

Rebuild of models/resnet_zi.py:~1–100 (approx.): the final BN of each
residual branch starts with gamma=0 so every block begins as identity
("Norm matters" / Goyal et al. trick). Implemented as a factory flag on
the shared ResNet builder.
"""

from convnet_tpu.models.resnet import resnet


def resnet_zi(**config):
    config.setdefault("zero_init_residual", True)
    return resnet(**config)
