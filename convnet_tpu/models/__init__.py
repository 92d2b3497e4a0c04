"""Model registry — ``models.build(name, **config)``.

Mirrors the reference's ``models/__init__.py`` (~20 LoC) which
star-imports every model module so ``models.__dict__[name]`` resolves
factory functions (SURVEY.md §2.2). Each factory returns a Module with
embedded policy attributes: ``.regime`` (optimizer schedule), optional
``.data_regime`` / ``.data_eval_regime``, and ``.input_size``.
"""

from convnet_tpu.models.resnet import (resnet, resnet_se, resnext, wide_resnet, ResNet_imagenet, ResNet_cifar)
from convnet_tpu.models.resnet_zi import resnet_zi
from convnet_tpu.models.alexnet import alexnet
from convnet_tpu.models.mobilenet import mobilenet
from convnet_tpu.models.mobilenet_v2 import mobilenet_v2
from convnet_tpu.models.googlenet import googlenet
from convnet_tpu.models.vgg import vgg
from convnet_tpu.models.mnist import mnist_model
from convnet_tpu.models.densenet import densenet
from convnet_tpu.models.inception import inception_v3
from convnet_tpu.models.inception_resnet_v2 import inception_resnet_v2
from convnet_tpu.models.inception_v4 import inception_v4

REGISTRY = {
    "resnet": resnet,
    "resnet_se": resnet_se,
    "resnext": resnext,
    "wide_resnet": wide_resnet,
    "resnet_zi": resnet_zi,
    "alexnet": alexnet,
    "mobilenet": mobilenet,
    "mobilenet_v2": mobilenet_v2,
    "googlenet": googlenet,
    "vgg": vgg,
    "mnist": mnist_model,
    "densenet": densenet,
    "inception_v3": inception_v3,
    "inception_resnet_v2": inception_resnet_v2,
    "inception_v4": inception_v4,
}


def build(name, **config):
    try:
        factory = REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown model {name!r}; available: {sorted(REGISTRY)}") from None
    return factory(**config)
