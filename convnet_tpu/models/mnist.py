"""Small MNIST convnet for smoke tests (models/mnist.py:~1–60 approx.)."""

from convnet_tpu.core.module import Module, Sequential, Context
from convnet_tpu.nn import (
    Conv2d, Linear, ReLU, MaxPool2d, Dropout, Flatten,
)


class MnistNet(Module):
    def __init__(self, num_classes=10):
        self.features = Sequential(
            Conv2d(1, 32, 5, padding=2, bias=True), ReLU(), MaxPool2d(2),
            Conv2d(32, 64, 5, padding=2, bias=True), ReLU(), MaxPool2d(2),
            names=["conv1", "relu1", "pool1", "conv2", "relu2", "pool2"],
        )
        self.classifier = Sequential(
            Flatten(), Linear(7 * 7 * 64, 1024), ReLU(), Dropout(0.5),
            Linear(1024, num_classes),
            names=["flatten", "fc1", "relu", "drop", "fc2"],
        )
        self.input_size = 28
        self.regime = [
            {"epoch": 0, "optimizer": "SGD", "lr": 0.01, "momentum": 0.9},
            {"epoch": 10, "lr": 1e-3},
        ]

    def __call__(self, params, state, x, ctx: Context):
        x, _ = self.features(params["features"], state.get("features", {}), x, ctx)
        x, _ = self.classifier(params["classifier"], state.get("classifier", {}), x, ctx)
        return x, state


def mnist_model(**config):
    config.pop("dataset", None)
    return MnistNet(**config)
