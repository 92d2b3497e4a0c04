from convnet_tpu.data.preprocess import get_transform, DATASET_STATS
from convnet_tpu.data.datasets import get_dataset
from convnet_tpu.data.loader import DataLoader, ArrayBatcher
from convnet_tpu.data.data_regime import DataRegime
