"""Flax backbones + heads. Registry mirrors reference io_utils.py:7-15."""
from .backbones import (
    Conv3,
    Conv4,
    Conv4NP,
    Conv4S,
    Conv4SNP,
    Conv6,
    Conv6NP,
    ConvNet,
    ConvNetNopool,
    ConvNetS,
    ConvNetSNopool,
    DistLinear,
    EpisodicBatchNorm,
    MLP2,
    ResNet,
    ResNet10,
    ResNet18,
    ResNet34,
    ResNet50,
    ResNet101,
    feat_dims,
    model_dict,
    np_feat_shapes,
)

__all__ = [
    "Conv3", "Conv4", "Conv4NP", "Conv4S", "Conv4SNP", "Conv6", "Conv6NP",
    "ConvNet", "ConvNetNopool", "ConvNetS", "ConvNetSNopool", "DistLinear",
    "EpisodicBatchNorm", "MLP2", "ResNet", "ResNet10", "ResNet18", "ResNet34",
    "ResNet50", "ResNet101", "feat_dims", "model_dict", "np_feat_shapes",
]
