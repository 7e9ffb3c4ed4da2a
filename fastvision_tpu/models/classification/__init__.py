"""Classification model zoo (ref: classfication/models/)."""
from .darknet53 import Darknet53, darknet53
from .resnet import (
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
)
from .vit import ViT, vit_base_patch16, vit_small_patch16, vit_tiny_patch16
from .vgg import (
    VGG,
    vgg11,
    vgg11_bn,
    vgg13,
    vgg13_bn,
    vgg16,
    vgg16_bn,
    vgg19,
    vgg19_bn,
)
