"""Minimal torchvision stand-in so the REFERENCE model code can be imported
for conversion-parity tests (torchvision is not installed here).

Provides exactly what the reference needs in eval mode:

* ``torchvision.models.resnet50/resnet101`` — the standard torchvision
  ResNet ("v1.5": stride on the bottleneck's 3×3 conv), state-dict keys
  identical to torchvision's (``conv1``, ``bn1``, ``layer{1-4}.{b}.conv{1-3}``,
  ``.downsample.0/1``) so ``utils/convert.convert_east`` sees the real key
  layout (reference east.py:33-67 taps layer1-4 via create_feature_extractor);
* ``create_feature_extractor`` — returns a module running stem+stages and
  emitting the requested ``{layerN: name}`` taps as a dict (the real one
  builds a pruned fx GraphModule; eval-mode behavior is identical);
* ``torchvision.ops.DropBlock2d`` — identity (the reference only ever uses
  it with p=0.0 at inference; reference seresnet31.py:49-53).

Call ``install()`` before importing any reference module.
"""

import sys
import types

import torch
import torch.nn as nn


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * self.expansion, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    def __init__(self, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], stride=1)
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * _Bottleneck.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(
                    self.inplanes,
                    planes * _Bottleneck.expansion,
                    1,
                    stride=stride,
                    bias=False,
                ),
                nn.BatchNorm2d(planes * _Bottleneck.expansion),
            )
        blocks_list = [_Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * _Bottleneck.expansion
        for _ in range(1, blocks):
            blocks_list.append(_Bottleneck(self.inplanes, planes))
        return nn.Sequential(*blocks_list)

    def forward(self, x):  # pragma: no cover — only taps are used in tests
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def resnet50(weights=None, **kwargs):
    assert weights is None, "stub has no pretrained weights"
    return _ResNet([3, 4, 6, 3])


def resnet101(weights=None, **kwargs):
    assert weights is None, "stub has no pretrained weights"
    return _ResNet([3, 4, 23, 3])


class _Extractor(nn.Module):
    """Stand-in for create_feature_extractor's GraphModule: same submodule
    names (so state-dict keys match), forward returns the tap dict."""

    def __init__(self, model, return_nodes):
        super().__init__()
        self.conv1 = model.conv1
        self.bn1 = model.bn1
        self.relu = model.relu
        self.maxpool = model.maxpool
        self.layer1 = model.layer1
        self.layer2 = model.layer2
        self.layer3 = model.layer3
        self.layer4 = model.layer4
        self._return_nodes = dict(return_nodes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        out = {}
        for layer_name in ("layer1", "layer2", "layer3", "layer4"):
            x = getattr(self, layer_name)(x)
            if layer_name in self._return_nodes:
                out[self._return_nodes[layer_name]] = x
        return out


def create_feature_extractor(model, return_nodes):
    return _Extractor(model, return_nodes)


class DropBlock2d(nn.Module):
    """Identity: the reference instantiates it with p=0.0 for inference
    (seresnet31.py:49-53); parity tests run eval mode only."""

    def __init__(self, p=0.0, block_size=3, **kwargs):
        super().__init__()

    def forward(self, x):
        return x


def install():
    """Register the stub as ``torchvision`` in sys.modules (idempotent)."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    fe = types.ModuleType("torchvision.models.feature_extraction")
    ops = types.ModuleType("torchvision.ops")

    models.resnet50 = resnet50
    models.resnet101 = resnet101
    models.ResNet50_Weights = types.SimpleNamespace(DEFAULT=None)
    models.ResNet101_Weights = types.SimpleNamespace(DEFAULT=None)
    fe.create_feature_extractor = create_feature_extractor
    ops.DropBlock2d = DropBlock2d

    tv.models = models
    tv.ops = ops
    models.feature_extraction = fe

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.feature_extraction"] = fe
    sys.modules["torchvision.ops"] = ops
