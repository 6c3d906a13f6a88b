"""ResNet-50/101 feature extractor (Flax, NHWC).

Architecture parity with the torchvision bottleneck ResNets the reference
taps for its EAST backbone (reference: src/manuscript/detectors/_east/
east.py:33-67): stem 7×7/2 + maxpool, four bottleneck stages at strides
4/8/16/32, features returned after every stage. Explicit torch-style padding
(not 'SAME') so converted weights are numerically exact.

TPU notes: NHWC layout, bfloat16-able compute dtype, BatchNorm in inference
mode folds into the surrounding convs under XLA fusion.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

# "resnet50-tiny" keeps the channel plan (256/512/1024/2048 stage outputs,
# so the EAST merge decoder is unchanged) at 1 block per stage — the SPMD
# semantics of a train step (sharded batch, replicated params, all-reduce,
# SAM two-pass, OHEM, EMA, donation) are identical to the full net at ~1/4
# the compile cost, which is what single-core dryruns / CI need.
STAGE_BLOCKS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet50-tiny": (1, 1, 1, 1),
    # "-micro" additionally narrows every stage 4× (stem 16, stage outputs
    # 64/128/256/512): a ~1M-param detector backbone whose checkpoint is
    # small enough to COMMIT — the synthetic-trained quality-gate fixture
    # (bench.py quality section) and edge/CI deployments ride it.
    "resnet50-micro": (1, 1, 1, 1),
}

STEM_WIDTH = {"resnet50-micro": 16}  # default 64 (torchvision plan)


class Bottleneck(nn.Module):
    """1×1 reduce → 3×3 (stride) → 1×1 expand(×4), residual add."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        identity = x

        out = nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(
            self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        out = bn("bn3")(out)

        if self.downsample:
            identity = nn.Conv(
                self.planes * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="down_conv",
            )(x)
            identity = bn("down_bn")(identity)

        return nn.relu(out + identity)


class ResNetFeatures(nn.Module):
    """Returns dict of stage outputs: res1 (C=256, /4) … res4 (C=2048, /32)."""

    backbone: str = "resnet50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        blocks = STAGE_BLOCKS[self.backbone]
        width = STEM_WIDTH.get(self.backbone, 64)

        x = nn.Conv(
            width,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn1",
        )(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        feats = {}
        planes = width
        for stage_idx, n_blocks in enumerate(blocks):
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{b}",
                )(x, train=train)
            feats[f"res{stage_idx + 1}"] = x
            planes *= 2
        return feats
