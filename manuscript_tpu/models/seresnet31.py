"""SEResNet31 recognizer backbone (Flax, NHWC).

Architecture parity with the reference CNN (reference:
src/manuscript/recognizers/_trba/model/seresnet31.py:5-187): stem
3→64→128 + maxpool, SE-augmented basic-block stages 1×(128→256,s2),
2×256, 5×(256→512,s2), 3×512, then conv_out with a (2,1)-stride 2×2 conv
(padding (0,1)) and a valid 2×2 conv. Squeeze-Excitation (reduction 16) on
every block. DropBlock is train-only regularization; here plain spatial
dropout fills that role (flag-gated, off by default).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def _bn(train: bool, dtype, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class SELayer(nn.Module):
    """Squeeze-Excitation: global-avg-pool → FC reduce → FC expand → scale."""

    channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.Dense(
            self.channels // self.reduction,
            use_bias=False,
            dtype=self.dtype,
            name="fc1",
        )(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    reduction: int = 16
    dropblock_p: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        out = nn.relu(_bn(train, self.dtype, "bn1")(out))
        out = nn.Conv(
            self.planes,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = _bn(train, self.dtype, "bn2")(out)
        out = SELayer(self.planes, self.reduction, dtype=self.dtype, name="se")(out)
        if self.dropblock_p > 0:
            out = nn.Dropout(
                rate=self.dropblock_p,
                broadcast_dims=(1, 2),
                deterministic=not train,
                name="dropblock",
            )(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="down_conv",
            )(x)
            identity = _bn(train, self.dtype, "down_bn")(identity)
        return nn.relu(out + identity)


# (planes, blocks, stride) per stage. "tiny" keeps the channel/stride plan
# (so downstream shapes and the SPMD semantics of a train step are
# unchanged) at 1 block per stage — for single-core dryruns/CI where LLVM
# compile time of the full 11-block net dominates.
STAGE_PLANS = {
    "full": ((256, 1, 2), (256, 2, 1), (512, 5, 2), (512, 3, 1)),
    "tiny": ((256, 1, 2), (256, 1, 1), (512, 1, 2), (512, 1, 1)),
    # "micro" narrows every stage 4× (and the stem 2×) on top of the tiny
    # depth: a ~0.5M-param recognizer CNN whose trained checkpoint is small
    # enough to COMMIT for the synthetic quality-gate fixture; pair with
    # out_channels=128.
    "micro": ((64, 1, 2), (64, 1, 1), (128, 1, 2), (128, 1, 1)),
}

STEM_WIDTHS = {"micro": (32, 64)}  # default (64, 128) (reference plan)


class SEResNet31(nn.Module):
    out_channels: int = 512
    reduction: int = 16
    dropblock_p: float = 0.0
    dtype: Any = jnp.float32
    stage_plan: str = "full"

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem1, stem2 = STEM_WIDTHS.get(self.stage_plan, (64, 128))
        # stem
        x = nn.Conv(
            stem1, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="stem_conv1",
        )(x)
        x = nn.relu(_bn(train, self.dtype, "stem_bn1")(x))
        x = nn.Conv(
            stem2, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="stem_conv2",
        )(x)
        x = nn.relu(_bn(train, self.dtype, "stem_bn2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # residual stages: (planes, blocks, stride)
        plan = STAGE_PLANS[self.stage_plan]
        in_planes = stem2
        for stage_idx, (planes, blocks, stride) in enumerate(plan, start=1):
            for b in range(blocks):
                need_down = b == 0 and (stride != 1 or in_planes != planes)
                x = SEBasicBlock(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=need_down,
                    reduction=self.reduction,
                    dropblock_p=self.dropblock_p,
                    dtype=self.dtype,
                    name=f"layer{stage_idx}_{b}",
                )(x, train=train)
            in_planes = planes

        # conv_out: 2×2 stride (2,1) pad (0,1) → 2×2 valid
        x = nn.Conv(
            self.out_channels,
            (2, 2),
            strides=(2, 1),
            padding=[(0, 0), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="out_conv1",
        )(x)
        x = nn.relu(_bn(train, self.dtype, "out_bn1")(x))
        x = nn.Conv(
            self.out_channels,
            (2, 2),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="out_conv2",
        )(x)
        x = nn.relu(_bn(train, self.dtype, "out_bn2")(x))
        if x.shape[1] == 0 or x.shape[2] == 0:  # trace-time shape check
            raise ValueError(
                "input too small for SEResNet31: feature map collapsed to "
                f"{x.shape} — minimum input is 32 high (the height-pool "
                "would silently produce NaNs)"
            )
        return x  # (B, H', W', out_channels)
