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
import jax
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


class StemConv(nn.Module):
    """7×7/2 stem conv, computed as a space-to-depth-folded 4×4/1 conv.

    A C_in=3 7×7 conv leaves the MXU's 128-deep contraction nearly empty;
    folding each 2×2 input block into channels (→12 channels) and the
    zero-padded 8×8 kernel into a 4×4 one is numerically exact (identical
    MACs plus 45 zero taps) and measured 4.0× faster on v5e
    (examples/stem_probe.py: 2.68 → 0.68 ms on a 1280² page, i.e. 42% → 11%
    of the whole EAST forward). The parameter layout is unchanged — `kernel`
    is stored (7, 7, C_in, width) HWIO exactly like the ``nn.Conv`` this
    replaces — so checkpoints, torch conversion (utils/convert.py), and the
    parity fixtures are untouched; the fold happens inside the program.

    Kernel fold derivation: with padding 3 and stride 2, tap ``u`` of the
    7-tap kernel reads source offset ``2i - 3 + u``. Zero-padding one
    row/col at the TOP/LEFT re-indexes to ``u' ∈ 0..7`` with offset
    ``2i - 4 + u' = 2(i - 2 + c) + a`` for ``u' = 2c + a`` — i.e. block
    coordinate ``c`` (the folded 4-tap axis) with in-block offset ``a``
    (the channel-fold axis), matching the input's (row, col, channel)
    fold order. Padding (2, 1) per axis reproduces the original halo.
    """

    width: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, cin, self.width),
            jnp.float32,
        )
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        n, h, w, _ = x.shape
        if h % 2 or w % 2:
            # odd spatial dims can't fold into 2×2 blocks — direct form
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn
            )
        x = x.reshape(n, h // 2, 2, w // 2, 2, cin)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * cin)
        k = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = k.reshape(4, 2, 4, 2, cin, self.width)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, self.width)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(2, 1), (2, 1)], dimension_numbers=dn
        )


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

        x = StemConv(width, dtype=self.dtype, name="conv1")(x)
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
