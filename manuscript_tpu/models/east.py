"""EAST detection network (Flax, NHWC).

Architecture parity with the reference model (reference:
src/manuscript/detectors/_east/east.py:13-139): ResNet backbone taps at
strides 4/8/16/32, U-Net-style merge decoder (channel plan
2048→512→256→128→32 with bilinear 2× upsampling + concat), 1×1 head emitting
a sigmoid score map (1ch) and raw QUAD geometry (8ch) at 1/4 input
resolution.

TPU-first details: NHWC, bilinear upsample via jax.image.resize
(half-pixel-center semantics == torch align_corners=False), compute dtype
switchable to bfloat16; score sigmoid and geometry stay float32 for decode
stability.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNetFeatures


class DecoderBlock(nn.Module):
    """conv1×1+BN+ReLU → conv3×3+BN+ReLU."""

    mid_channels: int
    out_channels: int
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
        x = nn.Conv(self.mid_channels, (1, 1), dtype=self.dtype, name="conv1x1")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            dtype=self.dtype,
            name="conv3x3",
        )(x)
        x = nn.relu(bn("bn2")(x))
        return x


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


class MergeDecoder(nn.Module):
    """Top-down feature merging: res4 → … → res1, halving channels.

    ``width_mult`` scales the channel plan (512/256/128/64→32) for narrow
    backbones ("resnet50-micro") so the decoder stays proportionate.
    """

    dtype: Any = jnp.float32
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], train: bool = False):
        c = lambda n: max(8, int(n * self.width_mult))
        h4 = DecoderBlock(c(512), c(512), dtype=self.dtype, name="block1")(
            feats["res4"], train=train
        )
        h3 = DecoderBlock(c(256), c(256), dtype=self.dtype, name="block2")(
            jnp.concatenate([_upsample2x(h4), feats["res3"]], axis=-1), train=train
        )
        h2 = DecoderBlock(c(128), c(128), dtype=self.dtype, name="block3")(
            jnp.concatenate([_upsample2x(h3), feats["res2"]], axis=-1), train=train
        )
        h1 = DecoderBlock(c(64), c(32), dtype=self.dtype, name="block4")(
            jnp.concatenate([_upsample2x(h2), feats["res1"]], axis=-1), train=train
        )
        return h1


class EASTModel(nn.Module):
    """Full detector: backbone → merge decoder → score/geometry head.

    Returns {"score": (B, H/4, W/4, 1) in [0,1] float32,
             "geometry": (B, H/4, W/4, 8) float32}.
    """

    backbone: str = "resnet50"
    dtype: Any = jnp.float32
    score_scale: float = 0.25
    geo_scale: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNetFeatures(backbone=self.backbone, dtype=self.dtype, name="backbone")(
            x, train=train
        )
        # narrow backbones get a proportionally narrow decoder
        mult = 0.25 if self.backbone.endswith("-micro") else 1.0
        merged = MergeDecoder(dtype=self.dtype, width_mult=mult, name="decoder")(
            feats, train=train
        )
        score = nn.Conv(1, (1, 1), dtype=self.dtype, name="score_head")(merged)
        geometry = nn.Conv(8, (1, 1), dtype=self.dtype, name="geo_head")(merged)
        # decode path wants f32 regardless of backbone compute dtype
        score = jax.nn.sigmoid(score.astype(jnp.float32))
        geometry = geometry.astype(jnp.float32)
        return {"score": score, "geometry": geometry}
