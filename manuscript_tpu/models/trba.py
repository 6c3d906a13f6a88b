"""TRBA recognizer model (Flax): SEResNet31 → height-pool → 2×BiLSTM →
additive-attention LSTM decoder.

Composition parity with the reference (reference:
src/manuscript/recognizers/_trba/model/model.py:338-416): the CNN's feature
map is mean-pooled over height (AdaptiveAvgPool2d((1,None)) equivalent),
treated as a W-length sequence, passed through two stacked BiLSTM(→256)
blocks, then decoded. Like the reference — and despite the historical name —
there is no TPS spatial transformer.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import AttentionDecoder
from .rnn import BiLSTM
from .seresnet31 import SEResNet31


class TRBAModel(nn.Module):
    num_classes: int
    hidden_size: int = 256
    sos_id: int = 1
    eos_id: int = 2
    pad_id: int = 0
    blank_id: Optional[int] = None
    enc_dropout_p: float = 0.1
    dropblock_p: float = 0.0
    dtype: Any = jnp.float32
    # The decoder's 26-step recurrence and its softmax/confidence math stay
    # f32 by default even when the FLOP-heavy CNN/BiLSTM encode runs bf16:
    # the decoder is ~2% of the model's FLOPs but carries all the argmax/
    # logprob decisions, so mixed precision costs nothing measurable and
    # keeps greedy/beam token parity with the f32 reference.
    decoder_dtype: Optional[Any] = None
    use_pallas: bool = False  # fused Pallas greedy decode step (TPU)
    use_tps: bool = False  # TPS rectification (extension; off for parity)
    tps_fiducials: int = 20
    # "full" (reference 11-block SEResNet31), "tiny" (1 block/stage, same
    # channels/strides — compile-budgeted dryruns/CI), or "micro" (tiny
    # depth, 4×-narrow channels — committable quality-gate checkpoints)
    cnn_stage_plan: str = "full"
    # CNN output channels; None → 512 ("full"/"tiny" plan) or 128 ("micro")
    cnn_out_channels: Optional[int] = None

    def setup(self):
        if self.use_tps:
            from .tps import TPSTransformer

            self.tps = TPSTransformer(
                num_fiducials=self.tps_fiducials, dtype=self.dtype
            )
        out_ch = self.cnn_out_channels
        if out_ch is None:
            out_ch = 128 if self.cnn_stage_plan == "micro" else 512
        self.cnn = SEResNet31(
            out_channels=out_ch,
            dropblock_p=self.dropblock_p,
            dtype=self.dtype,
            stage_plan=self.cnn_stage_plan,
        )
        self.enc_rnn1 = BiLSTM(self.hidden_size, self.hidden_size, dtype=self.dtype)
        self.enc_rnn2 = BiLSTM(self.hidden_size, self.hidden_size, dtype=self.dtype)
        self.enc_dropout = nn.Dropout(rate=self.enc_dropout_p)
        self.decoder = AttentionDecoder(
            enc_dim=self.hidden_size,
            hidden_size=self.hidden_size,
            num_classes=self.num_classes,
            sos_id=self.sos_id,
            eos_id=self.eos_id,
            blank_id=self.blank_id,
            dropout_p=0.1,
            dtype=(
                jnp.float32
                if self.decoder_dtype is None
                else self.decoder_dtype
            ),
            use_pallas=self.use_pallas,
        )

    def encode(self, x, train: bool = False):
        """x: (B, H, W, 3) normalized floats → (B, W', hidden) sequence."""
        if self.use_tps:
            # rectify onto a same-sized canonical grid before the CNN
            x = self.tps(x, train=train)
        f = self.cnn(x, train=train)  # (B, H', W', 512)
        f = jnp.mean(f, axis=1)  # height pool → (B, W', 512)
        f = self.enc_rnn1(f)
        f = self.enc_rnn2(f)
        if self.enc_dropout_p > 0:
            f = self.enc_dropout(f, deterministic=not train)
        return f

    def __call__(self, x, text_in, train: bool = False, ss_prob: float = 0.0):
        """Teacher-forced training forward → logits (B, steps, V).
        ``ss_prob`` > 0 enables scheduled sampling in the decoder."""
        enc = self.encode(x, train=train)
        return self.decoder(enc, text_in, train=train, ss_prob=ss_prob)

    def greedy(self, x, max_len: int = 25):
        enc = self.encode(x, train=False)
        return self.decoder.greedy(enc, max_len=max_len)

    def beam(
        self,
        x,
        max_len: int = 25,
        beam_size: int = 8,
        alpha: float = 0.9,
        temperature: float = 1.7,
    ):
        enc = self.encode(x, train=False)
        return self.decoder.beam(
            enc,
            max_len=max_len,
            beam_size=beam_size,
            alpha=alpha,
            temperature=temperature,
        )
