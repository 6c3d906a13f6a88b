"""Additive-attention LSTM decoder with jit-compiled greedy & beam search.

Math parity with the reference decoder (reference:
src/manuscript/recognizers/_trba/model/model.py:24-320):

* cell: e = v·tanh(W_i·H + W_h·h); α = softmax(e) (dropout in train);
  context = αᵀH; LSTMCell over [context; onehot(prev)].
* train: teacher forcing over max_len+1 steps; returned logits come from the
  raw hidden state (the dropout branch only feeds scheduled sampling).
* greedy: argmax loop. The reference early-exits when every row has emitted
  EOS; here the scan always runs the full static length — identical tokens,
  and the wrapper masks steps past each row's first EOS for confidences
  (batch-independent, unlike the reference's batch-coupled trace length).
* beam: batched [B, beam] search with GNMT length penalty
  ((5+t)^α/6^α), finished-beam masking (only EOS continues, log-prob 0),
  temperature-scaled logits, optional BLANK logit masking at −1e4, and a
  per-step chosen-beam logits trace reconstructed via backpointers.

All decodes are fixed-shape ``lax.scan`` programs — no host round-trips, no
recompilation across batches.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .rnn import lstm_cell_step

NEG_INF = -1e30
BLANK_MASK = -1e4


class AttentionDecoder(nn.Module):
    enc_dim: int
    hidden_size: int
    num_classes: int
    sos_id: int = 1
    eos_id: int = 2
    blank_id: Optional[int] = None
    dropout_p: float = 0.1
    dtype: Any = jnp.float32
    use_pallas: bool = False  # fused Pallas decode step (TPU)
    pallas_interpret: bool = False  # interpreter mode (CPU tests)

    def setup(self):
        h, v, e = self.hidden_size, self.num_classes, self.enc_dim
        init = nn.initializers.lecun_normal()
        self.w_i2h = self.param("i2h_kernel", init, (e, h))
        self.w_h2h = self.param("h2h_kernel", init, (h, h))
        self.b_h2h = self.param("h2h_bias", nn.initializers.zeros, (h,))
        self.w_score = self.param("score_kernel", init, (h, 1))
        self.lstm_kernel_ih = self.param("lstm_kernel_ih", init, (e + v, 4 * h))
        self.lstm_kernel_hh = self.param("lstm_kernel_hh", init, (h, 4 * h))
        self.lstm_bias = self.param("lstm_bias", nn.initializers.zeros, (4 * h,))
        self.w_gen = self.param("gen_kernel", init, (h, v))
        self.b_gen = self.param("gen_bias", nn.initializers.zeros, (v,))

    # ---- building blocks -------------------------------------------------

    def _cell(self, h, c, enc, proj_enc, onehot, alpha_dropout_rng=None):
        """One attention + LSTM step.

        enc: (B, T, E); proj_enc: (B, T, H) — W_i·H precomputed once per
        sequence (MXU matmul outside the scan).
        """
        proj_h = h @ self.w_h2h + self.b_h2h  # (B, H)
        e = jnp.tanh(proj_enc + proj_h[:, None, :]) @ self.w_score  # (B, T, 1)
        alpha = jax.nn.softmax(e, axis=1)
        if alpha_dropout_rng is not None and self.dropout_p > 0:
            keep = jax.random.bernoulli(
                alpha_dropout_rng, 1.0 - self.dropout_p, alpha.shape
            )
            alpha = jnp.where(keep, alpha / (1.0 - self.dropout_p), 0.0)
        context = jnp.sum(alpha * enc, axis=1)  # (B, E)
        x = jnp.concatenate([context, onehot], axis=-1)
        x_proj = x @ self.lstm_kernel_ih + self.lstm_bias
        h_new, c_new = lstm_cell_step(self.lstm_kernel_hh, x_proj, h, c)
        return h_new, c_new, alpha

    def _logits(self, h):
        return h @ self.w_gen + self.b_gen

    def _mask_blank(self, logits):
        if self.blank_id is None:
            return logits
        return logits.at[..., self.blank_id].set(BLANK_MASK)

    def _onehot(self, tokens):
        return jax.nn.one_hot(tokens, self.num_classes, dtype=self.dtype)

    # ---- teacher-forced training forward ---------------------------------

    def __call__(self, enc, text_in, train: bool = False, ss_prob: float = 0.0):
        """Teacher-forced logits (B, steps, V); text_in: (B, steps) with SOS
        at position 0. steps = max_len + 1.

        ``ss_prob`` enables scheduled sampling (reference model.py:287-320):
        at each step after the first, each sample independently feeds the
        model's own previous argmax prediction instead of the ground-truth
        token with probability ``ss_prob``. Static Python float — one
        compile per configured value.

        Documented semantics deltas vs the reference (model.py:311-316),
        both deliberate: (a) the coin is drawn PER SAMPLE here, not once
        per step for the whole batch — one sample's curriculum no longer
        depends on its batchmates; (b) the sampled prediction argmaxes the
        blank-masked pre-dropout logits rather than the unmasked
        post-dropout ones — a model with a <BLANK> id never feeds itself a
        blank, and dropout noise doesn't pick the fed-back token.
        """
        b, _, _ = enc.shape
        steps = text_in.shape[1]
        proj_enc = enc @ self.w_i2h
        use_ss = train and ss_prob > 0.0
        rng = (
            self.make_rng("dropout")
            if train and (self.dropout_p > 0 or use_ss)
            else None
        )

        def step(carry, t):
            h, c, prev_pred = carry
            tok = jax.lax.dynamic_index_in_dim(text_in, t, axis=1, keepdims=False)
            step_rng = (
                jax.random.fold_in(rng, t) if rng is not None else None
            )
            if use_ss:
                # step 0 consumes SOS — never sampled (no previous pred)
                sample = jax.random.bernoulli(
                    jax.random.fold_in(rng, steps + t), ss_prob, (b,)
                )
                tok = jnp.where((t > 0) & sample, prev_pred, tok)
            drop_rng = step_rng if self.dropout_p > 0 else None
            h, c, _ = self._cell(h, c, enc, proj_enc, self._onehot(tok), drop_rng)
            if use_ss:
                prev_pred = jnp.argmax(
                    self._mask_blank(self._logits(h)), axis=-1
                ).astype(text_in.dtype)
            return (h, c, prev_pred), h

        init = (
            jnp.zeros((b, self.hidden_size), self.dtype),
            jnp.zeros((b, self.hidden_size), self.dtype),
            jnp.zeros((b,), text_in.dtype),
        )
        _, hs = jax.lax.scan(step, init, jnp.arange(steps))
        hs = jnp.swapaxes(hs, 0, 1)  # (B, steps, H)
        return self._mask_blank(self._logits(hs))

    # ---- greedy decode ----------------------------------------------------

    def greedy(self, enc, max_len: int = 25):
        """Greedy decode → (logits (B, steps, V), preds (B, steps))."""
        b = enc.shape[0]
        steps = max_len + 1
        proj_enc = enc @ self.w_i2h

        if self.use_pallas:
            from ..ops.pallas_attention import (
                attention_lstm_step_pallas,
                pad_step_params,
            )

            w_ih_p, v_pad = pad_step_params(self.lstm_kernel_ih, self.num_classes)
            enc_f = enc.astype(jnp.float32)
            proj_f = proj_enc.astype(jnp.float32)

            def step(carry, _):
                h, c, tok = carry
                onehot_p = jax.nn.one_hot(tok, v_pad, dtype=jnp.float32)
                h, c = attention_lstm_step_pallas(
                    enc_f, proj_f, h, c, onehot_p,
                    self.w_h2h.astype(jnp.float32),
                    self.b_h2h.astype(jnp.float32),
                    self.w_score.astype(jnp.float32),
                    w_ih_p.astype(jnp.float32),
                    self.lstm_kernel_hh.astype(jnp.float32),
                    self.lstm_bias.astype(jnp.float32),
                    interpret=self.pallas_interpret,
                )
                logits = self._mask_blank(self._logits(h.astype(self.dtype)))
                nxt = jnp.argmax(logits, axis=-1)
                return (h, c, nxt), (logits, nxt)

            init = (
                jnp.zeros((b, self.hidden_size), jnp.float32),
                jnp.zeros((b, self.hidden_size), jnp.float32),
                jnp.full((b,), self.sos_id, dtype=jnp.int32),
            )
            _, (logits, preds) = jax.lax.scan(step, init, None, length=steps)
            return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(preds, 0, 1)

        def step(carry, _):
            h, c, tok = carry
            h, c, _ = self._cell(h, c, enc, proj_enc, self._onehot(tok))
            logits = self._mask_blank(self._logits(h))
            nxt = jnp.argmax(logits, axis=-1)
            return (h, c, nxt), (logits, nxt)

        init = (
            jnp.zeros((b, self.hidden_size), self.dtype),
            jnp.zeros((b, self.hidden_size), self.dtype),
            jnp.full((b,), self.sos_id, dtype=jnp.int32),
        )
        _, (logits, preds) = jax.lax.scan(step, init, None, length=steps)
        return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(preds, 0, 1)

    # ---- beam decode --------------------------------------------------------

    def beam(
        self,
        enc,
        max_len: int = 25,
        beam_size: int = 5,
        alpha: float = 0.9,
        temperature: float = 1.7,
    ):
        """Batched beam search → (chosen-beam logits (B, T, V), tokens (B, T)).

        Logits in the trace are temperature-scaled and blank-masked, exactly
        what the confidence computation consumes.
        """
        b, t_enc, e_dim = enc.shape
        k, v, hdim = beam_size, self.num_classes, self.hidden_size
        steps = max_len

        enc_r = jnp.repeat(enc, k, axis=0)  # (B*k, T, E)
        proj_enc_r = enc_r @ self.w_i2h
        batch_idx = jnp.arange(b)

        if self.use_pallas:
            from ..ops.pallas_attention import (
                attention_lstm_step_pallas,
                pad_step_params,
            )

            w_ih_p, v_pad = pad_step_params(self.lstm_kernel_ih, self.num_classes)
            enc_f = enc_r.astype(jnp.float32)
            proj_f = proj_enc_r.astype(jnp.float32)

            def flat_cell(h_flat, c_flat, tok_flat):
                onehot_p = jax.nn.one_hot(tok_flat, v_pad, dtype=jnp.float32)
                h2, c2 = attention_lstm_step_pallas(
                    enc_f, proj_f, h_flat.astype(jnp.float32),
                    c_flat.astype(jnp.float32), onehot_p,
                    self.w_h2h.astype(jnp.float32),
                    self.b_h2h.astype(jnp.float32),
                    self.w_score.astype(jnp.float32),
                    w_ih_p.astype(jnp.float32),
                    self.lstm_kernel_hh.astype(jnp.float32),
                    self.lstm_bias.astype(jnp.float32),
                    interpret=self.pallas_interpret,
                )
                return h2.astype(self.dtype), c2.astype(self.dtype)

        else:

            def flat_cell(h_flat, c_flat, tok_flat):
                h2, c2, _ = self._cell(
                    h_flat, c_flat, enc_r, proj_enc_r, self._onehot(tok_flat)
                )
                return h2, c2

        def step(carry, t):
            tok, scores, h, c, finished = carry
            # (B, k, ·) → flat cell step
            h2, c2 = flat_cell(
                h.reshape(b * k, hdim),
                c.reshape(b * k, hdim),
                tok.reshape(b * k),
            )
            logits = self._mask_blank(self._logits(h2))  # (B*k, V)
            logits = logits / jnp.maximum(temperature, 1e-6)
            log_probs = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)
            h2 = h2.reshape(b, k, hdim)
            c2 = c2.reshape(b, k, hdim)

            # finished beams: only EOS continues, at log-prob 0
            fin = finished[:, :, None]
            log_probs = jnp.where(fin, NEG_INF, log_probs)
            log_probs = log_probs.at[..., self.eos_id].set(
                jnp.where(finished, 0.0, log_probs[..., self.eos_id])
            )

            next_sum = scores[:, :, None] + log_probs
            if alpha > 0:
                lp = ((5.0 + (t + 1.0)) ** alpha) / (6.0**alpha)
                next_scores = next_sum / lp
            else:
                lp = 1.0
                next_scores = next_sum

            top_scores, top_idx = jax.lax.top_k(next_scores.reshape(b, k * v), k)
            parent = top_idx // v  # (B, k)
            token = top_idx % v

            gather = lambda arr: arr[batch_idx[:, None], parent]
            h_new = gather(h2)
            c_new = gather(c2)
            fin_new = gather(finished) | (token == self.eos_id)
            scores_new = top_scores * lp if alpha > 0 else top_scores

            logits_bkv = logits.reshape(b, k, v)
            return (token, scores_new, h_new, c_new, fin_new), (
                token,
                parent,
                logits_bkv,
            )

        init = (
            jnp.full((b, k), self.sos_id, dtype=jnp.int32),
            jnp.concatenate(
                [jnp.zeros((b, 1)), jnp.full((b, k - 1), NEG_INF)], axis=1
            ).astype(self.dtype),
            jnp.zeros((b, k, hdim), self.dtype),
            jnp.zeros((b, k, hdim), self.dtype),
            jnp.zeros((b, k), dtype=bool),
        )
        (_, final_scores, _, _, _), (tokens_s, parents_s, logits_s) = jax.lax.scan(
            step, init, jnp.arange(steps)
        )
        # tokens_s: (S, B, k); logits_s: (S, B, k, V)

        best = jnp.argmax(final_scores, axis=-1)  # (B,)

        def backtrack(carry_beam, xs):
            tok_t, par_t, log_t = xs
            token = tok_t[batch_idx, carry_beam]
            prev_beam = par_t[batch_idx, carry_beam]
            logit = log_t[batch_idx, prev_beam]
            return prev_beam, (token, logit)

        _, (tokens_rev, logits_rev) = jax.lax.scan(
            backtrack, best, (tokens_s, parents_s, logits_s), reverse=True
        )
        tokens = jnp.swapaxes(tokens_rev, 0, 1)  # (B, S)
        logits = jnp.swapaxes(logits_rev, 0, 1)  # (B, S, V)
        return logits, tokens
