"""Numerical parity of layout conventions vs PyTorch primitives.

These pin down every conversion rule used by utils/convert.py (conv layout,
linear transpose, LSTM gate packing, BN statistics) so a real reference
checkpoint converts bit-faithfully. CPU-only, tiny shapes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402

from manuscript_tpu.models.rnn import BiLSTM, lstm_cell_step, lstm_scan  # noqa: E402
from manuscript_tpu.utils.convert import _conv, _linear  # noqa: E402

RTOL, ATOL = 1e-4, 1e-5


def t2n(t):
    return t.detach().numpy()


class TestConvBN:
    def test_conv3x3_stride2(self):
        tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=True)
        x = torch.randn(2, 3, 9, 9)
        ref = t2n(tconv(x))

        fconv = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        variables = {
            "params": {
                "kernel": _conv(t2n(tconv.weight)),
                "bias": t2n(tconv.bias),
            }
        }
        got = fconv.apply(variables, jnp.asarray(t2n(x).transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=RTOL, atol=ATOL
        )

    def test_conv7x7_stride2_pad3(self):
        tconv = torch.nn.Conv2d(3, 4, 7, stride=2, padding=3, bias=False)
        x = torch.randn(1, 3, 16, 16)
        ref = t2n(tconv(x))
        fconv = nn.Conv(
            4, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False
        )
        got = fconv.apply(
            {"params": {"kernel": _conv(t2n(tconv.weight))}},
            jnp.asarray(t2n(x).transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=RTOL, atol=ATOL
        )

    def test_batchnorm_eval(self):
        tbn = torch.nn.BatchNorm2d(6)
        tbn.weight.data = torch.randn(6)
        tbn.bias.data = torch.randn(6)
        tbn.running_mean = torch.randn(6)
        tbn.running_var = torch.rand(6) + 0.5
        tbn.eval()
        x = torch.randn(2, 6, 4, 4)
        ref = t2n(tbn(x))

        fbn = nn.BatchNorm(use_running_average=True, epsilon=1e-5, momentum=0.9)
        variables = {
            "params": {"scale": t2n(tbn.weight), "bias": t2n(tbn.bias)},
            "batch_stats": {
                "mean": t2n(tbn.running_mean),
                "var": t2n(tbn.running_var),
            },
        }
        got = fbn.apply(variables, jnp.asarray(t2n(x).transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=RTOL, atol=ATOL
        )

    def test_conv2x2_stride21_pad01(self):
        # SEResNet31 conv_out first conv: kernel 2, stride (2,1), pad (0,1)
        tconv = torch.nn.Conv2d(5, 7, 2, stride=(2, 1), padding=(0, 1), bias=False)
        x = torch.randn(1, 5, 8, 12)
        ref = t2n(tconv(x))
        fconv = nn.Conv(
            7, (2, 2), strides=(2, 1), padding=[(0, 0), (1, 1)], use_bias=False
        )
        got = fconv.apply(
            {"params": {"kernel": _conv(t2n(tconv.weight))}},
            jnp.asarray(t2n(x).transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=RTOL, atol=ATOL
        )

    def test_maxpool3x3_s2_p1(self):
        tp = torch.nn.MaxPool2d(3, stride=2, padding=1)
        x = torch.randn(1, 4, 15, 15)
        ref = t2n(tp(x))
        xj = jnp.asarray(t2n(x).transpose(0, 2, 3, 1))
        xj = jnp.pad(xj, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        got = nn.max_pool(xj, (3, 3), strides=(2, 2), padding="VALID")
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=RTOL, atol=ATOL
        )


class TestLSTM:
    def test_unidirectional_lstm(self):
        tl = torch.nn.LSTM(5, 7, batch_first=True)
        x = torch.randn(3, 11, 5)
        ref, _ = tl(x)
        got = lstm_scan(
            _linear(t2n(tl.weight_ih_l0)),
            _linear(t2n(tl.weight_hh_l0)),
            t2n(tl.bias_ih_l0) + t2n(tl.bias_hh_l0),
            jnp.asarray(t2n(x)),
        )
        np.testing.assert_allclose(np.asarray(got), t2n(ref), rtol=RTOL, atol=ATOL)

    def test_bidirectional_lstm_with_proj(self):
        hidden, out_dim = 6, 6
        tl = torch.nn.LSTM(4, hidden, bidirectional=True, batch_first=True)
        tlin = torch.nn.Linear(2 * hidden, out_dim)
        x = torch.randn(2, 9, 4)
        h, _ = tl(x)
        ref = t2n(tlin(h))

        m = BiLSTM(hidden_size=hidden, output_size=out_dim)
        variables = {
            "params": {
                "fwd_kernel_ih": _linear(t2n(tl.weight_ih_l0)),
                "fwd_kernel_hh": _linear(t2n(tl.weight_hh_l0)),
                "fwd_bias": t2n(tl.bias_ih_l0) + t2n(tl.bias_hh_l0),
                "bwd_kernel_ih": _linear(t2n(tl.weight_ih_l0_reverse)),
                "bwd_kernel_hh": _linear(t2n(tl.weight_hh_l0_reverse)),
                "bwd_bias": t2n(tl.bias_ih_l0_reverse) + t2n(tl.bias_hh_l0_reverse),
                "proj": {"kernel": _linear(t2n(tlin.weight)), "bias": t2n(tlin.bias)},
            }
        }
        got = m.apply(variables, jnp.asarray(t2n(x)))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=RTOL, atol=ATOL)

    def test_lstm_cell(self):
        cell = torch.nn.LSTMCell(5, 7)
        x = torch.randn(3, 5)
        h0 = torch.randn(3, 7)
        c0 = torch.randn(3, 7)
        h_ref, c_ref = cell(x, (h0, c0))

        x_proj = jnp.asarray(t2n(x)) @ _linear(t2n(cell.weight_ih)) + (
            t2n(cell.bias_ih) + t2n(cell.bias_hh)
        )
        h_got, c_got = lstm_cell_step(
            jnp.asarray(_linear(t2n(cell.weight_hh))),
            x_proj,
            jnp.asarray(t2n(h0)),
            jnp.asarray(t2n(c0)),
        )
        np.testing.assert_allclose(np.asarray(h_got), t2n(h_ref), rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(np.asarray(c_got), t2n(c_ref), rtol=RTOL, atol=ATOL)


class TestAttentionCellParity:
    def test_full_attention_step(self):
        """One decoder step vs a hand-built torch equivalent of the
        reference's AttentionCell math."""
        b, t_enc, e_dim, h_dim, v = 2, 6, 8, 8, 10
        i2h = torch.nn.Linear(e_dim, h_dim, bias=False)
        h2h = torch.nn.Linear(h_dim, h_dim)
        score = torch.nn.Linear(h_dim, 1, bias=False)
        rnn = torch.nn.LSTMCell(e_dim + v, h_dim)

        enc = torch.randn(b, t_enc, e_dim)
        h0 = torch.randn(b, h_dim)
        c0 = torch.randn(b, h_dim)
        onehot = torch.nn.functional.one_hot(
            torch.tensor([1, 3]), v
        ).float()

        e = score(torch.tanh(i2h(enc) + h2h(h0).unsqueeze(1)))
        alpha = torch.softmax(e, dim=1)
        ctx = torch.bmm(alpha.transpose(1, 2), enc).squeeze(1)
        h_ref, c_ref = rnn(torch.cat([ctx, onehot], 1), (h0, c0))

        from manuscript_tpu.models.attention import AttentionDecoder

        dec = AttentionDecoder(enc_dim=e_dim, hidden_size=h_dim, num_classes=v)
        variables = dec.init(
            jax.random.PRNGKey(0),
            jnp.zeros((b, t_enc, e_dim)),
            jnp.zeros((b, 3), dtype=jnp.int32),
        )
        p = dict(variables["params"])
        p.update(
            i2h_kernel=_linear(t2n(i2h.weight)),
            h2h_kernel=_linear(t2n(h2h.weight)),
            h2h_bias=t2n(h2h.bias),
            score_kernel=_linear(t2n(score.weight)),
            lstm_kernel_ih=_linear(t2n(rnn.weight_ih)),
            lstm_kernel_hh=_linear(t2n(rnn.weight_hh)),
            lstm_bias=t2n(rnn.bias_ih) + t2n(rnn.bias_hh),
        )

        def one_step(params, enc_j, h_j, c_j, onehot_j):
            proj_enc = enc_j @ params["i2h_kernel"]
            bound = dec.bind({"params": params})
            return bound._cell(h_j, c_j, enc_j, proj_enc, onehot_j)

        h_got, c_got, _ = one_step(
            p,
            jnp.asarray(t2n(enc)),
            jnp.asarray(t2n(h0)),
            jnp.asarray(t2n(c0)),
            jnp.asarray(t2n(onehot)),
        )
        np.testing.assert_allclose(np.asarray(h_got), t2n(h_ref), rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(np.asarray(c_got), t2n(c_ref), rtol=RTOL, atol=ATOL)
