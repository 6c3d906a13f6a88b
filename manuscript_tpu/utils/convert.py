"""PyTorch checkpoint → Flax variables converters.

Lets users of the reference load its released checkpoints
(``east_quad_23_05.pth``, ``trba_exp_1_64.pth``) into this framework. Layout
conventions:

* conv weight  (O, I, kh, kw) → (kh, kw, I, O)
* linear weight (O, I)        → (I, O)
* LSTM weight_ih (4H, I)      → (I, 4H); bias = bias_ih + bias_hh
  (torch packs gates [i; f; g; o] row-blocks — same order as our cell)
* BatchNorm weight/bias/running_mean/running_var → scale/bias/mean/var

Checkpoint-layout tolerance mirrors the reference loader (reference:
src/manuscript/recognizers/_trba/training/utils.py:43-146): accepts
``model_state`` / ``state_dict`` / raw dicts, strips ``module.`` / ``model.``
prefixes, and skips shape-mismatched tensors with a report (strict=False
semantics of east.py:130-133).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.resnet import STAGE_BLOCKS

# SEResNet31 stage plan: (planes, blocks, stride) — see models/seresnet31.py
SERESNET_PLAN = [(256, 1, 2), (256, 2, 1), (512, 5, 2), (512, 3, 1)]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth file into a flat {key: np.ndarray} dict (CPU, no grads).

    Safe by default: ``torch.load(weights_only=True)`` refuses arbitrary
    pickled objects. Checkpoints that embed non-tensor payloads (configs,
    schedulers) need ``MANUSCRIPT_TPU_UNSAFE_LOAD=1`` — an explicit opt-in,
    since full unpickling executes code from the file.
    """
    import os
    import warnings

    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as exc:
        if os.environ.get("MANUSCRIPT_TPU_UNSAFE_LOAD") != "1":
            raise RuntimeError(
                f"{path} is not loadable with weights_only=True ({exc}). "
                "If you trust this checkpoint, set MANUSCRIPT_TPU_UNSAFE_LOAD=1 "
                "to allow full unpickling (this can execute code from the file)."
            ) from exc
        warnings.warn(
            f"Loading {path} with weights_only=False (MANUSCRIPT_TPU_UNSAFE_LOAD=1): "
            "unpickling can execute arbitrary code from the checkpoint."
        )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("model_state", "state_dict", "model"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "detach"):
            for prefix in ("module.", "model."):
                if k.startswith(prefix):
                    k = k[len(prefix):]
            out[k] = v.detach().cpu().numpy()
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


class _TreeBuilder:
    """Collects params/batch_stats leaves and reports unconsumed keys."""

    def __init__(self, state: Dict[str, np.ndarray]):
        self.state = dict(state)
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}
        self.missing = []

    def _take(self, key: str) -> Optional[np.ndarray]:
        if key not in self.state:
            self.missing.append(key)
            return None
        return self.state.pop(key)

    def _set(self, tree: Dict, path: Tuple[str, ...], value) -> None:
        if value is None:
            return
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def conv(self, tkey: str, path: Tuple[str, ...], bias: bool = False):
        w = self._take(f"{tkey}.weight")
        self._set(self.params, path + ("kernel",), None if w is None else _conv(w))
        if bias:
            self._set(self.params, path + ("bias",), self._take(f"{tkey}.bias"))

    def linear(self, tkey: str, path: Tuple[str, ...], bias: bool = True):
        w = self._take(f"{tkey}.weight")
        self._set(self.params, path + ("kernel",), None if w is None else _linear(w))
        if bias:
            self._set(self.params, path + ("bias",), self._take(f"{tkey}.bias"))

    def bn(self, tkey: str, path: Tuple[str, ...]):
        self._set(self.params, path + ("scale",), self._take(f"{tkey}.weight"))
        self._set(self.params, path + ("bias",), self._take(f"{tkey}.bias"))
        self._set(self.batch_stats, path + ("mean",), self._take(f"{tkey}.running_mean"))
        self._set(self.batch_stats, path + ("var",), self._take(f"{tkey}.running_var"))
        self.state.pop(f"{tkey}.num_batches_tracked", None)

    def lstm(self, tkey: str, path: Tuple[str, ...], prefix: str, suffix: str = ""):
        """One direction of a torch nn.LSTM layer → our fused params."""
        w_ih = self._take(f"{tkey}.weight_ih_l0{suffix}")
        w_hh = self._take(f"{tkey}.weight_hh_l0{suffix}")
        b_ih = self._take(f"{tkey}.bias_ih_l0{suffix}")
        b_hh = self._take(f"{tkey}.bias_hh_l0{suffix}")
        if w_ih is not None:
            self._set(self.params, path + (f"{prefix}_kernel_ih",), _linear(w_ih))
        if w_hh is not None:
            self._set(self.params, path + (f"{prefix}_kernel_hh",), _linear(w_hh))
        if b_ih is not None and b_hh is not None:
            self._set(self.params, path + (f"{prefix}_bias",), b_ih + b_hh)

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


# ---------------------------------------------------------------------------
# EAST
# ---------------------------------------------------------------------------


def convert_east(
    state: Dict[str, np.ndarray], backbone: str = "resnet50"
) -> Dict[str, Any]:
    """Torch EAST state dict → Flax variables for models.east.EASTModel."""
    tb = _TreeBuilder(state)

    bb = "backbone.extractor"
    tb.conv(f"{bb}.conv1", ("backbone", "conv1"))
    tb.bn(f"{bb}.bn1", ("backbone", "bn1"))
    for stage_idx, n_blocks in enumerate(STAGE_BLOCKS[backbone], start=1):
        for b in range(n_blocks):
            src = f"{bb}.layer{stage_idx}.{b}"
            dst = ("backbone", f"layer{stage_idx}_{b}")
            for i in (1, 2, 3):
                tb.conv(f"{src}.conv{i}", dst + (f"conv{i}",))
                tb.bn(f"{src}.bn{i}", dst + (f"bn{i}",))
            if b == 0:
                tb.conv(f"{src}.downsample.0", dst + ("down_conv",))
                tb.bn(f"{src}.downsample.1", dst + ("down_bn",))

    for n in range(1, 5):
        src = f"decoder.block{n}"
        dst = ("decoder", f"block{n}")
        tb.conv(f"{src}.conv1x1.0", dst + ("conv1x1",), bias=True)
        tb.bn(f"{src}.conv1x1.1", dst + ("bn1",))
        tb.conv(f"{src}.conv3x3.0", dst + ("conv3x3",), bias=True)
        tb.bn(f"{src}.conv3x3.1", dst + ("bn2",))

    tb.conv("output_head.score_map", ("score_head",), bias=True)
    tb.conv("output_head.geo_map", ("geo_head",), bias=True)
    return tb.variables()


# ---------------------------------------------------------------------------
# TRBA
# ---------------------------------------------------------------------------


def convert_trba(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Torch TRBA state dict → Flax variables for models.trba.TRBAModel."""
    tb = _TreeBuilder(state)

    # SEResNet31 stem (torch Sequential indices 0,1,3,4)
    tb.conv("cnn.conv0.0", ("cnn", "stem_conv1"))
    tb.bn("cnn.conv0.1", ("cnn", "stem_bn1"))
    tb.conv("cnn.conv0.3", ("cnn", "stem_conv2"))
    tb.bn("cnn.conv0.4", ("cnn", "stem_bn2"))

    in_planes = 128
    for stage_idx, (planes, blocks, stride) in enumerate(SERESNET_PLAN, start=1):
        for b in range(blocks):
            src = f"cnn.layer{stage_idx}.{b}"
            dst = ("cnn", f"layer{stage_idx}_{b}")
            tb.conv(f"{src}.conv1", dst + ("conv1",))
            tb.bn(f"{src}.bn1", dst + ("bn1",))
            tb.conv(f"{src}.conv2", dst + ("conv2",))
            tb.bn(f"{src}.bn2", dst + ("bn2",))
            tb.linear(f"{src}.se.fc.0", dst + ("se", "fc1"), bias=False)
            tb.linear(f"{src}.se.fc.2", dst + ("se", "fc2"), bias=False)
            if b == 0 and (stride != 1 or in_planes != planes):
                tb.conv(f"{src}.downsample.0", dst + ("down_conv",))
                tb.bn(f"{src}.downsample.1", dst + ("down_bn",))
        in_planes = planes

    tb.conv("cnn.conv_out.0", ("cnn", "out_conv1"))
    tb.bn("cnn.conv_out.1", ("cnn", "out_bn1"))
    tb.conv("cnn.conv_out.3", ("cnn", "out_conv2"))
    tb.bn("cnn.conv_out.4", ("cnn", "out_bn2"))

    # Encoder BiLSTMs (torch enc_rnn.0 / enc_rnn.1)
    for i in (0, 1):
        dst = (f"enc_rnn{i + 1}",)
        tb.lstm(f"enc_rnn.{i}.rnn", dst, "fwd")
        tb.lstm(f"enc_rnn.{i}.rnn", dst, "bwd", suffix="_reverse")
        tb.linear(f"enc_rnn.{i}.linear", dst + ("proj",))

    # Attention decoder
    d = ("decoder",)
    cell = "attn.attention_cell"
    w = tb._take(f"{cell}.i2h.weight")
    tb._set(tb.params, d + ("i2h_kernel",), None if w is None else _linear(w))
    w = tb._take(f"{cell}.h2h.weight")
    tb._set(tb.params, d + ("h2h_kernel",), None if w is None else _linear(w))
    tb._set(tb.params, d + ("h2h_bias",), tb._take(f"{cell}.h2h.bias"))
    w = tb._take(f"{cell}.score.weight")
    tb._set(tb.params, d + ("score_kernel",), None if w is None else _linear(w))

    w_ih = tb._take(f"{cell}.rnn.weight_ih")
    w_hh = tb._take(f"{cell}.rnn.weight_hh")
    b_ih = tb._take(f"{cell}.rnn.bias_ih")
    b_hh = tb._take(f"{cell}.rnn.bias_hh")
    if w_ih is not None:
        tb._set(tb.params, d + ("lstm_kernel_ih",), _linear(w_ih))
    if w_hh is not None:
        tb._set(tb.params, d + ("lstm_kernel_hh",), _linear(w_hh))
    if b_ih is not None and b_hh is not None:
        tb._set(tb.params, d + ("lstm_bias",), b_ih + b_hh)

    w = tb._take("attn.generator.weight")
    tb._set(tb.params, d + ("gen_kernel",), None if w is None else _linear(w))
    tb._set(tb.params, d + ("gen_bias",), tb._take("attn.generator.bias"))

    return tb.variables()


def merge_converted(
    init_variables: Dict[str, Any], converted: Dict[str, Any], verbose: bool = True
) -> Dict[str, Any]:
    """Overlay converted leaves onto freshly-initialized variables, skipping
    shape mismatches (strict=False checkpoint-load semantics)."""
    import jax

    flat_init = dict(
        jax.tree_util.tree_flatten_with_path(init_variables)[0]
    )
    skipped, loaded = [], 0

    def overlay(init_node, conv_node, path=()):
        out = {}
        for k, v in init_node.items():
            if isinstance(v, dict):
                out[k] = overlay(v, conv_node.get(k, {}), path + (k,))
            else:
                cv = conv_node.get(k) if isinstance(conv_node, dict) else None
                if cv is not None and tuple(cv.shape) == tuple(np.shape(v)):
                    nonlocal loaded
                    loaded += 1
                    out[k] = np.asarray(cv, dtype=np.asarray(v).dtype)
                else:
                    if cv is not None:
                        skipped.append("/".join(path + (k,)))
                    out[k] = v
        return out

    result = {
        col: overlay(init_variables[col], converted.get(col, {}))
        for col in init_variables
    }
    if verbose and skipped:
        print(f"[convert] skipped {len(skipped)} shape-mismatched tensors: "
              f"{skipped[:5]}{'…' if len(skipped) > 5 else ''}")
    if verbose:
        print(f"[convert] loaded {loaded} tensors")
    return result
