"""Converter coverage: synthetic torch-style state dicts (reference key
naming, correct shapes) must fill EVERY parameter and batch-stat leaf of our
Flax models — proving the key mapping is complete for real checkpoints.
Per-layer math conventions are covered by test_torch_parity.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from manuscript_tpu.models.east import EASTModel
from manuscript_tpu.models.trba import TRBAModel
from manuscript_tpu.models.resnet import STAGE_BLOCKS
from manuscript_tpu.utils.convert import (
    SERESNET_PLAN,
    convert_east,
    convert_trba,
    merge_converted,
)


def _bn(state, key, c):
    state[f"{key}.weight"] = np.random.randn(c).astype(np.float32)
    state[f"{key}.bias"] = np.random.randn(c).astype(np.float32)
    state[f"{key}.running_mean"] = np.random.randn(c).astype(np.float32)
    state[f"{key}.running_var"] = np.abs(np.random.randn(c)).astype(np.float32) + 0.5
    state[f"{key}.num_batches_tracked"] = np.array(1)


def _conv(state, key, o, i, k, bias=False):
    state[f"{key}.weight"] = np.random.randn(o, i, k, k).astype(np.float32) * 0.01
    if bias:
        state[f"{key}.bias"] = np.random.randn(o).astype(np.float32)


def _linear(state, key, o, i, bias=True):
    state[f"{key}.weight"] = np.random.randn(o, i).astype(np.float32) * 0.01
    if bias:
        state[f"{key}.bias"] = np.random.randn(o).astype(np.float32)


def _lstm(state, key, i, h, suffix=""):
    state[f"{key}.weight_ih_l0{suffix}"] = np.random.randn(4 * h, i).astype(np.float32) * 0.01
    state[f"{key}.weight_hh_l0{suffix}"] = np.random.randn(4 * h, h).astype(np.float32) * 0.01
    state[f"{key}.bias_ih_l0{suffix}"] = np.random.randn(4 * h).astype(np.float32)
    state[f"{key}.bias_hh_l0{suffix}"] = np.random.randn(4 * h).astype(np.float32)


def build_east_state(backbone="resnet50"):
    s = {}
    bb = "backbone.extractor"
    _conv(s, f"{bb}.conv1", 64, 3, 7)
    _bn(s, f"{bb}.bn1", 64)
    planes = 64
    in_ch = 64
    for stage, blocks in enumerate(STAGE_BLOCKS[backbone], start=1):
        for b in range(blocks):
            base = f"{bb}.layer{stage}.{b}"
            _conv(s, f"{base}.conv1", planes, in_ch if b == 0 else planes * 4, 1)
            _bn(s, f"{base}.bn1", planes)
            _conv(s, f"{base}.conv2", planes, planes, 3)
            _bn(s, f"{base}.bn2", planes)
            _conv(s, f"{base}.conv3", planes * 4, planes, 1)
            _bn(s, f"{base}.bn3", planes * 4)
            if b == 0:
                _conv(s, f"{base}.downsample.0", planes * 4, in_ch, 1)
                _bn(s, f"{base}.downsample.1", planes * 4)
        in_ch = planes * 4
        planes *= 2
    chans = [(2048, 512, 512), (512 + 1024, 256, 256), (256 + 512, 128, 128),
             (128 + 256, 64, 32)]
    for n, (cin, mid, cout) in enumerate(chans, start=1):
        base = f"decoder.block{n}"
        _conv(s, f"{base}.conv1x1.0", mid, cin, 1, bias=True)
        _bn(s, f"{base}.conv1x1.1", mid)
        s[f"{base}.conv3x3.0.weight"] = np.random.randn(cout, mid, 3, 3).astype(np.float32) * 0.01
        s[f"{base}.conv3x3.0.bias"] = np.random.randn(cout).astype(np.float32)
        _bn(s, f"{base}.conv3x3.1", cout)
    _conv(s, "output_head.score_map", 1, 32, 1, bias=True)
    _conv(s, "output_head.geo_map", 8, 32, 1, bias=True)
    return s


def build_trba_state(num_classes=194, hidden=256):
    s = {}
    _conv(s, "cnn.conv0.0", 64, 3, 3)
    _bn(s, "cnn.conv0.1", 64)
    _conv(s, "cnn.conv0.3", 128, 64, 3)
    _bn(s, "cnn.conv0.4", 128)
    in_planes = 128
    for stage, (planes, blocks, stride) in enumerate(SERESNET_PLAN, start=1):
        for b in range(blocks):
            base = f"cnn.layer{stage}.{b}"
            _conv(s, f"{base}.conv1", planes, in_planes if b == 0 else planes, 3)
            _bn(s, f"{base}.bn1", planes)
            _conv(s, f"{base}.conv2", planes, planes, 3)
            _bn(s, f"{base}.bn2", planes)
            _linear(s, f"{base}.se.fc.0", planes // 16, planes, bias=False)
            _linear(s, f"{base}.se.fc.2", planes, planes // 16, bias=False)
            if b == 0 and (stride != 1 or in_planes != planes):
                _conv(s, f"{base}.downsample.0", planes, in_planes, 1)
                _bn(s, f"{base}.downsample.1", planes)
        in_planes = planes
    _conv(s, "cnn.conv_out.0", 512, 512, 2)
    _bn(s, "cnn.conv_out.1", 512)
    _conv(s, "cnn.conv_out.3", 512, 512, 2)
    _bn(s, "cnn.conv_out.4", 512)
    _lstm(s, "enc_rnn.0.rnn", 512, hidden)
    _lstm(s, "enc_rnn.0.rnn", 512, hidden, "_reverse")
    _linear(s, "enc_rnn.0.linear", hidden, 2 * hidden)
    _lstm(s, "enc_rnn.1.rnn", hidden, hidden)
    _lstm(s, "enc_rnn.1.rnn", hidden, hidden, "_reverse")
    _linear(s, "enc_rnn.1.linear", hidden, 2 * hidden)
    _linear(s, "attn.attention_cell.i2h", hidden, hidden, bias=False)
    _linear(s, "attn.attention_cell.h2h", hidden, hidden)
    _linear(s, "attn.attention_cell.score", 1, hidden, bias=False)
    s["attn.attention_cell.rnn.weight_ih"] = np.random.randn(
        4 * hidden, hidden + num_classes
    ).astype(np.float32) * 0.01
    s["attn.attention_cell.rnn.weight_hh"] = np.random.randn(
        4 * hidden, hidden
    ).astype(np.float32) * 0.01
    s["attn.attention_cell.rnn.bias_ih"] = np.random.randn(4 * hidden).astype(np.float32)
    s["attn.attention_cell.rnn.bias_hh"] = np.random.randn(4 * hidden).astype(np.float32)
    _linear(s, "attn.generator", num_classes, hidden)
    return s


def _count_leaves(tree):
    return len(jax.tree_util.tree_leaves(tree))


def _count_loaded(init_tree, merged_tree):
    """Leaves whose values changed (i.e. got overwritten by the convert)."""
    init_leaves = jax.tree_util.tree_leaves(init_tree)
    merged_leaves = jax.tree_util.tree_leaves(merged_tree)
    changed = 0
    for a, b in zip(init_leaves, merged_leaves):
        if np.asarray(a).shape == np.asarray(b).shape and not np.array_equal(
            np.asarray(a), np.asarray(b)
        ):
            changed += 1
    return changed


@pytest.mark.parametrize("backbone", ["resnet50", "resnet101"])
def test_east_conversion_full_coverage(backbone):
    state = build_east_state(backbone)
    converted = convert_east(dict(state), backbone)

    model = EASTModel(backbone=backbone)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    merged = merge_converted(init_vars, converted, verbose=False)

    total = _count_leaves(init_vars)
    loaded = _count_loaded(init_vars, merged)
    assert loaded == total, f"{loaded}/{total} leaves loaded"

    # converted model must run
    out = model.apply(merged, jnp.zeros((1, 32, 32, 3)))
    assert np.all(np.isfinite(np.asarray(out["score"])))


def test_trba_conversion_full_coverage():
    state = build_trba_state()
    converted = convert_trba(dict(state))

    model = TRBAModel(num_classes=194, hidden_size=256)
    init_vars = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64, 3)),
        jnp.zeros((1, 5), jnp.int32),
    )
    merged = merge_converted(init_vars, converted, verbose=False)

    total = _count_leaves(init_vars)
    loaded = _count_loaded(init_vars, merged)
    assert loaded == total, f"{loaded}/{total} leaves loaded"

    logits = model.apply(merged, jnp.zeros((1, 32, 64, 3)), jnp.zeros((1, 5), jnp.int32))
    assert np.all(np.isfinite(np.asarray(logits)))


def test_shape_mismatch_skipped():
    state = build_trba_state()
    state["attn.generator.weight"] = np.zeros((7, 7), np.float32)  # wrong shape
    converted = convert_trba(dict(state))
    model = TRBAModel(num_classes=194, hidden_size=256)
    init_vars = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64, 3)),
        jnp.zeros((1, 5), jnp.int32),
    )
    merged = merge_converted(init_vars, converted, verbose=False)
    # mismatched tensor keeps its init value
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["decoder"]["gen_kernel"]),
        np.asarray(init_vars["params"]["decoder"]["gen_kernel"]),
    )
