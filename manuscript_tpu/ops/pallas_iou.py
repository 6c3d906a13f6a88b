"""Pallas TPU kernel: tiled pairwise quad-IoU matrix.

The device NMS's dominant cost is the (M, M) polygon-IoU matrix (XLA
version: 171 ms at M=1024 on v5e after the gather-free rewrite). This
kernel computes IoU tiles entirely in VMEM with Mosaic-friendly building
blocks only:

* repetition-padded polygons → previous-vertex lookup is a static roll;
* the Sutherland–Hodgman emit compaction uses a lower-triangular matmul
  for the running position (no cumsum primitive) and an unrolled 8-slot
  masked-sum scatter (no dynamic indexing);
* the 4 clip edges and 8 output slots are fully unrolled Python loops.

Grid: (M/TM, N/TN); each instance computes a (TM, TN) IoU tile over
P = TM·TN flattened pairs.

STATUS (round 4, recorded in BASELINE.md "Pallas A/B verdict"): DEMOTED to
an interpret-mode-tested reference implementation. On this environment's
experimental `axon` tunnel backend the Mosaic compile+first-run never
completed (>9.5 min, three attempts) while the XLA formulation compiled in
28.5 s — `use_pallas` stays False until a backend where Mosaic works;
`examples/pallas_bench.py` is the ready-made A/B to re-decide there.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOTS = 8
_EMITS = 2 * _SLOTS


def _tile_kernel(a_ref, b_ref, tril_ref, out_ref, *, tm: int, tn: int):
    # tril_ref: strictly-lower-triangular (8, 8) ones for prefix sums
    a = a_ref[:]  # (TM, 4, 2)
    b = b_ref[:]  # (TN, 4, 2)
    p = tm * tn
    f32 = jnp.float32

    # pair expansion: q1[p] = a[p // TN], q2[p] = b[p % TN]
    q1 = jnp.repeat(a, tn, axis=0)  # (P, 4, 2)
    q2 = jnp.tile(b, (tm, 1, 1))  # (P, 4, 2)

    # repetition-pad subject polygons to 8 slots
    polys = jnp.concatenate([q1, jnp.repeat(q1[:, 3:4], _SLOTS - 4, axis=1)], axis=1)
    counts = jnp.full((p,), 4, jnp.int32)

    strict_tril = tril_ref[:]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (p, _SLOTS), 1)

    for e in range(4):
        ca = q2[:, e]  # (P, 2)
        cb = q2[:, (e + 1) % 4]
        curr = polys
        prev = pltpu.roll(polys, 1, 1)

        ab_x = (cb - ca)[:, 0:1]  # (P, 1)
        ab_y = (cb - ca)[:, 1:2]
        side_curr = ab_x * (curr[..., 1] - ca[:, 1:2]) - ab_y * (
            curr[..., 0] - ca[:, 0:1]
        )
        side_prev = ab_x * (prev[..., 1] - ca[:, 1:2]) - ab_y * (
            prev[..., 0] - ca[:, 0:1]
        )
        curr_in = side_curr >= 0
        prev_in = side_prev >= 0
        is_dup = jnp.all(curr == prev, axis=-1)

        # line intersection prev→curr with edge ca→cb
        d1 = curr - prev
        denom = d1[..., 0] * ab_y[:, 0:1] - d1[..., 1] * ab_x[:, 0:1]
        ca_rel = ca[:, None, :] - prev
        t = (ca_rel[..., 0] * ab_y[:, 0:1] - ca_rel[..., 1] * ab_x[:, 0:1]) / jnp.where(
            denom == 0, 1.0, denom
        )
        inter = prev + t[..., None] * d1
        # boolean minor-dim inserts don't lower in Mosaic → f32 blends
        dm = (denom == 0).astype(f32)[..., None]
        inter = prev * dm + inter * (1.0 - dm)

        not_dup = 1.0 - is_dup.astype(f32)
        emit_inter_f = (curr_in ^ prev_in).astype(f32) * not_dup  # (P, 8)
        emit_curr_f = curr_in.astype(f32) * not_dup  # (P, 8)

        # per-slot emit positions without flattening to 16 (Mosaic can't
        # shape-cast an interleave): prefix[j] = emits before slot j via a
        # strictly-lower-triangular matmul; intersection emits first.
        per_slot = emit_inter_f + emit_curr_f  # (P, 8)
        prefix = jax.lax.dot_general(
            per_slot, strict_tril,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # (P, 8): emits in slots < j
        pos_inter = prefix
        pos_curr = prefix + emit_inter_f

        # unrolled scatter: output slot o collects its emit by position match
        new_cols = []
        for o in range(_SLOTS):
            fo = float(o)
            sel_i = ((pos_inter == fo).astype(f32) * emit_inter_f)[..., None]
            sel_c = ((pos_curr == fo).astype(f32) * emit_curr_f)[..., None]
            new_cols.append(jnp.sum(sel_i * inter + sel_c * curr, axis=1))
        new_polys = jnp.stack(new_cols, axis=1)  # (P, 8, 2)
        counts = jnp.sum(per_slot, axis=1).astype(jnp.int32)

        # repetition-fill the dead slots with the last live vertex
        live_f = (slot_iota < counts[:, None]).astype(f32)[..., None]
        is_last_f = (slot_iota == (counts - 1)[:, None]).astype(f32)[..., None]
        last_v = jnp.sum(new_polys * is_last_f, axis=1, keepdims=True)
        polys = new_polys * live_f + last_v * (1.0 - live_f)

    nxt = pltpu.roll(polys, _SLOTS - 1, 1)
    cross = polys[..., 0] * nxt[..., 1] - nxt[..., 0] * polys[..., 1]
    inter_area = jnp.abs(jnp.sum(cross, axis=1)) / 2.0
    inter_area = jnp.where(counts > 2, inter_area, 0.0)

    def quad_area(q):
        x, y = q[..., 0], q[..., 1]
        xn = pltpu.roll(x, 3, 1)
        yn = pltpu.roll(y, 3, 1)
        return jnp.abs(jnp.sum(x * yn - xn * y, axis=-1)) / 2.0

    union = quad_area(q1) + quad_area(q2) - inter_area
    iou = jnp.where(union > 0, inter_area / union, 0.0)
    out_ref[:] = iou.reshape(tm, tn)


@partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def pallas_quad_iou_matrix(
    a: jnp.ndarray,  # (M, 4, 2)
    b: jnp.ndarray,  # (N, 4, 2)
    tm: int = 32,
    tn: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pairwise quad IoU (M, N) via VMEM tile kernels. M % tm == N % tn == 0."""
    m, n = a.shape[0], b.shape[0]
    assert m % tm == 0 and n % tn == 0, (m, n, tm, tn)
    kernel = partial(_tile_kernel, tm=tm, tn=tn)
    return pl.pallas_call(
        kernel,
        grid=(m // tm, n // tn),
        in_specs=[
            pl.BlockSpec((tm, 4, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 4, 2), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SLOTS, _SLOTS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(
        a.astype(jnp.float32),
        b.astype(jnp.float32),
        jnp.asarray(np.tril(np.ones((_SLOTS, _SLOTS), np.float32), k=-1)),
    )
