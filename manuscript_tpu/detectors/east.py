"""EAST detector — user-facing wrapper with a fused device inference path.

API parity with the reference wrapper (reference:
src/manuscript/detectors/_east/infer.py:28-402): same constructor knobs
(target_size, expand ratios, score/iou thresholds, quantization,
axis-aligned output, anomaly filtering) and the same ``predict`` return dict
{"page", "vis_image", "score_map", "geo_map"}.

TPU-native pipeline per call:
  host: read + resize to target² uint8                       (1 transfer in)
  device (one jit): normalize → backbone/decoder/head → cell decode
         (threshold-any + quantized center sampling + vertex math)
  host: compact valid cells → C++ LANMS → expand → rescale → containment &
        anomaly filters → axis-align → Page                  (1 transfer out)

The only host↔device traffic is the input image and the fixed-shape decoded
candidate tensors; the per-pixel Python decode loop and Numba NMS of the
reference are replaced by the fused device program + native host kernel.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

import flax.serialization

from ..models.east import EASTModel
from ..ops.boxes import (
    expand_boxes,
    quad_bbox_int,
    remove_area_anomalies,
    remove_fully_contained,
    scale_boxes,
    to_axis_aligned,
)
from ..ops.decode import compact_candidates, compact_topk, decode_cells_jax
from ..ops.image import (
    delta_decode_device,
    delta_encode,
    detector_preprocess_host,
    fold_channels,
    read_image,
    unfold_channels_device,
)
from ..ops.lanms import locality_aware_nms
from ..ops.reading_order import reading_order_permutation
from ..types import Block, Page, Word
from ..utils.visualize import visualize_page

DEFAULT_CACHE = Path.home() / ".manuscript_tpu" / "east"


class EAST:
    def __init__(
        self,
        weights_path: Optional[Union[str, Path]] = None,
        device: Optional[str] = None,
        target_size: int = 1280,
        expand_ratio_w: float = 0.9,
        expand_ratio_h: float = 0.9,
        score_thresh: float = 0.6,
        iou_threshold: float = 0.2,
        score_geo_scale: float = 0.25,
        quantization: int = 2,
        axis_aligned_output: bool = True,
        remove_area_anomalies: bool = True,
        anomaly_sigma_threshold: float = 5.0,
        anomaly_min_box_count: int = 30,
        backbone: str = "resnet50",
        dtype: Any = jnp.bfloat16,
        max_candidates: int = 8192,
        nms: str = "host",
        max_boxes: int = 1024,
        allow_random_init: Optional[bool] = None,
        transport: str = "delta",
        fold_gray: bool = True,
        fold_tol: int = 0,
    ):
        """Text detector. ``dtype`` is the backbone compute dtype (bfloat16
        rides the MXU; score/geometry heads always emit float32).

        When no ``weights_path`` is given the released checkpoint is
        resolved from ``~/.manuscript_tpu/east`` or downloaded on first use
        (reference infer.py:96-107 semantics; see utils/weights.py). If no
        checkpoint can be resolved, construction fails unless
        ``allow_random_init=True`` (or MANUSCRIPT_TPU_ALLOW_RANDOM_INIT=1)
        explicitly permits untrained weights.
        """
        self.device = device  # API-compat; JAX owns placement
        self.target_size = target_size
        self.score_geo_scale = score_geo_scale
        self.expand_ratio_w = expand_ratio_w
        self.expand_ratio_h = expand_ratio_h
        self.score_thresh = score_thresh
        self.iou_threshold = iou_threshold
        self.quantization = quantization
        self.axis_aligned_output = axis_aligned_output
        self.remove_area_anomalies = remove_area_anomalies
        self.anomaly_sigma_threshold = anomaly_sigma_threshold
        self.anomaly_min_box_count = anomaly_min_box_count
        self.backbone = backbone
        self.max_candidates = max_candidates
        if nms not in ("host", "device"):
            raise ValueError(f"nms must be 'host' or 'device', got {nms!r}")
        self.nms = nms
        self.max_boxes = max_boxes
        if transport not in ("raw", "delta"):
            raise ValueError(
                f"transport must be 'raw' or 'delta', got {transport!r}"
            )
        # "delta": pages upload as a lossless mod-256 row delta that the
        # device program inverts — 3-4x less link time on the compressing
        # accelerator link (ops/image.py:delta_encode). fold_gray
        # additionally uploads grayscale-as-RGB pages as ONE channel
        # (lossless 3x fewer bytes — ops/image.py:fold_channels)
        self.transport = transport
        self.fold_gray = fold_gray
        self.fold_tol = fold_tol

        self.model = EASTModel(backbone=backbone, dtype=dtype)

        if weights_path is not None and not os.path.exists(str(weights_path)):
            raise FileNotFoundError(f"Weights not found: {weights_path}")
        if weights_path is None:
            weights_path = self._find_cached_weights()
        if weights_path is None:
            from ..utils.weights import fetch_artifact

            fetched = fetch_artifact("east")
            weights_path = str(fetched) if fetched is not None else None
        self.weights_path = weights_path
        if allow_random_init is None:
            from ..utils.weights import allow_random_init_default

            allow_random_init = allow_random_init_default()
        self.allow_random_init = allow_random_init
        from ..parallel.mesh import canonicalize_layout

        self.variables = canonicalize_layout(jax.device_put(self._load_variables()))
        self._infer_fn = None
        self._infer_fn_maps = None
        # absorb the link's one-time d2h handshake at construction, not at
        # the first predict() (it can take seconds on the tunnel)
        np.asarray(jax.device_put(np.zeros((16,), np.float32)))

    # ------------------------------------------------------------------

    def _find_cached_weights(self) -> Optional[str]:
        if not DEFAULT_CACHE.exists():
            return None
        for pattern in ("**/*.msgpack", "**/*.pth"):
            hits = sorted(DEFAULT_CACHE.glob(pattern))
            if hits:
                return str(hits[0])
        return None

    def _encode_transport(self, resized):
        if self.fold_gray:
            folded = fold_channels(resized, self.fold_tol)
            if folded is not None:
                resized = folded
        return (
            delta_encode(resized) if self.transport == "delta" else resized
        )

    def _encode_stack(self, pages):
        """Chunk encode: channel fold is all-or-none per stacked chunk
        (np.stack needs one shape)."""
        if self.fold_gray:
            folded = [fold_channels(p, self.fold_tol) for p in pages]
            if all(f is not None for f in folded):
                pages = folded
        if self.transport == "delta":
            pages = [delta_encode(p) for p in pages]
        return pages

    def _init_variables(self):
        # init on host CPU (fast tracing, no per-op tunnel dispatch), then a
        # single bulk transfer puts the params on the accelerator
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            return self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 64, 64, 3), jnp.float32),
            )

    def _load_variables(self):
        init_vars = self._init_variables()
        if self.weights_path is None:
            if not self.allow_random_init:
                raise RuntimeError(
                    "[EAST] no checkpoint could be resolved (cache miss and "
                    "download unavailable). Pass weights_path=, or pass "
                    "allow_random_init=True / set "
                    "MANUSCRIPT_TPU_ALLOW_RANDOM_INIT=1 to run with "
                    "untrained weights."
                )
            print(
                "[EAST] no checkpoint found — using random initialization. "
                "Pass weights_path= to load weights."
            )
            return init_vars
        if str(self.weights_path).endswith(".pth"):
            from ..utils.convert import convert_east, load_torch_state_dict, merge_converted

            state = load_torch_state_dict(str(self.weights_path))
            return merge_converted(init_vars, convert_east(state, self.backbone))
        with open(self.weights_path, "rb") as f:
            return flax.serialization.from_bytes(init_vars, f.read())

    def save(self, path: str) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(self.variables))

    # ------------------------------------------------------------------

    def _get_infer_fn(self, with_maps: bool):
        cached = self._infer_fn_maps if with_maps else self._infer_fn
        if cached is not None:
            return cached
        model = self.model
        q = self.quantization
        scale = 1.0 / self.score_geo_scale
        max_cands = self.max_candidates
        transport = self.transport

        @jax.jit
        def fn(variables, u8_img, score_thresh):
            if transport == "delta":
                u8_img = delta_decode_device(u8_img)
            if u8_img.ndim == 2:  # channel-folded upload
                u8_img = unfold_channels_device(u8_img)
            x = (u8_img.astype(model.dtype) / 255.0 - 0.5) / 0.5
            out = model.apply(variables, x[None])
            score = out["score"][0, :, :, 0]  # (H/4, W/4) f32
            geo = out["geometry"][0]  # (H/4, W/4, 8) f32
            quads, scores, valid = decode_cells_jax(
                score, geo, score_thresh, quantization=q, scale=scale
            )
            cands = compact_candidates(quads, scores, valid, max_cands)
            if with_maps:
                return cands, score, geo
            return cands

        if with_maps:
            self._infer_fn_maps = fn
        else:
            self._infer_fn = fn
        return fn

    def _get_device_nms_fn(self):
        """Fully-fused detector program: normalize → forward → decode →
        top-k → device LANMS → expansion/rescale/filters/axis-align. The
        only device→host transfer is the final (max_boxes, 9) tensor plus
        its validity mask (~36 KB)."""
        if getattr(self, "_device_nms_fn", None) is not None:
            return self._device_nms_fn

        from ..ops.lanms_jax import locality_aware_nms_jax
        from ..ops.postprocess_jax import postprocess_boxes_jax

        model = self.model
        q = self.quantization
        scale = 1.0 / self.score_geo_scale
        max_cands = self.max_candidates
        max_boxes = self.max_boxes
        expand_w, expand_h = self.expand_ratio_w, self.expand_ratio_h
        axis_aligned = self.axis_aligned_output
        remove_anoms = self.remove_area_anomalies
        anomaly_sigma = self.anomaly_sigma_threshold
        anomaly_min = self.anomaly_min_box_count
        transport = self.transport

        @jax.jit
        def fn(variables, u8_img, score_thresh, iou_threshold, scale_x, scale_y):
            if transport == "delta":
                u8_img = delta_decode_device(u8_img)
            if u8_img.ndim == 2:  # channel-folded upload
                u8_img = unfold_channels_device(u8_img)
            x = (u8_img.astype(model.dtype) / 255.0 - 0.5) / 0.5
            out = model.apply(variables, x[None])
            score = out["score"][0, :, :, 0]
            geo = out["geometry"][0]
            quads, scores, valid = decode_cells_jax(
                score, geo, score_thresh, quantization=q, scale=scale
            )
            cands = compact_candidates(quads, scores, valid, max_cands)
            boxes, count = locality_aware_nms_jax(
                cands, iou_threshold, max_out=max_boxes
            )
            return postprocess_boxes_jax(
                boxes,
                count,
                expand_w,
                expand_h,
                scale_x,
                scale_y,
                axis_aligned=axis_aligned,
                remove_anomalies=remove_anoms,
                anomaly_sigma=anomaly_sigma,
                anomaly_min_count=anomaly_min,
            )

        self._device_nms_fn = fn
        return fn

    def predict(
        self,
        img_or_path: Union[str, Path, np.ndarray],
        vis: bool = False,
        profile: bool = False,
        return_maps: bool = False,
        sort_reading_order: bool = False,
    ) -> Dict[str, Any]:
        """Detect text → {"page", "vis_image", "score_map", "geo_map"}."""
        img = read_image(img_or_path)
        resized = self._encode_transport(
            detector_preprocess_host(img, self.target_size)
        )
        orig_h, orig_w = img.shape[:2]

        if self.nms == "device" and not return_maps:
            t0 = time.time()
            fn = self._get_device_nms_fn()
            boxes_d, valid_d = fn(
                self.variables,
                jnp.asarray(resized),
                jnp.float32(self.score_thresh),
                jnp.float32(self.iou_threshold),
                jnp.float32(orig_w / self.target_size),
                jnp.float32(orig_h / self.target_size),
            )
            output_quads = np.asarray(boxes_d)[np.asarray(valid_d)]
            if profile:
                print(f"  Fused device detect (incl. NMS): {time.time() - t0:.3f}s")
                print(f"    Boxes out: {len(output_quads)}")
            return self._build_result(
                img, output_quads, vis, sort_reading_order, None, None, False
            )

        t0 = time.time()
        fn = self._get_infer_fn(with_maps=return_maps)
        if return_maps:
            cands_d, score_map_d, geo_map_d = fn(
                self.variables, jnp.asarray(resized), jnp.float32(self.score_thresh)
            )
        else:
            cands_d = fn(
                self.variables, jnp.asarray(resized), jnp.float32(self.score_thresh)
            )
            score_map_d = geo_map_d = None
        cands_np = np.asarray(cands_d)  # single compact d2h transfer
        if profile:
            print(f"  Model inference + decode: {time.time() - t0:.3f}s")

        t0 = time.time()
        candidates = compact_topk(cands_np)
        nms_quads = locality_aware_nms(candidates, self.iou_threshold)
        if profile:
            print(f"  NMS: {time.time() - t0:.3f}s")
            print(f"    Candidates: {len(candidates)}, after NMS: {len(nms_quads)}")

        expanded = expand_boxes(
            nms_quads, expand_w=self.expand_ratio_w, expand_h=self.expand_ratio_h
        )
        scaled = scale_boxes(expanded, self.target_size, orig_h, orig_w)

        processed = remove_fully_contained(scaled)
        if self.remove_area_anomalies:
            processed = remove_area_anomalies(
                processed,
                sigma_threshold=self.anomaly_sigma_threshold,
                min_box_count=self.anomaly_min_box_count,
            )
        output_quads = (
            to_axis_aligned(processed) if self.axis_aligned_output else processed
        )
        return self._build_result(
            img, output_quads, vis, sort_reading_order,
            score_map_d, geo_map_d, return_maps,
        )

    def _get_batch_fn(self, batch: int, mesh=None):
        """Batched page program: (B,H,W,3) u8 → per-page top-k candidates.
        With a ``mesh`` the page axis is sharded over its 'data' axis
        (weights replicated) — multi-chip detection, no collectives."""
        if getattr(self, "_batch_fns", None) is None:
            self._batch_fns = {}
        key = (batch, mesh)
        if key in self._batch_fns:
            return self._batch_fns[key]
        model = self.model
        q = self.quantization
        scale = 1.0 / self.score_geo_scale
        max_cands = self.max_candidates
        transport = self.transport

        def fn(variables, u8_imgs, score_thresh):
            if transport == "delta":
                u8_imgs = delta_decode_device(u8_imgs, axis=1)
            if u8_imgs.ndim == 3:  # channel-folded upload
                u8_imgs = unfold_channels_device(u8_imgs)
            x = (u8_imgs.astype(model.dtype) / 255.0 - 0.5) / 0.5
            out = model.apply(variables, x)
            scores = out["score"][..., 0]  # (B, h, w)
            geos = out["geometry"]  # (B, h, w, 8)

            def decode_one(s, g):
                quads, sc, valid = decode_cells_jax(
                    s, g, score_thresh, quantization=q, scale=scale
                )
                return compact_candidates(quads, sc, valid, max_cands)

            return jax.vmap(decode_one)(scores, geos)

        if mesh is None:
            fn = jax.jit(fn)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            rep = NamedSharding(mesh, P())
            dat = NamedSharding(mesh, P(DATA_AXIS))
            fn = jax.jit(fn, in_shardings=(rep, dat, rep), out_shardings=dat)

        self._batch_fns[key] = fn
        return fn

    def _mesh_variables(self, mesh):
        """Weights replicated over ``mesh`` (cached per mesh)."""
        if getattr(self, "_mesh_vars", None) is None:
            self._mesh_vars = {}
        if mesh not in self._mesh_vars:
            from ..parallel.mesh import replicate

            self._mesh_vars[mesh] = replicate(self.variables, mesh)
        return self._mesh_vars[mesh]

    def predict_batch(
        self,
        images,
        batch_size: int = 4,
        vis: bool = False,
        profile: bool = False,
        sort_reading_order: bool = False,
        mesh=None,
    ):
        """Detect over many pages with a batched device program (one forward
        per ``batch_size`` pages; partial chunks pad to the bucket). Returns
        a list of result dicts like ``predict``. ``mesh`` (a
        ``jax.sharding.Mesh``) shards each chunk's page axis over the mesh's
        'data' axis for multi-chip detection; ``batch_size`` is rounded up
        to a multiple of the data-axis size."""
        if mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            batch_size = max(n_data, -(-batch_size // n_data) * n_data)
        loaded = [read_image(im) for im in images]
        results = []

        # phase 1: dispatch every chunk's device program without syncing —
        # JAX queues them; the host then overlaps NMS/post-processing of
        # chunk i with the device executing chunk i+1. batch_size=1 reuses
        # predict()'s fused single-page program (shares its compile cache).
        pending = []
        if batch_size == 1:
            fn1 = self._get_infer_fn(with_maps=False)
            thresh = jnp.float32(self.score_thresh)
            for start, img in enumerate(loaded):
                resized = self._encode_transport(
                    detector_preprocess_host(img, self.target_size)
                )
                cands_d = fn1(self.variables, jnp.asarray(resized), thresh)
                pending.append(([img], 1, cands_d[None], start))
        else:
            fn = self._get_batch_fn(batch_size, mesh=mesh)
            variables = (
                self._mesh_variables(mesh) if mesh is not None else self.variables
            )
            for start in range(0, len(loaded), batch_size):
                chunk = loaded[start : start + batch_size]
                resized = np.stack(
                    self._encode_stack(
                        [
                            detector_preprocess_host(im, self.target_size)
                            for im in chunk
                        ]
                    )
                )
                n = resized.shape[0]
                if n < batch_size:
                    # pad shape follows the wire layout ((B,H,W) when the
                    # chunk channel-folded, (B,H,W,3) otherwise)
                    pad = np.zeros(
                        (batch_size - n, *resized.shape[1:]), np.uint8
                    )
                    resized = np.concatenate([resized, pad], axis=0)
                cands_d = fn(
                    variables,
                    resized,
                    jnp.float32(self.score_thresh),
                )
                pending.append((chunk, n, cands_d, start))

        # phase 2: sync + host post-process in order
        for chunk, n, cands_d, start in pending:
            t0 = time.time()
            cands_np = np.asarray(cands_d)[:n]
            if profile:
                print(
                    f"  Batched detect sync [{start}:{start + n}]: "
                    f"{time.time() - t0:.3f}s"
                )
            for img, cands in zip(chunk, cands_np):
                candidates = compact_topk(cands)
                nms_quads = locality_aware_nms(candidates, self.iou_threshold)
                expanded = expand_boxes(
                    nms_quads,
                    expand_w=self.expand_ratio_w,
                    expand_h=self.expand_ratio_h,
                )
                oh, ow = img.shape[:2]
                scaled = scale_boxes(expanded, self.target_size, oh, ow)
                processed = remove_fully_contained(scaled)
                if self.remove_area_anomalies:
                    processed = remove_area_anomalies(
                        processed,
                        sigma_threshold=self.anomaly_sigma_threshold,
                        min_box_count=self.anomaly_min_box_count,
                    )
                output_quads = (
                    to_axis_aligned(processed)
                    if self.axis_aligned_output
                    else processed
                )
                results.append(
                    self._build_result(
                        img, output_quads, vis, sort_reading_order, None, None, False
                    )
                )
        return results

    def _build_result(
        self, img, output_quads, vis, sort_reading_order,
        score_map_d, geo_map_d, return_maps,
    ) -> Dict[str, Any]:
        words = [
            Word(
                polygon=quad[:8].reshape(4, 2).tolist(),
                detection_confidence=float(np.clip(quad[8], 0.0, 1.0)),
            )
            for quad in output_quads
        ]

        if sort_reading_order and words:
            boxes = [
                quad_bbox_int(np.asarray(w.polygon, dtype=np.int32)) for w in words
            ]
            perm = reading_order_permutation(boxes)
            words = [words[i] for i in perm]

        page = Page(blocks=[Block(words=words)])
        vis_img = visualize_page(img, page, show_order=False) if vis else None

        return {
            "page": page,
            "vis_image": vis_img,
            "score_map": np.asarray(score_map_d) if return_maps else None,
            "geo_map": (
                np.asarray(geo_map_d).transpose(2, 0, 1) if return_maps else None
            ),
        }

    # ------------------------------------------------------------------

    @staticmethod
    def train(*args, **kwargs):
        """High-level training entrypoint; see train/east_train.py."""
        from ..train.east_train import train as _train

        return _train(*args, **kwargs)
