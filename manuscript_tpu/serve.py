"""Production HTTP serving for the OCR pipeline (stdlib-only).

The reference has no serving story beyond a Dockerfile CMD that runs a demo
script (reference Dockerfile:32); production users re-wrap it themselves.
This module is the TPU-native equivalent of that missing layer:

* **Micro-batching** — concurrent requests coalesce into one fused device
  program of up to ``Pipeline.batch_pages`` pages (one upload, one dispatch,
  one fetch per chunk — the same chunked program ``predict_many`` rides).
  On a link-bound chip this is the difference between per-request dispatch
  overhead and amortized steady-state throughput (BASELINE.md link
  characterization: ~12 ms dispatch + ~35 ms fetch per device call).
* **One inference thread** — the device program is driven by a single
  worker; HTTP threads only enqueue and wait. No lock contention on the
  JAX runtime, no interleaved transfers fighting for the link.
* **Endpoints** — ``POST /ocr`` (raw image body → JSON page + text),
  ``GET /healthz`` (liveness + backend), ``GET /metrics``
  (Prometheus-style counters).

Usage::

    python -m manuscript_tpu serve --port 8000            # real models
    python -m manuscript_tpu serve --n-devices 4          # multi-chip mesh
    OCRServer(pipeline, port=8000).serve_forever()          # embedded

The handler is pipeline-agnostic (same duck-typed contract as ``Pipeline``):
anything with ``predict``/``process_batch``/``get_text`` serves.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional

import numpy as np


@dataclass
class _Job:
    image: np.ndarray
    mode_ok: bool = True
    done: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Optional[str] = None
    # set by the HTTP thread when its request timed out/disconnected: the
    # batcher drops the job instead of spending device time on it
    abandoned: bool = False


class _Metrics:
    def __init__(self):
        self.lock = threading.Lock()
        self.requests_total = 0
        self.pages_total = 0
        self.errors_total = 0
        self.rejected_total = 0
        self.timeouts_total = 0
        self.batch_count = 0
        self.busy_seconds = 0.0
        self.started = time.time()

    def render(self) -> str:
        with self.lock:
            up = time.time() - self.started
            lines = [
                "# TYPE ocr_requests_total counter",
                f"ocr_requests_total {self.requests_total}",
                "# TYPE ocr_pages_total counter",
                f"ocr_pages_total {self.pages_total}",
                "# TYPE ocr_errors_total counter",
                f"ocr_errors_total {self.errors_total}",
                "# TYPE ocr_rejected_total counter",
                f"ocr_rejected_total {self.rejected_total}",
                "# TYPE ocr_timeouts_total counter",
                f"ocr_timeouts_total {self.timeouts_total}",
                "# TYPE ocr_batches_total counter",
                f"ocr_batches_total {self.batch_count}",
                "# TYPE ocr_device_busy_seconds counter",
                f"ocr_device_busy_seconds {self.busy_seconds:.3f}",
                "# TYPE ocr_mean_batch_fill gauge",
                "ocr_mean_batch_fill "
                f"{(self.pages_total / self.batch_count) if self.batch_count else 0.0:.3f}",
                "# TYPE ocr_uptime_seconds gauge",
                f"ocr_uptime_seconds {up:.1f}",
            ]
        return "\n".join(lines) + "\n"


class OCRServer:
    """HTTP front-end over a Pipeline-contract object with micro-batching.

    ``batch_wait_ms`` bounds the extra latency a lone request pays waiting
    for batch-mates; a full batch dispatches immediately.

    ``max_queue`` bounds the admission queue: when it is full new requests
    are rejected with 429 (+Retry-After) instead of growing an unbounded
    backlog — backpressure the client can act on. ``request_timeout_s``
    bounds how long a request waits end-to-end; on expiry the client gets
    504 and the job is abandoned (the batcher skips it if it is still
    queued, so no device time is spent on a caller that already left).
    """

    def __init__(
        self,
        pipeline,
        host: str = "0.0.0.0",
        port: int = 8000,
        batch_pages: Optional[int] = None,
        batch_wait_ms: float = 25.0,
        max_body_bytes: int = 64 * 1024 * 1024,
        max_queue: int = 64,
        request_timeout_s: float = 120.0,
    ):
        self.pipeline = pipeline
        self.batch_pages = int(
            batch_pages
            if batch_pages is not None
            else getattr(pipeline, "batch_pages", None) or 4
        )
        self.batch_wait_s = batch_wait_ms / 1e3
        self.max_body_bytes = max_body_bytes
        self.request_timeout_s = request_timeout_s
        self.metrics = _Metrics()
        self._queue: "queue.Queue[_Job]" = queue.Queue(maxsize=max_queue)
        self._submit_lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = threading.Thread(
            target=self._drain_loop, name="ocr-batcher", daemon=True
        )
        # pipelined serving (VERDICT r4 task 3): when the pipeline exposes
        # the async start_batch/finish_batch pair, the batcher thread only
        # assembles + STARTS batches (host prep + device dispatch) and a
        # second thread finishes them — so batch N+1's decode/resize/upload
        # overlaps batch N's device compute and result fetch, the same
        # overlap predict_many has internally. Duck-typed pipelines without
        # the pair keep the serial _run_batch path. The bounded in-flight
        # queue (1 started batch waiting + 1 finishing) applies gentle
        # backpressure to the batcher instead of growing device queues.
        self._pipelined = hasattr(pipeline, "start_batch") and hasattr(
            pipeline, "finish_batch"
        )
        self._inflight: "queue.Queue[tuple]" = queue.Queue(maxsize=1)
        self._finisher = threading.Thread(
            target=self._finish_loop, name="ocr-finisher", daemon=True
        )

        server = self

        class Handler(BaseHTTPRequestHandler):
            # quiet default request logging; metrics carry the counters
            def log_message(self, fmt, *args):  # noqa: D102
                pass

            def _send(self, code: int, body: bytes, ctype: str,
                      headers=None):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)

            def _send_json(self, code: int, obj, headers=None) -> None:
                self._send(
                    code,
                    json.dumps(obj).encode("utf-8"),
                    "application/json",
                    headers=headers,
                )

            def do_GET(self):  # noqa: N802
                if self.path.startswith("/healthz"):
                    self._send_json(200, server.health())
                elif self.path.startswith("/metrics"):
                    self._send(
                        200,
                        server.metrics.render().encode("utf-8"),
                        "text/plain; version=0.0.4",
                    )
                else:
                    self._send_json(404, {"error": "not found"})

            def do_POST(self):  # noqa: N802
                if not self.path.startswith("/ocr"):
                    self._send_json(404, {"error": "not found"})
                    return
                length = int(self.headers.get("Content-Length") or 0)
                if length <= 0:
                    self._send_json(400, {"error": "empty body"})
                    return
                if length > server.max_body_bytes:
                    self._send_json(413, {"error": "body too large"})
                    return
                body = self.rfile.read(length)
                try:
                    img = server.decode_image(body)
                except Exception as exc:
                    server._count_error()
                    self._send_json(400, {"error": f"bad image: {exc}"})
                    return
                t0 = time.time()
                try:
                    job = server.submit(img)
                except queue.Full:
                    with server.metrics.lock:
                        server.metrics.rejected_total += 1
                    self._send_json(
                        429,
                        {"error": "queue full, retry later"},
                        headers={"Retry-After": "1"},
                    )
                    return
                if not job.done.wait(server.request_timeout_s):
                    job.abandoned = True
                    with server.metrics.lock:
                        server.metrics.timeouts_total += 1
                    self._send_json(
                        504,
                        {"error": "request timed out in queue/inference"},
                    )
                    return
                if job.error is not None:
                    server._count_error()
                    self._send_json(500, {"error": job.error})
                    return
                page = job.result
                self._send_json(
                    200,
                    {
                        "seconds": round(time.time() - t0, 4),
                        "text": server.pipeline.get_text(page),
                        "page": page.model_dump(),
                    },
                )

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]

    # ------------------------------------------------------------------

    @staticmethod
    def decode_image(body: bytes) -> np.ndarray:
        """Decode a request body into an RGB uint8 array.

        Two wire formats, sniffed by magic bytes:

        * any PIL-decodable image (PNG/JPEG/TIFF/...) — the interchange
          path;
        * a raw ``.npy`` array (uint8, HxW or HxWx3) — the production
          fast path: a page-sized JPEG costs the host tens of ms to
          decode, which on a one-core frontend caps serving below what
          the device sustains; ``np.save`` bytes cost ~0.
        """
        if body[:6] == b"\x93NUMPY":
            arr = np.load(io.BytesIO(body), allow_pickle=False)
            if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
                raise ValueError(
                    f"npy body must be uint8 HxW[x3], got "
                    f"{arr.dtype} ndim={arr.ndim}"
                )
            if arr.ndim == 2:
                arr = np.repeat(arr[:, :, None], 3, axis=2)
            elif arr.shape[2] == 4:
                arr = arr[:, :, :3]
            elif arr.shape[2] != 3:
                raise ValueError(f"npy body has {arr.shape[2]} channels")
            return np.ascontiguousarray(arr)
        from PIL import Image

        img = Image.open(io.BytesIO(body))
        return np.asarray(img.convert("RGB"))

    def health(self) -> dict:
        try:
            import jax

            backend = jax.default_backend()
        except Exception:
            backend = "unknown"
        return {
            "status": "ok",
            "backend": backend,
            "batch_pages": self.batch_pages,
            "queue_depth": self._queue.qsize(),
        }

    def submit(self, image: np.ndarray) -> _Job:
        """Enqueue one page. Raises ``queue.Full`` when the bounded
        admission queue is at capacity (the HTTP layer maps it to 429)."""
        job = _Job(image=image)
        with self._submit_lock:
            try:
                self._queue.put_nowait(job)
            except queue.Full:
                # the backlog may be entirely abandoned jobs (a timeout
                # burst while the worker was inside a long batch) — those
                # only leave the queue when the batcher assembles its next
                # batch, so purge them before refusing admission with a
                # spurious 429. The lock serializes submitters, so the
                # put-back + retry below cannot race another admission
                # (the batcher's concurrent gets only ever make room).
                self._purge_abandoned()
                self._queue.put_nowait(job)  # queue.Full propagates if real
        with self.metrics.lock:
            self.metrics.requests_total += 1
        return job

    def _purge_abandoned(self):
        """Drop abandoned jobs from the admission queue (survivors keep
        FIFO order; callers hold ``_submit_lock``)."""
        live = []
        while True:
            try:
                j = self._queue.get_nowait()
            except queue.Empty:
                break
            if not j.abandoned:
                live.append(j)
        for j in live:
            self._queue.put_nowait(j)

    def _count_error(self):
        with self.metrics.lock:
            self.metrics.errors_total += 1

    # ------------------------------------------------------------------

    def _drain_loop(self):
        """Single inference thread: block for one job, then wait up to
        ``batch_wait_s`` for batch-mates (a full batch goes immediately)."""
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.2)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + self.batch_wait_s
            while len(batch) < self.batch_pages:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            # callers that already timed out get no device time
            batch = [j for j in batch if not j.abandoned]
            if not batch:
                continue
            if not self._pipelined:
                self._run_batch(batch)
                continue
            # pipelined path: start (host prep + dispatch) here, finish in
            # the finisher thread; the put blocks when one started batch
            # is already waiting — bounded device queue depth of ~2
            t0 = time.time()
            try:
                handle = self.pipeline.start_batch([j.image for j in batch])
            except Exception as exc:
                for job in batch:
                    job.error = f"{type(exc).__name__}: {exc}"
                    job.done.set()
                with self.metrics.lock:
                    self.metrics.busy_seconds += time.time() - t0
                continue
            with self.metrics.lock:
                self.metrics.busy_seconds += time.time() - t0
            enqueued = False
            while not self._stop.is_set():
                try:
                    self._inflight.put((batch, handle), timeout=0.2)
                    enqueued = True
                    break
                except queue.Full:
                    continue
            if not enqueued:
                # shutdown raced a STARTED batch (device work already
                # dispatched): finish it inline so its clients get their
                # pages instead of blocking until the request timeout.
                try:
                    pages = self.pipeline.finish_batch(handle)
                    for job, page in zip(batch, pages):
                        job.result = page
                except Exception as exc:
                    for job in batch:
                        job.error = f"{type(exc).__name__}: {exc}"
                finally:
                    with self.metrics.lock:
                        self.metrics.pages_total += len(batch)
                        self.metrics.batch_count += 1
                    for job in batch:
                        job.done.set()

    def _finish_loop(self):
        """Second pipeline stage: block for each started batch's device
        results and complete its jobs, while the batcher thread is already
        assembling + starting the next batch."""
        while not (self._stop.is_set() and self._inflight.empty()):
            try:
                batch, handle = self._inflight.get(timeout=0.2)
            except queue.Empty:
                continue
            t0 = time.time()
            try:
                pages = self.pipeline.finish_batch(handle)
                for job, page in zip(batch, pages):
                    job.result = page
            except Exception as exc:  # surface per-job; keep worker alive
                for job in batch:
                    job.error = f"{type(exc).__name__}: {exc}"
            finally:
                with self.metrics.lock:
                    self.metrics.pages_total += len(batch)
                    self.metrics.batch_count += 1
                    self.metrics.busy_seconds += time.time() - t0
                for job in batch:
                    job.done.set()
                self._warm_capacity()

    def _warm_capacity(self):
        """Pre-compile the fused engine's next capacity bucket off the hot
        path (idempotent, background thread — fused.warm_next_bucket), so
        a density jump mid-serve re-shapes without a cold compile."""
        fused = getattr(self.pipeline, "_fused", None)
        if fused is not None and hasattr(fused, "warm_next_bucket"):
            try:
                fused.warm_next_bucket()
            except Exception:
                pass

    def _run_batch(self, batch):
        t0 = time.time()
        try:
            if len(batch) == 1:
                pages = [self.pipeline.predict(batch[0].image)]
            else:
                pages = self.pipeline.process_batch(
                    [j.image for j in batch]
                )
            for job, page in zip(batch, pages):
                job.result = page
        except Exception as exc:  # surface per-job; keep the worker alive
            for job in batch:
                job.error = f"{type(exc).__name__}: {exc}"
        finally:
            with self.metrics.lock:
                self.metrics.pages_total += len(batch)
                self.metrics.batch_count += 1
                self.metrics.busy_seconds += time.time() - t0
            for job in batch:
                job.done.set()
            self._warm_capacity()

    # ------------------------------------------------------------------

    def serve_forever(self):
        self._worker.start()
        if self._pipelined:
            self._finisher.start()
        try:
            self._httpd.serve_forever()
        finally:
            self.shutdown()

    def start_background(self):
        """Start worker + HTTP threads and return (for tests/embedding)."""
        self._worker.start()
        if self._pipelined:
            self._finisher.start()
        self._http_thread = threading.Thread(
            target=self._httpd.serve_forever, name="ocr-http", daemon=True
        )
        self._http_thread.start()

    def shutdown(self):
        self._stop.set()
        self._httpd.shutdown()
        self._httpd.server_close()
        # a bucket-warm compile in flight at interpreter exit aborts
        # noisily (daemon thread inside XLA) — give it a grace period
        fused = getattr(self.pipeline, "_fused", None)
        warms = list(getattr(fused, "_warm_threads", None) or [])
        single = getattr(fused, "_warm_thread", None)
        if single is not None and single not in warms:
            warms.append(single)
        deadline = time.time() + 60.0
        for warm in warms:
            if warm.is_alive():
                warm.join(timeout=max(0.0, deadline - time.time()))
