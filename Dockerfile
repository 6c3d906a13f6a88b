# manuscript-tpu serving image (TPU VM host).
# The TPU runtime is provided by the host (libtpu via the VM image);
# jax[tpu] resolves it at import time.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY manuscript_tpu ./manuscript_tpu
COPY native ./native
COPY examples ./examples

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir . opencv-python-headless \
    && make -C native

# model cache volume (native .msgpack or converted .pth checkpoints)
VOLUME ["/root/.manuscript_tpu"]

# persistent XLA compile cache: container restarts skip the ~10-40 s
# per-program compiles (safe here — TPU target; see utils/compile_cache.py)
ENV MANUSCRIPT_TPU_JAX_CACHE=/root/.manuscript_tpu/jax_cache

EXPOSE 8000
CMD ["python", "-m", "manuscript_tpu", "serve", "--port", "8000"]
