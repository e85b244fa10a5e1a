# Serving image (reference: Dockerfile:1-36 — python slim + app entry).
# TPU runtime: install the libtpu-bundled jax matching your TPU VM; on
# CPU-only hosts the demo app runs with JAX_PLATFORMS=cpu.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    ffmpeg build-essential && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app

RUN pip install --no-cache-dir \
    "jax[tpu]" flax optax orbax-checkpoint chex einops numpy pyyaml \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax flax optax orbax-checkpoint chex \
       einops numpy pyyaml

EXPOSE 7860
ENV JAX_PLATFORMS=""
CMD ["python", "app.py", "--host", "0.0.0.0", "--port", "7860"]
