# Container image for the nyxus_tpu CLI (reference: Dockerfile:1 — the
# reference ships its CLI in a cuda-runtime image; the TPU build's
# accelerator comes from the host's TPU runtime / libtpu, selected by JAX
# at startup, so the base is a plain Python image).
#
# Build:  docker build -t nyxus-tpu .
# Run:    docker run -v /data:/data nyxus-tpu \
#           --intDir=/data/images/int --segDir=/data/images/seg \
#           --outDir=/data/outputs --features=*ALL*
FROM python:3.12-slim-bookworm

# native toolchain + libtiff for the C++ runtime components (region server,
# CSV writer, geometry kernels are JIT-built on first use); libcharls for
# JPEG-LS DICOM
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ libtiff-dev libcharls2 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/nyxus_tpu
COPY pyproject.toml setup.py ./
COPY nyxus_tpu ./nyxus_tpu

# jax[tpu] pulls libtpu for real TPU hosts; on CPU-only hosts JAX falls
# back to its CPU backend automatically
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        numpy pandas scipy pillow pyarrow \
    && pip install --no-cache-dir .

RUN mkdir -p /data/images /data/outputs
WORKDIR /data

ENTRYPOINT ["python", "-m", "nyxus_tpu.cli"]
