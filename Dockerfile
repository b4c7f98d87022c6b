# SNIPER-TPU runtime environment.
#
# Counterpart of the reference Dockerfile (CUDA 8.0/cuDNN5 build env for
# the MXNet fork): here the only native artifact is the chip set-cover
# kernel, built with plain g++; everything else is the JAX TPU stack.
# On Cloud TPU VMs the host image already ships the TPU runtime — this
# container only needs the Python stack and the libtpu wheel.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/sniper_tpu
COPY . .

# jax[tpu] pulls libtpu; pin versions in requirements for reproducibility
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint chex einops numpy \
        opencv-python-headless pyyaml scipy pillow pytest

# native chip kernel (ctypes-loaded; tests assert the .so exists)
RUN ./scripts/build_native.sh

# sanity: geometry/targets core needs no accelerator
RUN JAX_PLATFORMS=cpu python -m pytest tests/test_boxes.py tests/test_chips.py -q

ENTRYPOINT ["python"]
CMD ["main_train.py", "--help"]
