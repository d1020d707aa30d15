# Runtime environment for the niceslam-tpu framework.
#
# Equivalent of the reference's reproducibility story (Dockerfile:1-140 +
# run_docker.sh there: Ubuntu 18.04 + CUDA 10.2 + libtorch 1.11 + OpenCV
# from source), rebuilt for the TPU stack: one pinned Python environment,
# the native C++ loader toolchain, and no GPU/X11 machinery — TPU runtimes
# attach through the host's libtpu, which `jax[tpu]` bundles.
#
#   docker build -t niceslam-tpu .
#   docker run --privileged --net=host -v $PWD/data:/work/data niceslam-tpu \
#       python run_slam.py configs/cofusion.yaml
#
# (--privileged/--net=host are the standard TPU-VM container knobs; drop
# them for CPU-only runs — everything falls back to the CPU backend, which
# is also how CI runs the test suite.)

FROM python:3.12-slim-bookworm

# Native toolchain for native/ (C ABI EXR decoder + threaded loader pool,
# built on import via make; see niceslam_tpu/io/native_loader.py).
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

# Pinned Python environment (versions mirrored from the validated dev image;
# see docs/ENVIRONMENT.md for the full manifest).
RUN pip install --no-cache-dir \
        'jax[tpu]==0.9.0' \
        'flax==0.12.3' \
        'optax==0.2.6' \
        'orbax-checkpoint==0.11.32' \
        'chex==0.1.91' \
        'einops==0.8.2' \
        'numpy==2.0.2' \
        'scipy==1.17.0' \
        'opencv-python-headless' \
        'imageio' \
        'pyyaml==6.0.3' \
        'pytest'

WORKDIR /work
COPY . /work

# Pre-build the native EXR decoder so first import doesn't pay the make.
RUN make -C native || true

# Sanity: package imports + config schema round-trip (no devices needed).
RUN JAX_PLATFORMS=cpu python -c "\
from niceslam_tpu.config.schema import load_config; \
import niceslam_tpu.slam.system, niceslam_tpu.parallel.runtime; \
print('niceslam-tpu image ok')"

CMD ["python", "run_slam.py", "configs/cofusion.yaml"]
