# Container recipe for running the test suite in isolation — the analogue
# of the reference's py.Dockerfile (/root/reference/py.Dockerfile:1-12),
# which builds one image per Python version and runs pytest inside it.
#
#   docker build -f py.Dockerfile --build-arg PYTHON_VERSION=3.11 -t minigrid-tpu-test .
#   docker run --rm minigrid-tpu-test
#
# The image is CPU-only: the suite pins jax to the CPU backend with a
# virtual 8-device farm (tests/conftest.py), so sharding/collective paths
# are exercised without TPU hardware.  On a TPU host, install the matching
# jax[tpu] wheel instead of jax[cpu].
ARG PYTHON_VERSION=3.11
FROM python:$PYTHON_VERSION

SHELL ["/bin/bash", "-o", "pipefail", "-c"]

COPY . /usr/local/minigrid_tpu/
WORKDIR /usr/local/minigrid_tpu/

RUN pip install --no-cache-dir "jax[cpu]" flax optax chex pytest \
    && pip install --no-cache-dir -e .

CMD ["python", "-m", "pytest", "tests/", "-q"]
