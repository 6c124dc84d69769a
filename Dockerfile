# pcr-tpu container. For TPU VMs use the libtpu-enabled jax install; the
# default build is the CPU backend (tests, CI, development).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/pcr-tpu
COPY . .

ARG JAX_VARIANT=cpu
# TPU machines: --build-arg JAX_VARIANT="tpu"
RUN pip install --no-cache-dir "jax[${JAX_VARIANT}]" numpy pillow pytest \
    && pip install --no-cache-dir -e .

# warm the native host kernels (g++ build is cached in the image)
RUN python -c "from pcr_tpu import native; native.available()"

CMD ["python", "-m", "pytest", "tests/", "-q"]
