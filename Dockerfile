# proteus_tpu container: DSWx-HLS TPU-native SAS
# (science chain runs on TPU when a libtpu-enabled jax is installed; this
# image defaults to jax[cpu] for portability)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ zlib1g-dev && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/proteus_tpu
COPY . .
RUN pip install --no-cache-dir numpy scipy pyyaml pillow pytest "jax[cpu]" \
    && pip install --no-cache-dir . \
    && python -m proteus_tpu.native.build

ENTRYPOINT ["dswx_hls"]
