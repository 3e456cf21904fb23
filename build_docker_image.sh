#!/bin/sh
# Build the proteus_tpu container image and run the test suite inside it.
set -e
IMAGE=${1:-proteus_tpu}
docker build -t "$IMAGE" .
docker run --rm --entrypoint python "$IMAGE" -m pytest /opt/proteus_tpu/tests -q
