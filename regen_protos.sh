#!/bin/bash
# Regenerate protobuf python bindings (checked in for zero-setup installs).
set -e
cd "$(dirname "$0")"
protoc --python_out=. torcheasyrec_tpu/protos/*.proto
