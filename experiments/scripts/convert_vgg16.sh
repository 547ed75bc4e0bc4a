#!/bin/bash
# Convert pretrained vgg16 weights into this framework's .npz layout
# (counterpart of the reference's experiments/scripts/convert_vgg16.sh,
# which migrated legacy TF snapshots via tools/convert_from_depre.py; the
# TPU framework stores params as .npz and does the RGB->BGR flip +
# fc6/fc7 conv->dense reshape offline in tpudenoise/cli/convert.py).
#
# Usage: ./experiments/scripts/convert_vgg16.sh SRC [OUT]
#   SRC: tf-slim vgg_16.ckpt prefix or torchvision .pth
#   OUT: output .npz (default data/imagenet_weights/vgg16.npz)

set -x
set -e
export PYTHONUNBUFFERED="True"

SRC=$1
OUT=${2:-data/imagenet_weights/vgg16.npz}

if [ -z "${SRC}" ]; then
  echo "usage: $0 SRC [OUT]"
  exit 1
fi

mkdir -p "$(dirname "${OUT}")"

LOG="experiments/logs/convert_vgg16.txt"
mkdir -p experiments/logs
exec &> >(tee -a "$LOG")
echo Logging output to "$LOG"

python -m tpudenoise.cli.convert --src "${SRC}" --net vgg16 --out "${OUT}"
