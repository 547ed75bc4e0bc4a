#!/bin/bash
# Fetch ImageNet-pretrained backbone weights and convert to .npz
# (replaces data/scripts/fetch_faster_rcnn_models.sh which pulled the
# reference's TF snapshot tarball).
set -e
NET=${1:-res101}
DEST=data/imagenet_weights
mkdir -p ${DEST}
case ${NET} in
  vgg16)
    URL=http://download.tensorflow.org/models/vgg_16_2016_08_28.tar.gz ;;
  res50)
    URL=http://download.tensorflow.org/models/resnet_v1_50_2016_08_28.tar.gz ;;
  res101)
    URL=http://download.tensorflow.org/models/resnet_v1_101_2016_08_28.tar.gz ;;
  res152)
    URL=http://download.tensorflow.org/models/resnet_v1_152_2016_08_28.tar.gz ;;
  *) echo "unknown net ${NET}"; exit 1 ;;
esac
wget -c ${URL} -O ${DEST}/${NET}.tar.gz
tar -xzf ${DEST}/${NET}.tar.gz -C ${DEST}
CKPT=$(ls ${DEST}/*.ckpt | head -1)
python -m tpudenoise.cli.convert --src ${CKPT} --net ${NET} \
    --out ${DEST}/${NET}.npz
echo "wrote ${DEST}/${NET}.npz"
