#!/usr/bin/env bash
# Fetch the preprocessed ETH-UCY datasets (reference: script/download_datasets.sh).
# In the sandboxed build environment the datasets are consumed read-only from
# /root/reference/datasets; this script is for standalone deployments.
set -e
if [ -d "/root/reference/datasets" ] && [ ! -d "./datasets" ]; then
  echo "Linking datasets from the mounted reference tree"
  ln -s /root/reference/datasets ./datasets
  exit 0
fi
echo "Downloading ETH-UCY datasets (Social-GAN preprocessed splits)..."
curl -L -o datasets.zip \
  https://github.com/InhwanBae/EigenTrajectory/releases/download/v1.0/datasets.zip
unzip -q datasets.zip -d .
rm -f datasets.zip
echo "Done."
