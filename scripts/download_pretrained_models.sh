#!/bin/bash
# Download the reference's released pretrained checkpoints and show how to
# import them into this framework.
#
# Mirrors /root/reference/script/download_pretrained_models.sh:3-11 (same
# release URLs). The downloaded .pth files are torch state_dicts trained by
# the reference implementation; `eigentrajectory_tpu.interop` converts them
# to this framework's Flax pytrees (all 10 baselines supported) so a user of
# the reference can evaluate its checkpoints here without retraining:
#
#   python -m eigentrajectory_tpu.interop \
#       --cfg configs/eigentrajectory-stgcnn-hotel.json \
#       --pth pretrained/STGCNN/<release-folder>/eigentrajectory-stgcnn-hotel/model_best.pth \
#       --test
#
# (Each zip extracts under pretrained/<baseline>/ — run `find pretrained/STGCNN
# -name model_best.pth` after downloading to see the exact layout.)
#
# (Checkpoints load with torch.load(weights_only=True); pass --unsafe only
# for trusted archives that need full unpickling.)

set -e
cd "$(dirname "$0")/.."   # extract under the repo root (pretrained/ is gitignored)

baselines=("STGCNN" "SGCN" "PECNet" "AgentFormer" "LBEBM" "DMRGCN" "GPGraph-STGCNN" "GPGraph-SGCN" "Graph-TERN" "Implicit")

for b in "${baselines[@]}"; do
  echo "Downloading pretrained ${b} checkpoints."
  wget -O "${b}.zip" "https://github.com/InhwanBae/EigenTrajectory/releases/download/v1.0/EigenTrajectory-${b}-pretrained.zip"
  unzip -q "${b}.zip" -d "pretrained/${b}"
  rm -f "${b}.zip"
done

echo "Done. Import any checkpoint with:"
echo "  python -m eigentrajectory_tpu.interop --cfg configs/<cfg>.json --pth pretrained/<baseline>/<...>/model_best.pth --test"
