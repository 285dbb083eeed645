#!/bin/sh
# Fetch the reference's trained weights (same Google Drive bundle the
# reference uses: eagle/models/get_weights.sh) and convert them to native
# msgpack parameter trees.  Requires network access + gdown + torch.
set -e
gdown 1rTArr_3eO35Ynea2HXqPYOxDdkDYLfMI
unzip -o weights.zip -d weights_torch
python scripts/convert_weights.py --kind hrnet  --src weights_torch/keypoints_main.pth      --out weights/hrnet_w48.msgpack
python scripts/convert_weights.py --kind yolov8 --src weights_torch/detector_large_hd.pt    --out weights/yolov8l_hd.msgpack
python scripts/convert_weights.py --kind yolov8 --src weights_torch/detector_large.pt       --out weights/yolov8l.msgpack || true
python scripts/convert_weights.py --kind yolov8 --src weights_torch/detector_medium.pt      --out weights/yolov8m.msgpack || true
echo "converted weights in ./weights/"
