"""Convert reference torch checkpoints to native msgpack parameter trees.

    python scripts/convert_weights.py --kind hrnet  --src keypoints_main.pth --out weights/hrnet.msgpack
    python scripts/convert_weights.py --kind yolov8 --src detector_large_hd.pt --out weights/yolov8l.msgpack

The reference distributes weights via `gdown` + unzip
(eagle/models/get_weights.sh); fetch them with scripts/get_weights.sh and
convert once -- deployment then needs neither torch nor pickle.
"""

from argparse import ArgumentParser

from eagle_tpu.models.checkpoint import convert_and_save

if __name__ == "__main__":
    p = ArgumentParser()
    p.add_argument("--kind", choices=["hrnet", "yolov8"], required=True)
    p.add_argument("--src", required=True, help="torch checkpoint path")
    p.add_argument("--out", required=True, help="output .msgpack path")
    args = p.parse_args()
    print(convert_and_save(args.src, args.out, args.kind))
