"""Minimap video render from raw_data.json (reference examples/minimap.py):
top-down pitch view per frame with players colored by team, goalkeepers
green, the ball as an open circle, and the visible-camera area shaded."""

import argparse
import json
import sys
from io import BytesIO

import cv2
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

sys.path.append("../")
sys.path.append(".")
from eagle_tpu.io import write_video
from eagle_tpu.utils.pitchplot import draw_pitch

parser = argparse.ArgumentParser()
parser.add_argument("--input_dir", type=str, required=True)
parser.add_argument("--output", type=str, default="output_test.mp4")
args = parser.parse_args()

df = pd.read_json(f"{args.input_dir}/raw_data.json").fillna(value=np.nan)
with open(f"{args.input_dir}/metadata.json") as f:
    metadata = json.load(f)
fps = metadata["fps"]
team_mapping = metadata["team_mapping"]

corner_cols = ["Bottom_Left", "Top_Left", "Top_Right", "Bottom_Right"]
to_draw = [c for c in df.columns if "video" not in c and c not in corner_cols]

out = []
for _, row in df.iterrows():
    buffer = BytesIO()
    fig, ax = plt.subplots(figsize=(8, 12))
    draw_pitch(ax)
    fig.set_facecolor("black")

    boundaries = [row[c] for c in corner_cols + ["Bottom_Left"]]
    if all(isinstance(b, (list, tuple)) for b in boundaries):
        ax.add_patch(plt.Polygon(boundaries, facecolor="white", zorder=1, closed=True, alpha=0.3))

    for col in to_draw:
        if isinstance(row[col], float):
            continue
        x, y = row[col]
        if "Ball" in col:
            ax.scatter(x, y, color="white", zorder=5, facecolors="none", edgecolors="white", s=50)
        else:
            pid = col.split("_")[1]
            if "Goalkeeper" in col:
                color = "green"
            elif pid in team_mapping:
                color = "#43A1D5" if team_mapping[pid] == 1 else "#F36C21"
            else:
                continue
            ax.scatter(x, y, color=color, zorder=5, s=100)

    plt.savefig(buffer, format="png", bbox_inches="tight", pad_inches=0)
    plt.close()
    buffer.seek(0)
    out.append(cv2.imdecode(np.frombuffer(buffer.read(), np.uint8), 1))

print(f"Saving video to {args.output}")
write_video(out, args.output, fps=fps)
