"""Minimap video render from raw_data.json (reference examples/minimap.py):
a top-down pitch view per frame — players colored by team, goalkeepers
green, the ball as an open circle, the visible camera area shaded."""

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

CORNERS = ["Bottom_Left", "Top_Left", "Top_Right", "Bottom_Right"]
TEAM_COLORS = {0: "#F36C21", 1: "#43A1D5"}


def render_frame(row, columns, team_mapping):
    """One minimap frame -> BGR image."""
    fig, ax = plt.subplots(figsize=(8, 12))
    draw_pitch(ax)
    fig.set_facecolor("black")

    quad = [row[c] for c in CORNERS + [CORNERS[0]]]
    if all(isinstance(p, (list, tuple)) for p in quad):
        ax.add_patch(plt.Polygon(quad, facecolor="white", zorder=1, closed=True, alpha=0.3))

    for col in columns:
        val = row[col]
        if isinstance(val, float):  # NaN
            continue
        x, y = val
        if "Ball" in col:
            ax.scatter(x, y, color="white", zorder=5, facecolors="none", edgecolors="white", s=50)
        elif "Goalkeeper" in col:
            ax.scatter(x, y, color="green", zorder=5, s=100)
        else:
            team = team_mapping.get(col.split("_")[1])
            if team is not None:
                ax.scatter(x, y, color=TEAM_COLORS[team], zorder=5, s=100)

    buf = BytesIO()
    plt.savefig(buf, format="png", bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    buf.seek(0)
    return cv2.imdecode(np.frombuffer(buf.read(), np.uint8), 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", type=str, required=True)
    parser.add_argument("--output", type=str, default="output_test.mp4")
    args = parser.parse_args()

    df = pd.read_json(f"{args.input_dir}/raw_data.json").fillna(value=np.nan)
    with open(f"{args.input_dir}/metadata.json") as f:
        metadata = json.load(f)
    team_mapping = metadata["team_mapping"]
    pitch_cols = [c for c in df.columns if "video" not in c and c not in CORNERS]

    frames = [render_frame(row, pitch_cols, team_mapping) for _, row in df.iterrows()]
    print(f"Saving video to {args.output}")
    write_video(frames, args.output, fps=metadata["fps"])


if __name__ == "__main__":
    main()
