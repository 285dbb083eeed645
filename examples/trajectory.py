"""Ball-trajectory polyline from processed_data.json (reference
examples/trajectory.py)."""

import argparse
import sys

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

sys.path.append("../")
sys.path.append(".")
from eagle_tpu.utils.pitchplot import draw_pitch

parser = argparse.ArgumentParser()
parser.add_argument("--input_dir", type=str, required=True)
parser.add_argument("--start", type=int, default=0)
parser.add_argument("--stop", type=int, default=-1)
parser.add_argument("--step", type=int, default=10)
parser.add_argument("--output", type=str, default="trajectory.png")
args = parser.parse_args()

df = pd.read_json(f"{args.input_dir}/processed_data.json").fillna(np.nan)
stop = args.stop if args.stop >= 0 else len(df)

ball_coords = []
for i in range(args.start, stop, args.step):
    for item in df["Coordinates"][i]:
        if item["ID"] == "Ball" and isinstance(item["Coordinates"], (list, tuple)):
            ball_coords.append(item["Coordinates"])

fig, ax = plt.subplots()
draw_pitch(ax)
fig.set_facecolor("black")
ax.plot([c[0] for c in ball_coords], [c[1] for c in ball_coords], color="white", zorder=5, linewidth=1)
if ball_coords:
    ax.scatter(*ball_coords[0], color="blue", zorder=5, s=50)
    ax.scatter(*ball_coords[-1], color="blue", zorder=5, s=50)
plt.savefig(args.output, dpi=150, facecolor=fig.get_facecolor())
print(f"Saved {args.output}")
