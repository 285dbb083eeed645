"""Pass-arrow plot from processed_data.json (reference examples/pass.py):
player positions at the pass moment plus an arrow from the ball's start to
its end position."""

import argparse
import json
import sys

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

sys.path.append("../")
sys.path.append(".")
from eagle_tpu.utils.pitchplot import draw_pitch

parser = argparse.ArgumentParser()
parser.add_argument("--input_dir", type=str, required=True)
parser.add_argument("--start_frame", type=int, default=0)
parser.add_argument("--end_frame", type=int, default=-1)
parser.add_argument("--output", type=str, default="pass.png")
args = parser.parse_args()

df = pd.read_json(f"{args.input_dir}/processed_data.json").fillna(np.nan)
with open(f"{args.input_dir}/metadata.json") as f:
    team_mapping = json.load(f)["team_mapping"]

end_frame = args.end_frame if args.end_frame >= 0 else len(df) - 1

fig, ax = plt.subplots()
draw_pitch(ax)
fig.set_facecolor("black")

start = end = None
for item in df["Coordinates"][args.start_frame]:
    pid = item["ID"]
    x, y = item["Coordinates"]
    if pid == "Ball":
        ax.scatter(x, y, color="white", zorder=5, facecolors="none", edgecolors="white", s=50)
        start = (x, y)
        continue
    if item.get("Type") == "Goalkeeper":
        color = "green"
    else:
        team = team_mapping.get(str(pid))
        if team is None:
            continue
        color = "red" if team == 0 else "white"
    ax.scatter(x, y, color=color, zorder=5, s=100, alpha=0.6, edgecolors=color)

for item in df["Coordinates"][end_frame]:
    if item["ID"] == "Ball":
        end = item["Coordinates"]

if start is not None and end is not None:
    ax.arrow(
        start[0], start[1], end[0] - start[0], end[1] - start[1],
        head_width=1, head_length=1, fc="white", ec="white", zorder=5,
    )
plt.savefig(args.output, dpi=150, facecolor=fig.get_facecolor())
print(f"Saved {args.output}")
