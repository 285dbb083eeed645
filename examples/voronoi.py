"""Voronoi pitch-control plot from processed_data.json (reference
examples/voronoi.py): each team's controlled area shaded around its
players for one frame."""

import argparse
import json
import sys

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

sys.path.append("../")
sys.path.append(".")
from eagle_tpu.utils.pitchplot import draw_pitch, voronoi_polygons

parser = argparse.ArgumentParser()
parser.add_argument("--input_dir", type=str, required=True)
parser.add_argument("--frame", type=int, default=0)
parser.add_argument("--output", type=str, default="voronoi.png")
args = parser.parse_args()

df = pd.read_json(f"{args.input_dir}/processed_data.json").fillna(np.nan)
with open(f"{args.input_dir}/metadata.json") as f:
    team_mapping = json.load(f)["team_mapping"]

fig, ax = plt.subplots()
draw_pitch(ax)
fig.set_facecolor("black")

xs, ys, teams = [], [], []
for item in df["Coordinates"][args.frame]:
    pid = item["ID"]
    x, y = item["Coordinates"]
    if pid == "Ball":
        ax.scatter(x, y, color="white", zorder=15, facecolors="none", edgecolors="white", s=50)
        continue
    if item.get("Type") == "Goalkeeper":
        ax.scatter(x, y, color="green", zorder=5, s=100)
        continue
    team = team_mapping.get(str(pid))
    if team is None:
        continue
    color = "#add8e6" if team == 0 else "red"
    ax.scatter(x, y, color=color, zorder=5, s=100)
    xs.append(x)
    ys.append(y)
    teams.append(team)

t0, t1 = voronoi_polygons(xs, ys, teams)
for poly in t0:
    ax.add_patch(plt.Polygon(poly, facecolor="#add8e6", edgecolor="#add8e6", alpha=0.2, zorder=1))
for poly in t1:
    ax.add_patch(plt.Polygon(poly, facecolor="red", edgecolor="red", alpha=0.2, zorder=1))

plt.savefig(args.output, dpi=150, facecolor=fig.get_facecolor())
print(f"Saved {args.output}")
