"""Annotated-video rendering (the reference's main.py:43-81 drawing loop):
ellipse per player colored by team, id label, triangle over the ball,
black dots on detected keypoints."""

from __future__ import annotations

import cv2
import numpy as np
import pandas as pd

TEAM_COLORS = {0: (0, 0, 255), 1: (255, 0, 0)}  # BGR: red / blue
GK_COLOR = (0, 255, 0)
BALL_COLOR = (0, 255, 0)


def render_annotated_frames(df: pd.DataFrame, frames, coordinates: dict, team_mapping: dict):
    """Yield annotated BGR frames for every row of the processed table."""
    corner_cols = ["Bottom_Left", "Top_Left", "Top_Right", "Bottom_Right"]
    cols = [c for c in df.columns if "video" in c and c not in corner_cols]
    for i, row in df.iterrows():
        frame = np.asarray(frames[int(i)]).copy()
        for col in cols:
            val = row[col]
            if isinstance(val, float) and pd.isna(val):
                continue
            x, y = val
            if "Ball" in col:
                pts = np.array(
                    [
                        (int(x), int(y) - 20),
                        (int(x) - 5, int(y) - 30),
                        (int(x) + 5, int(y) - 30),
                    ]
                ).reshape(-1, 1, 2)
                cv2.drawContours(frame, [pts], 0, BALL_COLOR, -1)
                continue
            oid = int(col.split("_")[1])
            if "Goalkeeper" in col:
                color = GK_COLOR
            else:
                if oid not in team_mapping:
                    continue
                color = TEAM_COLORS[team_mapping[oid]]
            cv2.ellipse(frame, (int(x), int(y)), (35, 18), 0, -45, 235, color, 1)
            cv2.putText(
                frame, str(oid), (int(x) - 3, int(y)), cv2.FONT_HERSHEY_SIMPLEX, 0.7, color, 2
            )

        for kx, ky in coordinates[int(i)]["Keypoints"].values():
            cv2.circle(frame, (int(kx), int(ky)), 6, (0, 0, 0), -1)
        yield frame
