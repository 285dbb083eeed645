"""Synthetic broadcast-scene generator with exact ground truth.

Renders a fake TV view of a UEFA pitch under a known world->image
homography, with "players" (solid torsos with team jerseys) and a ball
moving along known world trajectories.  Used by the test suite (no model
weights or real footage needed in CI -- SURVEY.md section 4) and by
bench.py as a deterministic input.
"""

from __future__ import annotations

import dataclasses

import cv2
import numpy as np

from eagle_tpu import pitch


@dataclasses.dataclass
class SyntheticScene:
    frames: np.ndarray  # (N, H, W, 3) uint8 BGR
    H_world_to_image: np.ndarray  # (3, 3)
    H_image_to_world: np.ndarray  # (3, 3)
    #: (N, P, 2) world positions of players
    player_world: np.ndarray
    #: (N, P, 2) image positions of player feet
    player_feet_image: np.ndarray
    #: (N, P, 4) image xyxy boxes
    player_boxes: np.ndarray
    #: (P,) team id (0/1)
    player_team: np.ndarray
    #: (N, 2) world ball positions
    ball_world: np.ndarray
    #: (N, 2) image ball positions (bottom center)
    ball_image: np.ndarray
    #: (57, 2) image positions of all pitch landmarks (may be off-screen)
    keypoints_image: np.ndarray
    fps: int


def default_camera_homography(width: int = 1280, height: int = 720) -> np.ndarray:
    """A plausible main-camera view: the pitch fills a trapezoid.

    Maps world (x, y) [105 x 68, y up] to image pixels (u, v) [v down].
    """
    world_quad = np.array(
        [[0.0, 68.0], [105.0, 68.0], [105.0, 0.0], [0.0, 0.0]], dtype=np.float32
    )
    # far touchline appears high & narrow-ish, near touchline low & wide
    image_quad = np.array(
        [
            [width * 0.08, height * 0.18],
            [width * 0.92, height * 0.18],
            [width * 1.25, height * 0.95],
            [-width * 0.25, height * 0.95],
        ],
        dtype=np.float32,
    )
    return cv2.getPerspectiveTransform(world_quad, image_quad).astype(np.float64)


def project(H: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply a 3x3 homography to (..., 2) points."""
    pts = np.asarray(pts, dtype=np.float64)
    ones = np.ones(pts.shape[:-1] + (1,))
    homo = np.concatenate([pts, ones], axis=-1) @ H.T
    return homo[..., :2] / homo[..., 2:3]


def _draw_pitch_lines(img: np.ndarray, H: np.ndarray, thickness: int = 3) -> None:
    """White pitch markings under homography H (world->image)."""

    def wline(a, b, n=32):
        ws = np.linspace(a, b, n)
        ps = project(H, ws).astype(np.int32)
        for i in range(n - 1):
            cv2.line(img, tuple(ps[i]), tuple(ps[i + 1]), (255, 255, 255), thickness)

    L, W = pitch.PITCH_LENGTH, pitch.PITCH_WIDTH
    # outline + halfway
    wline((0, 0), (L, 0)), wline((0, W), (L, W))
    wline((0, 0), (0, W)), wline((L, 0), (L, W))
    wline((L / 2, 0), (L / 2, W))
    # penalty + goal areas
    for x0, d in [(0.0, 1.0), (L, -1.0)]:
        for depth, half in [(16.5, 20.16), (5.5, 9.16)]:
            wline((x0, 34 - half), (x0 + d * depth, 34 - half))
            wline((x0, 34 + half), (x0 + d * depth, 34 + half))
            wline((x0 + d * depth, 34 - half), (x0 + d * depth, 34 + half))
    # center circle + penalty arcs
    th = np.linspace(0, 2 * np.pi, 90)
    circ = np.stack([L / 2 + 9.15 * np.cos(th), 34 + 9.15 * np.sin(th)], -1)
    ps = project(H, circ).astype(np.int32)
    cv2.polylines(img, [ps], True, (255, 255, 255), thickness)
    for cx, d in [(11.0, 1.0), (L - 11.0, -1.0)]:
        a = np.arccos(5.5 / 9.15)
        th = np.linspace(-a, a, 30) if d > 0 else np.linspace(np.pi - a, np.pi + a, 30)
        arc = np.stack([cx + 9.15 * np.cos(th), 34 + 9.15 * np.sin(th)], -1)
        ps = project(H, arc).astype(np.int32)
        cv2.polylines(img, [ps], False, (255, 255, 255), thickness)


def make_scene(
    num_frames: int = 48,
    width: int = 1280,
    height: int = 720,
    num_players: int = 10,
    fps: int = 24,
    seed: int = 0,
    pan_speed: float = 0.0,
) -> SyntheticScene:
    """Render a deterministic synthetic broadcast clip.

    ``pan_speed`` shifts the camera horizontally (pixels/frame) to exercise
    the optical-flow / homography-update paths.
    """
    rng = np.random.default_rng(seed)
    H0 = default_camera_homography(width, height)

    # players: half per team, random walks inside the central pitch area
    start = rng.uniform([25, 15], [80, 53], size=(num_players, 2))
    vel = rng.uniform(-0.15, 0.15, size=(num_players, 2))
    team = (np.arange(num_players) % 2).astype(np.int32)
    jersey = {0: (40, 40, 215), 1: (200, 140, 30)}  # BGR: red vs blue-ish

    ball0 = np.array([52.5, 34.0])
    ball_vel = np.array([0.35, 0.12])

    frames = np.zeros((num_frames, height, width, 3), dtype=np.uint8)
    player_world = np.zeros((num_frames, num_players, 2))
    player_feet = np.zeros((num_frames, num_players, 2))
    player_boxes = np.zeros((num_frames, num_players, 4))
    ball_world = np.zeros((num_frames, 2))
    ball_image = np.zeros((num_frames, 2))

    for t in range(num_frames):
        shift = np.array([[1, 0, pan_speed * t], [0, 1, 0], [0, 0, 1]], dtype=np.float64)
        H = shift @ H0
        img = np.zeros((height, width, 3), dtype=np.uint8)
        img[:] = (60, 140, 70)  # green-ish pitch in BGR
        # mow stripes for texture (helps optical flow find gradients)
        for sx in range(0, 105, 10):
            quad = project(H, [[sx, 0], [sx + 5, 0], [sx + 5, 68], [sx, 68]]).astype(np.int32)
            cv2.fillPoly(img, [quad], (55, 130, 62))
        _draw_pitch_lines(img, H)

        pw = start + vel * t
        pf = project(H, pw)
        bw = ball0 + ball_vel * t
        bi = project(H, bw[None])[0]

        player_world[t] = pw
        player_feet[t] = pf
        ball_world[t] = bw
        ball_image[t] = bi

        # draw players back-to-front (far = small), boxes anchored at feet
        order = np.argsort(pf[:, 1])
        for p in order:
            u, v = pf[p]
            scale = 0.4 + 0.9 * (v / height)  # crude depth cue
            bw_px, bh_px = 26 * scale, 62 * scale
            x1, y1 = u - bw_px / 2, v - bh_px
            x2, y2 = u + bw_px / 2, v
            player_boxes[t, p] = (x1, y1, x2, y2)
            if x2 < 0 or x1 >= width or y2 < 0 or y1 >= height:
                continue
            # legs (dark), torso (jersey), head (skin)
            cv2.rectangle(img, (int(x1), int(v - bh_px * 0.45)), (int(x2), int(v)), (30, 30, 30), -1)
            cv2.rectangle(
                img,
                (int(x1), int(y1 + bh_px * 0.18)),
                (int(x2), int(v - bh_px * 0.45)),
                jersey[int(team[p])],
                -1,
            )
            cv2.circle(img, (int(u), int(y1 + bh_px * 0.1)), max(2, int(4 * scale)), (150, 190, 220), -1)
        cv2.circle(img, (int(bi[0]), int(bi[1]) - 4), 5, (250, 250, 250), -1)
        frames[t] = img

    kp_img = project(H0, pitch.WORLD_XY)
    return SyntheticScene(
        frames=frames,
        H_world_to_image=H0,
        H_image_to_world=np.linalg.inv(H0),
        player_world=player_world,
        player_feet_image=player_feet,
        player_boxes=player_boxes,
        player_team=team,
        ball_world=ball_world,
        ball_image=ball_image,
        keypoints_image=kp_img,
        fps=fps,
    )
