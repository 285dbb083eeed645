"""Processor: post-processing from raw per-frame coordinates to
analysis-ready tables (reference eagle/processor.py:64-520).

Stages (process_data):
  1. wide DataFrame build with per-id columns + ball-candidate selection
     through a constant-velocity Kalman filter (image coords gate pitch
     coords)
  2. team assignment by per-crop KMeans jersey-color voting
  3. goalkeeper/player id unification + track-fragment merging
  4. per-column linear interpolation (+ optional smoothing)

Parity notes:
- The ball Kalman selector reproduces cv2.KalmanFilter semantics exactly
  (including the reference's correct-before-predict no-op on the first
  detection) via :class:`eagle_tpu.ops.kalman.CvKalman2D`.
- The reference's temporal/spatial fragment merge is dead code: its
  overlap test (processor.py:245-249) is a tautology (A.last >= B.first
  or B.last >= A.first holds for any two non-empty tracks), so no pair is
  ever merged.  This implementation performs the *intended* merge
  (disjoint in time, gap <= fps*1.1 frames, image distance <= 10*gap px,
  same/unknown team); set ProcessorConfig.enable_fragment_merge=False for
  bug-compatible behavior.
"""

from __future__ import annotations

import math
from collections import Counter

import cv2
import numpy as np
import pandas as pd

from eagle_tpu.config import ProcessorConfig
from eagle_tpu.ops.kalman import CvKalman2D

PITCH_WIDTH = 105
PITCH_HEIGHT = 68

#: jersey color bins as cv2-HSV (lower, upper) ranges (processor.py:10-23)
COLOR_RANGES = {
    "red": [(0, 100, 100), (10, 255, 255)],
    "red2": [(160, 100, 100), (179, 255, 255)],
    "orange": [(11, 100, 100), (25, 255, 255)],
    "yellow": [(26, 100, 100), (35, 255, 255)],
    "green": [(36, 100, 100), (85, 255, 255)],
    "cyan": [(86, 100, 100), (95, 255, 255)],
    "blue": [(96, 100, 100), (125, 255, 255)],
    "purple": [(126, 100, 100), (145, 255, 255)],
    "magenta": [(146, 100, 100), (159, 255, 255)],
    "white": [(0, 0, 200), (180, 30, 255)],
    "gray": [(0, 0, 50), (180, 30, 200)],
    "black": [(0, 0, 0), (180, 255, 50)],
}
color_ranges = COLOR_RANGES  # reference-compatible alias


def calculate_distance(pt1, pt2):
    return np.sqrt((pt1[0] - pt2[0]) ** 2 + (pt1[1] - pt2[1]) ** 2)


def _split_xy(values) -> tuple[np.ndarray, np.ndarray]:
    """Object column of (x, y) tuples / NaN -> two float arrays."""
    values = np.asarray(values, dtype=object)
    n = len(values)
    x = np.empty(n, np.float64)
    y = np.empty(n, np.float64)
    for i in range(n):
        v = values[i]
        if isinstance(v, (list, tuple)):
            x[i] = v[0]
            y[i] = v[1]
        else:
            x[i] = np.nan
            y[i] = np.nan
    return x, y


def _join_xy(x: np.ndarray, y: np.ndarray, index) -> pd.Series:
    vals = [
        (xi, yi) if not (math.isnan(xi) and math.isnan(yi)) else np.nan
        for xi, yi in zip(x.tolist(), y.tolist())
    ]
    return pd.Series(vals, index=index, dtype=object)


def _interp1(a: np.ndarray, fill: bool) -> np.ndarray:
    """pandas ``Series.interpolate(method='linear')`` semantics on a float
    array: positional basis via np.interp (the same primitive pandas
    calls).  ``fill`` clamps both edges (== interpolate().bfill().ffill());
    otherwise values outside [first_valid, last_valid] stay NaN
    (== limit_area='inside')."""
    valid = ~np.isnan(a)
    nv = int(valid.sum())
    if nv == 0 or nv == len(a):
        return a
    idx = np.flatnonzero(valid)
    pos = np.arange(len(a), dtype=np.float64)
    out = a.copy()
    gaps = ~valid
    out[gaps] = np.interp(pos[gaps], pos[idx], a[idx])
    if not fill:
        out[: idx[0]] = np.nan
        out[idx[-1] + 1 :] = np.nan
    return out


def interpolate_df(df: pd.DataFrame, col_name: str, fill: bool = False) -> pd.DataFrame:
    """Linear interpolation of a tuple-valued column (processor.py:30-45):
    ``fill`` additionally back/forward-fills the edges (ball columns)."""
    x, y = _split_xy(df[col_name].to_numpy())
    df[col_name] = _join_xy(_interp1(x, fill), _interp1(y, fill), df.index)
    return df


def smooth_df(df: pd.DataFrame, col_name: str) -> pd.DataFrame:
    """NaN every 2nd sample then re-interpolate (processor.py:48-61)."""
    x, y = _split_xy(df[col_name].to_numpy())
    x[::2] = np.nan
    y[::2] = np.nan
    df[col_name] = _join_xy(_interp1(x, False), _interp1(y, False), df.index)
    return df


def _init_ball_kf(detections: list, num_to_init: int):
    """Ball-selector KF initialization (reference processor.py:324-352):
    collect the leading window of candidates, linearly fill gaps, seed the
    filter with the first position and the mean inter-frame velocity.
    Returns None when fewer than 2 non-None candidates exist."""
    init_vals = []
    non_none = 0
    i = 0
    while True:
        if non_none >= 2 and len(init_vals) >= num_to_init:
            break
        if i == len(detections):
            break
        curr = detections[i]
        if curr is not None:
            init_vals.append(curr[0])
            non_none += 1
        else:
            init_vals.append(None)
        i += 1

    if non_none < 2:
        return None

    xs = pd.Series([v[0] if v is not None else None for v in init_vals], dtype=float)
    ys = pd.Series([v[1] if v is not None else None for v in init_vals], dtype=float)
    xs = xs.interpolate(method="linear").bfill().ffill().tolist()
    ys = ys.interpolate(method="linear").bfill().ffill().tolist()
    init_vals = list(zip(xs, ys))
    vels = [
        (init_vals[k][0] - init_vals[k - 1][0], init_vals[k][1] - init_vals[k - 1][1])
        for k in range(1, len(init_vals))
    ]
    avg_vel = (np.mean([v[0] for v in vels]), np.mean([v[1] for v in vels]))
    return CvKalman2D(init_vals[0], avg_vel)


class _BallSelectState:
    """The ball selector's sequential carry: the cv2-style KF plus the
    previous accepted pick -- snapshotable so time-sharded segments can
    warm-start from a neighbor's final state."""

    def __init__(self, kf: CvKalman2D):
        self.kf = kf
        self.prev_pos = None  # stored column-vector shaped, like the reference
        self.prev_idx = None
        self.removed = 0

    def clone(self) -> "_BallSelectState":
        import copy

        out = _BallSelectState(copy.deepcopy(self.kf))
        out.prev_pos = None if self.prev_pos is None else self.prev_pos.copy()
        out.prev_idx = self.prev_idx
        out.removed = 0
        return out


def _ball_select_step(state: _BallSelectState, i: int, candidates, filter: bool, threshold: float):
    """One frame of the reference's selection loop (processor.py:363-391),
    mutating ``state`` and returning the picked position (or None)."""
    kf = state.kf
    if candidates is None or len(candidates) == 0:
        return None
    if len(candidates) == 1:
        meas = np.array([[np.float32(candidates[0][0])], [np.float32(candidates[0][1])]])
    else:
        pred = kf.predict()
        pred_pos = (pred[0, 0], pred[1, 0])
        d_pred = [np.linalg.norm(np.array(c) - np.array(pred_pos)) for c in candidates]
        if state.prev_pos is not None:
            # bug-compatible: (2,) - (2,1) broadcasts to a 2x2 difference
            # whose Frobenius norm the reference uses
            d_prev = [np.linalg.norm(np.array(c) - np.array(state.prev_pos)) for c in candidates]
            dists = [0.5 * a + 0.5 * b for a, b in zip(d_pred, d_prev)]
        else:
            dists = d_pred
        best = candidates[int(np.argmin(dists))]
        meas = np.array([[np.float32(best[0])], [np.float32(best[1])]])

    if filter:
        if state.prev_pos is not None:
            dist = float(calculate_distance((meas[0, 0], meas[1, 0]), state.prev_pos)[0])
            if dist > threshold * (i - state.prev_idx):
                state.removed += 1
                return None
        kf.correct(meas)
        if state.prev_pos is not None:
            kf.predict()
        state.prev_pos = meas
        state.prev_idx = i
        return (float(meas[0, 0]), float(meas[1, 0]))
    return (float(meas[0, 0]), float(meas[1, 0]))


class Processor:
    def __init__(
        self,
        coords: dict,
        frames,
        fps: int,
        debug: bool = False,
        filter_ball_detections: bool = False,
        config: ProcessorConfig | None = None,
    ):
        assert len(coords) == len(frames), (
            f"Length of coords ({len(coords)}) and frames ({len(frames)}) should be the same"
        )
        self.coords = coords
        self.frames = frames
        self.fps = fps
        self.debug = debug
        self.filter_ball_detections = filter_ball_detections
        self.config = config or ProcessorConfig()

    # ------------------------------------------------------------------

    def process_data(self, smooth: bool = False) -> tuple[pd.DataFrame, dict]:
        # dispatch the (async) device team-color votes first so the TPU
        # crunches crops while the host builds the wide table
        pending_votes = self._start_team_votes()
        df = self.create_dataframe()
        if df.empty:
            return df, {}
        df = interpolate_df(df, "Ball", fill=True)
        df = interpolate_df(df, "Ball_video", fill=True)
        team_mapping = self._finish_team_mapping(pending_votes)
        df.index = df.index.astype(int)
        df = self.merge_data(df, team_mapping)
        for col in df.columns:
            df = interpolate_df(df, col, fill=False)
            if smooth:
                df = smooth_df(df, col)
        return df, team_mapping

    def format_data(self, df: pd.DataFrame) -> pd.DataFrame:
        """Long-format per-frame records (processor.py:89-125)."""
        corner_cols = ["Bottom_Left", "Top_Left", "Top_Right", "Bottom_Right"]
        if df.empty:
            # no-detection clip: the reference's per-row loop simply never
            # iterates (processor.py:92-123); the eager column lookups
            # below would KeyError instead
            return pd.DataFrame()
        # one numpy materialization + precomputed per-column metadata
        # instead of a pandas label lookup per cell (the reference's
        # df.loc-per-frame loop costs ~1.5 ms/frame at production load)
        cols = list(df.columns)
        pos = {c: j for j, c in enumerate(cols)}
        values = df.to_numpy()
        corner_pos = [pos[c] for c in corner_cols]
        ball_pos, ball_video_pos = pos["Ball"], pos["Ball_video"]
        entity_cols = []  # (column index, ID, Type, is_video)
        for c in cols:
            if c in corner_cols or "ball" in c.lower():
                continue
            parts = c.split("_")
            entity_cols.append((pos[c], int(parts[1]), parts[0], "video" in c))

        out = []
        for i in range(len(values)):
            row = values[i]
            rec = {"Boundaries": [row[j] for j in corner_pos]}
            data, data_video = [], []
            for j, oid, typ, is_video in entity_cols:
                val = row[j]
                if isinstance(val, float) and pd.isna(val):
                    continue
                item = {"ID": oid, "Coordinates": val, "Type": typ}
                (data_video if is_video else data).append(item)
            data.append({"ID": "Ball", "Coordinates": row[ball_pos]})
            data_video.append({"ID": "Ball", "Coordinates": row[ball_video_pos]})
            rec["Coordinates"] = data
            rec["Coordinates_video"] = data_video
            out.append(rec)
        return pd.DataFrame(out)

    # ------------------------------------------------------------------

    def create_dataframe(self) -> pd.DataFrame:
        """Wide table build (processor.py:127-203): one row per frame with
        at least one person detection; ball candidates resolved over the
        full timeline and aligned to the kept rows."""
        ball_img_candidates = []
        ball_pitch_candidates = []
        rows = {}
        frame_keys = list(self.coords.keys())

        for fk in frame_keys:
            curr = self.coords[fk]
            b = curr["Boundaries"]
            row = {
                "Bottom_Left": b[0],
                "Top_Left": b[1],
                "Top_Right": b[2],
                "Bottom_Right": b[3],
            }
            cd = curr.get("Coordinates", {})
            has_person = False
            for name in ("Player", "Goalkeeper"):
                for oid, item in cd.get(name, {}).items():
                    x1, y1, x2, y2 = item["BBox"]
                    row[f"{name}_{oid}"] = (
                        item.get("Transformed_Coordinates")
                        if item.get("Transformed_Coordinates")
                        else np.nan
                    )
                    row[f"{name}_{oid}_video"] = ((x1 + x2) / 2, y2)
                    has_person = True

            balls = cd.get("Ball", {})
            if balls:
                img, pitchc = [], []
                for item in balls.values():
                    conf = float(item["Confidence"])
                    x1, y1, x2, y2 = item["BBox"]
                    center = ((x1 + x2) / 2, y2)
                    tc = item["Transformed_Coordinates"] or center
                    img.append((center, conf))
                    pitchc.append((tc, conf))
                img.sort(key=lambda t: t[1], reverse=True)
                pitchc.sort(key=lambda t: t[1], reverse=True)
                ball_img_candidates.append([c for c, _ in img])
                ball_pitch_candidates.append([c for c, _ in pitchc])
            else:
                ball_img_candidates.append(None)
                ball_pitch_candidates.append(None)

            if has_person:
                rows[fk] = row

        h, w = np.asarray(self.frames[0]).shape[:2]
        ball_img = self.parse_ball_detections_with_kalman(
            ball_img_candidates,
            num_to_init=self.config.ball_kalman_init,
            filter=self.filter_ball_detections,
            threshold=0.1 * w,
        )
        ball_pitch = self.parse_ball_detections_with_kalman(
            ball_pitch_candidates, num_to_init=self.config.ball_kalman_init, filter=False
        )
        # image-coordinate acceptance gates the pitch coordinates
        ball_pitch = [
            ball_pitch[i] if ball_img[i] is not None else None for i in range(len(ball_img))
        ]

        # column-wise construction (identical index/column order to
        # ``pd.DataFrame(rows).T``: kept-frame order x first-appearance
        # column order) without the object-block transpose+inference pass
        if rows:
            col_order: list = []
            col_data: dict = {}
            for fk, row in rows.items():
                for k, v in row.items():
                    if k not in col_data:
                        col_order.append(k)
                        col_data[k] = {}
                    col_data[k][fk] = v
            index = list(rows.keys())
            df = pd.DataFrame(
                {c: pd.Series(col_data[c], index=index, dtype=object) for c in col_order},
                index=index,
            )
        else:
            df = pd.DataFrame(rows).T
        if len(df) > 0:
            img_series = pd.Series(
                [v if v is not None else np.nan for v in ball_img], index=frame_keys, dtype=object
            )
            pitch_series = pd.Series(
                [v if v is not None else np.nan for v in ball_pitch], index=frame_keys, dtype=object
            )
            df["Ball"] = pitch_series.loc[df.index]
            df["Ball_video"] = img_series.loc[df.index]
            # drop ids seen in < 1% of kept frames
            df = df.loc[:, df.notna().sum() >= self.config.min_coverage * len(df)]
        return df

    # ------------------------------------------------------------------

    def parse_ball_detections_with_kalman(
        self, detections: list, num_to_init: int = 5, filter: bool = True, threshold: float = 100
    ) -> list:
        """Pick one ball position per frame from ranked candidate lists
        (processor.py:321-403): a constant-velocity KF prediction plus the
        previous pick break ties; the optional jump filter rejects
        teleports larger than threshold x frame-gap."""
        kf = _init_ball_kf(detections, num_to_init)
        if kf is None:
            print("Not enough non-None coordinates to initialize Kalman Filter")
            return detections

        state = _BallSelectState(kf)
        positions = []
        for i, candidates in enumerate(detections):
            positions.append(_ball_select_step(state, i, candidates, filter, threshold))
        if self.debug and filter:
            print(f"Removed {state.removed} detections")
        return positions

    # ------------------------------------------------------------------

    def parse_ball_detections_segmented(
        self,
        detections: list,
        segments: int,
        num_to_init: int = 5,
        filter: bool = True,
        threshold: float = 100,
        passes: int = 2,
    ) -> list:
        """Time-sharded variant of :meth:`parse_ball_detections_with_kalman`
        using the same warm-start scheme as the keypoint/homography scan
        (parallel/timeshard.py): pass 1 runs every segment from a cold
        start, later passes re-run each segment seeded with its left
        neighbor's final selector state from the previous pass.

        Exactness envelope (measured in tests/test_timeshard.py): segment 0
        is always exact; after ``p`` passes segments 1..p-1 are exact; the
        remaining segments carry a cold-start transient that the constant-
        velocity KF forgets geometrically (sub-pixel within ~10 frames of
        a boundary on broadcast-like streams).
        """
        n = len(detections)
        bounds = [round(k * n / segments) for k in range(segments + 1)]
        outs: list[list] = [None] * segments
        carries: list = [None] * segments  # final state leaving segment k
        no_kf = [False] * segments  # segment never got a selector state

        for p in range(passes):
            # segments of one pass run concurrently: every warm start reads
            # the PREVIOUS pass's carries (like the ppermute ring)
            prev_carries = list(carries)
            for k in range(segments):
                if p > 0 and k == 0:
                    continue  # cold == sequential for segment 0: exact
                s0, s1 = bounds[k], bounds[k + 1]
                seg = detections[s0:s1]
                if p == 0 or prev_carries[k - 1] is None:
                    kf = _init_ball_kf(seg, num_to_init)
                    if kf is None:
                        outs[k] = list(seg)
                        carries[k] = None
                        no_kf[k] = True
                        continue
                    state = _BallSelectState(kf)
                else:
                    state = prev_carries[k - 1].clone()
                positions = []
                for j, candidates in enumerate(seg):
                    positions.append(
                        _ball_select_step(state, s0 + j, candidates, filter, threshold)
                    )
                outs[k] = positions
                carries[k] = state
                no_kf[k] = False
        if any(no_kf):
            # a segment could neither init its own KF nor inherit a warm
            # carry within ``passes`` -- its entries would leak raw
            # candidate LISTS, violating the (x, y)|None contract of the
            # sequential selector. Rare (ball absent for a whole segment
            # and its neighbor): fall back to the exact sequential pass.
            return self.parse_ball_detections_with_kalman(
                detections, num_to_init=num_to_init, filter=filter, threshold=threshold
            )
        return [pos for seg in outs for pos in seg]

    # ------------------------------------------------------------------

    def get_team_mapping(self) -> dict:
        """Vote a team id per player from jersey colors (processor.py:405-465):
        per-crop KMeans foreground segmentation + HSV range counting, votes
        weighted by (1 - overlap), outliers reassigned to their best of the
        two most common colors.

        Backends: ``config.team_assign == "host"`` runs one sklearn KMeans
        per crop (exact reference parity); ``"device"`` resamples every
        eligible crop to a fixed grid and clusters all of them in a single
        batched device pass (the fast path for the reference's slowest
        post-processing stage)."""
        return self._finish_team_mapping(self._start_team_votes())

    def _crop_entries(self) -> list:
        """Eligible (frame_index, pid, bbox, prop_overlap) crop entries
        (the reference's per-crop loop preamble, processor.py:419-434)."""
        entries = []  # (frame_key_index, pid, bbox, prop_overlap)
        frame_keys = list(self.coords.keys())
        for fi, fk in enumerate(frame_keys):
            players = self.coords[fk].get("Coordinates", {}).get("Player", {})
            if not players:
                continue
            pids = list(players.keys())
            items = list(players.values())
            b = np.asarray([it["BBox"] for it in items], np.float64)  # (P, 4)
            sizes = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            # pairwise intersection areas; pairs with IDENTICAL coords are
            # skipped (the reference compares bbox VALUES, not identity, so
            # duplicate boxes ignore each other too)
            ox = np.minimum(b[:, None, 2], b[None, :, 2]) - np.maximum(b[:, None, 0], b[None, :, 0])
            oy = np.minimum(b[:, None, 3], b[None, :, 3]) - np.maximum(b[:, None, 1], b[None, :, 1])
            inter = np.maximum(ox, 0) * np.maximum(oy, 0)
            same = (b[:, None, :] == b[None, :, :]).all(-1)
            inter[same] = 0.0
            max_overlap = inter.max(axis=1) if len(b) > 1 else np.zeros(len(b))
            for k, (pid, it) in enumerate(zip(pids, items)):
                size = sizes[k]
                if size <= 0:
                    continue
                prop_overlap = max_overlap[k] / size
                if prop_overlap > self.config.max_crop_overlap:
                    continue
                if size < 4:
                    continue  # degenerate crop (the reference would crash)
                x1, y1, x2, y2 = it["BBox"]
                entries.append((fi, int(pid), (x1, y1, x2, y2), prop_overlap))
        return entries

    def _start_team_votes(self):
        """Device backend: gather crops on host and DISPATCH the batched
        KMeans+HSV vote kernel without blocking (jax async dispatch), so
        the device computes while the host builds the dataframe.  Returns
        (entries, device_votes | None)."""
        entries = self._crop_entries()
        if self.config.team_assign != "device" or not entries:
            return (entries, None)
        from eagle_tpu.ops.kmeans import crop_color_votes, gather_crops_host
        import jax.numpy as jnp

        fidx = np.array([e[0] for e in entries], np.int32)
        boxes = np.array([e[2] for e in entries], np.float32)
        # crops are tiny; gather them on host so only (B, gh, gw, 3)
        # uint8s cross the link instead of every full frame
        crops = gather_crops_host(self.frames, fidx, boxes, grid_hw=self.config.crop_hw)
        return (entries, crop_color_votes(jnp.asarray(crops), iters=self.config.kmeans_iters))

    def _finish_team_mapping(self, pending) -> dict:
        entries, dev_votes = pending
        counts: dict[int, dict[str, float]] = {}
        if dev_votes is not None:
            from eagle_tpu.ops.kmeans import COLOR_NAMES

            votes = np.asarray(dev_votes)  # blocks on the device result
            # accumulate in the HOST backend's exact insertion order (entries
            # order per pid; per-crop colors count-desc, ties in COLOR_NAMES
            # order) so max()/Counter tie-breaks match it bit-for-bit
            for k, (_fi, pid, _box, prop) in enumerate(entries):
                v = votes[k]
                pos = np.flatnonzero(v > 0)
                pos = pos[np.argsort(-v[pos], kind="stable")]
                if len(pos) == 0:
                    continue
                cc = counts.setdefault(int(pid), {})
                for ci in pos:
                    name = COLOR_NAMES[ci]
                    cc[name] = cc.get(name, 0.0) + 1.0 - prop
        else:
            for fi, pid, (x1, y1, x2, y2), prop in entries:
                crop = np.asarray(self.frames[fi])[y1:y2, x1:x2]
                for color, _cnt in self.detect_color(crop):
                    counts.setdefault(pid, {}).setdefault(color, 0.0)
                    counts[pid][color] += 1 - prop

        best_color = {pid: max(cc, key=cc.get) for pid, cc in counts.items()}
        top2 = Counter(best_color.values()).most_common(2)
        id_map = {color: i for i, (color, _) in enumerate(top2)}
        mapping = {}
        for pid, color in best_color.items():
            if color in id_map:
                mapping[pid] = id_map[color]
            else:  # outlier: best of the two team colors from the raw votes
                cc = [(c, v) for c, v in counts[pid].items() if c in id_map]
                if not cc:
                    print(f"Unable to determine team for player {pid}")
                    continue
                cc.sort(key=lambda t: t[1], reverse=True)
                mapping[pid] = id_map[cc[0][0]]
        return mapping

    def detect_color(self, image: np.ndarray) -> list[tuple[str, int]]:
        """Foreground jersey-color histogram for one crop
        (processor.py:467-503): KMeans(k=2) on RGB pixels, corner-majority
        cluster = background, HSV range counts on the foreground."""
        from sklearn.cluster import KMeans

        hsv = cv2.cvtColor(image, cv2.COLOR_BGR2HSV)
        rgb = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        labels = (
            KMeans(n_clusters=2, random_state=0)
            .fit(rgb.reshape(-1, 3))
            .labels_.reshape(image.shape[:2])
        )
        corners = [labels[0, 0], labels[0, -1], labels[-1, 0], labels[-1, -1]]
        background = max(set(corners), key=corners.count)
        player_mask = (labels != background).astype(np.uint8) * 255

        hsv = cv2.bitwise_and(hsv, hsv, mask=player_mask)
        out = {}
        for color, (lo, hi) in COLOR_RANGES.items():
            m = cv2.inRange(hsv, np.array(lo, np.uint8), np.array(hi, np.uint8))
            m = cv2.bitwise_and(m, m, mask=player_mask)
            out[color] = cv2.countNonZero(m)
        out["red"] += out.pop("red2")
        result = [(c, v) for c, v in out.items() if v > 0]
        result.sort(key=lambda t: t[1], reverse=True)
        return result

    # ------------------------------------------------------------------

    def merge_data(self, df: pd.DataFrame, team_mapping: dict) -> pd.DataFrame:
        """Id unification (processor.py:205-319): ids seen as both player
        and goalkeeper collapse into the goalkeeper columns; then track
        fragments are merged (see module docstring re the reference bug)."""
        gk_ids = [c.split("_")[1] for c in df.columns if "Goalkeeper" in c and "video" in c]
        for gid in gk_ids:
            pc, pcv = f"Player_{gid}", f"Player_{gid}_video"
            gc, gcv = f"Goalkeeper_{gid}", f"Goalkeeper_{gid}_video"
            if pc in df.columns and pcv in df.columns:
                df[gc] = df[pc].combine_first(df[gc])
                df[gcv] = df[pcv].combine_first(df[gcv])
                df = df.drop(columns=[pc, pcv])

        if not self.config.enable_fragment_merge:
            return df

        video_cols = [c for c in df.columns if "Ball" not in c and "video" in c]
        gap_limit = int(self.fps * self.config.merge_gap_seconds)
        spans = {
            c: (df[c].first_valid_index(), df[c].last_valid_index()) for c in video_cols
        }

        to_merge = []
        for col in video_cols:
            kind = "Player" if "Player" in col else "Goalkeeper"
            c_first, c_last = spans[col]
            if c_first is None:
                continue
            for cand in video_cols:
                if cand == col or kind not in cand:
                    continue
                a_first, a_last = spans[cand]
                if a_first is None:
                    continue
                # temporally disjoint only (the *intended* reference check)
                if c_last >= a_first and a_last >= c_first:
                    continue
                # earlier track's end vs later track's start
                if a_first < c_first:
                    gap_start, gap_start_val = a_last, df[cand].loc[a_last]
                    gap_end, gap_end_val = c_first, df[col].loc[c_first]
                else:
                    gap_start, gap_start_val = c_last, df[col].loc[c_last]
                    gap_end, gap_end_val = a_first, df[cand].loc[a_first]
                gap = abs(gap_end - gap_start)
                if gap > gap_limit:
                    continue
                if calculate_distance(gap_end_val, gap_start_val) > self.config.merge_px_per_frame * gap:
                    continue
                cid = int(col.split("_")[1])
                aid = int(cand.split("_")[1])
                if cid in team_mapping and aid in team_mapping:
                    if team_mapping[cid] != team_mapping[aid]:
                        continue
                to_merge.append((col, cand))

        to_merge.extend(
            [(a.replace("_video", ""), b.replace("_video", "")) for a, b in to_merge]
        )
        if self.debug:
            print(f"Merging {len(to_merge)} columns")
            print("To Merge:", to_merge)

        merged: dict[str, str] = {}

        def root(c):
            while c in merged:
                c = merged[c]
            return c

        for a, b in to_merge:
            ra, rb = root(a), root(b)
            if ra != rb and ra in df.columns and rb in df.columns:
                df[ra] = df[ra].combine_first(df[rb])
                df = df.drop(columns=[rb])
                merged[rb] = ra
        return df


class KalmanFilter(CvKalman2D):
    """Reference-compatible alias (processor.py:506-520)."""
