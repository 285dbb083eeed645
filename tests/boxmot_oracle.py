"""Pure-numpy transcription of boxmot 15.0.2's BoTSORT tracker.

The reference drives boxmot's BotSort with default arguments
(/root/reference/eagle/models/coordinate_model.py:68-72) and consumes
``update(Nx6 [xyxy, conf, cls], frame) -> Mx8 [xyxy, id, conf, cls,
det_ind]`` (:577).  boxmot is not installed in this environment, so this
module transcribes its update loop (botsort.py / basetrack.py /
kalman_filter XYWH / matching.py, boxmot 15.0.2) object-for-object as a
test oracle: track lifecycle, two-stage BYTE association, the unconfirmed
stage, duplicate suppression, lapjv-with-cost-limit assignment, and the
size-scaled constant-velocity Kalman filter.

Simplifications (documented in docs/parity.md): no per-class cls-history
voting (test streams keep classes stable), embeddings are caller-supplied
(the real boxmot runs OSNet on crops), and GMC warps are caller-supplied
(the real boxmot estimates them from the image).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg
from scipy.optimize import linear_sum_assignment

# ---------------------------------------------------------------------------
# Kalman filter (boxmot/motion/kalman_filters/aabb/xywh_kf.py)
# ---------------------------------------------------------------------------


class KalmanFilterXYWH:
    def __init__(self):
        ndim, dt = 4, 1.0
        self._motion_mat = np.eye(2 * ndim, 2 * ndim)
        for i in range(ndim):
            self._motion_mat[i, ndim + i] = dt
        self._update_mat = np.eye(ndim, 2 * ndim)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def initiate(self, measurement):
        mean_pos = measurement
        mean_vel = np.zeros_like(mean_pos)
        mean = np.r_[mean_pos, mean_vel]
        std = [
            2 * self._std_weight_position * measurement[2],
            2 * self._std_weight_position * measurement[3],
            2 * self._std_weight_position * measurement[2],
            2 * self._std_weight_position * measurement[3],
            10 * self._std_weight_velocity * measurement[2],
            10 * self._std_weight_velocity * measurement[3],
            10 * self._std_weight_velocity * measurement[2],
            10 * self._std_weight_velocity * measurement[3],
        ]
        covariance = np.diag(np.square(std))
        return mean, covariance

    def predict(self, mean, covariance):
        std_pos = [
            self._std_weight_position * mean[2],
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[2],
            self._std_weight_position * mean[3],
        ]
        std_vel = [
            self._std_weight_velocity * mean[2],
            self._std_weight_velocity * mean[3],
            self._std_weight_velocity * mean[2],
            self._std_weight_velocity * mean[3],
        ]
        motion_cov = np.diag(np.square(np.r_[std_pos, std_vel]))
        mean = np.dot(mean, self._motion_mat.T)
        covariance = (
            np.linalg.multi_dot((self._motion_mat, covariance, self._motion_mat.T))
            + motion_cov
        )
        return mean, covariance

    def project(self, mean, covariance):
        std = [
            self._std_weight_position * mean[2],
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[2],
            self._std_weight_position * mean[3],
        ]
        innovation_cov = np.diag(np.square(std))
        mean = np.dot(self._update_mat, mean)
        covariance = np.linalg.multi_dot(
            (self._update_mat, covariance, self._update_mat.T)
        )
        return mean, covariance + innovation_cov

    def update(self, mean, covariance, measurement):
        projected_mean, projected_cov = self.project(mean, covariance)
        chol_factor, lower = scipy.linalg.cho_factor(
            projected_cov, lower=True, check_finite=False
        )
        kalman_gain = scipy.linalg.cho_solve(
            (chol_factor, lower),
            np.dot(covariance, self._update_mat.T).T,
            check_finite=False,
        ).T
        innovation = measurement - projected_mean
        new_mean = mean + np.dot(innovation, kalman_gain.T)
        new_covariance = covariance - np.linalg.multi_dot(
            (kalman_gain, projected_cov, kalman_gain.T)
        )
        return new_mean, new_covariance


# ---------------------------------------------------------------------------
# matching (boxmot/utils/matching.py)
# ---------------------------------------------------------------------------


def _box_iou(a, b):
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)


def iou_distance(atracks, btracks):
    a = [t.xyxy for t in atracks]
    b = [t.xyxy for t in btracks]
    return 1.0 - _box_iou(a, b)


def embedding_distance(tracks, detections):
    cost = np.zeros((len(tracks), len(detections)), np.float32)
    if cost.size == 0:
        return cost
    det_features = np.asarray([d.curr_feat for d in detections], np.float32)
    track_features = np.asarray([t.smooth_feat for t in tracks], np.float32)
    # boxmot: cdist(..., 'cosine') clipped at 0
    sim = track_features @ det_features.T
    return np.maximum(0.0, 1.0 - sim)


def fuse_score(cost_matrix, detections):
    if cost_matrix.size == 0:
        return cost_matrix
    iou_sim = 1.0 - cost_matrix
    det_scores = np.array([d.conf for d in detections])
    fuse_sim = iou_sim * det_scores[None, :]
    return 1.0 - fuse_sim


def linear_assignment(cost_matrix, thresh):
    """lap.lapjv(cost, extend_cost=True, cost_limit=thresh) emulated with
    scipy on the lap library's extended matrix (unmatching a pair costs
    exactly ``thresh``)."""
    if cost_matrix.size == 0:
        return (
            np.empty((0, 2), int),
            tuple(range(cost_matrix.shape[0])),
            tuple(range(cost_matrix.shape[1])),
        )
    n, m = cost_matrix.shape
    ext = np.full((n + m, n + m), thresh / 2.0)
    ext[n:, m:] = 0.0
    ext[:n, :m] = cost_matrix
    rows, cols = linear_sum_assignment(ext)
    matches, u_track, u_det = [], [], []
    x = np.full(n, -1, int)
    for r, c in zip(rows, cols):
        if r < n and c < m:
            x[r] = c
    for r in range(n):
        if x[r] >= 0:
            matches.append([r, x[r]])
        else:
            u_track.append(r)
    matched_cols = {c for _, c in matches}
    u_det = [c for c in range(m) if c not in matched_cols]
    return np.asarray(matches, int).reshape(-1, 2), u_track, u_det


# ---------------------------------------------------------------------------
# STrack (boxmot/trackers/botsort/botsort_track.py)
# ---------------------------------------------------------------------------


class TrackState:
    New = 0
    Tracked = 1
    Lost = 2
    Removed = 3


def xyxy2xywh(x):
    x1, y1, x2, y2 = x[:4]
    return np.asarray([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], float)


class STrack:
    shared_kalman = KalmanFilterXYWH()
    _count = 0

    def __init__(self, det, feat=None, feat_history=50):
        self.xywh = xyxy2xywh(det[:4])
        self.conf = det[4]
        self.cls = det[5]
        self.det_ind = det[6]
        self.kalman_filter = None
        self.mean, self.covariance = None, None
        self.is_activated = False
        self.state = TrackState.New
        self.id = 0
        self.frame_id = 0
        self.start_frame = 0
        self.alpha = 0.9
        self.smooth_feat = None
        self.curr_feat = None
        if feat is not None:
            self.update_features(feat)

    @staticmethod
    def next_id():
        STrack._count += 1
        return STrack._count

    @staticmethod
    def reset_count():
        STrack._count = 0

    def update_features(self, feat):
        feat = feat / np.linalg.norm(feat)
        self.curr_feat = feat
        if self.smooth_feat is None:
            self.smooth_feat = feat
        else:
            self.smooth_feat = self.alpha * self.smooth_feat + (1 - self.alpha) * feat
        self.smooth_feat /= np.linalg.norm(self.smooth_feat)

    @property
    def xyxy(self):
        if self.mean is None:
            x, y, w, h = self.xywh
        else:
            x, y, w, h = self.mean[:4]
        return np.asarray([x - w / 2, y - h / 2, x + w / 2, y + h / 2])

    @property
    def end_frame(self):
        return self.frame_id

    @staticmethod
    def multi_predict(stracks):
        for st in stracks:
            if st.state != TrackState.Tracked:
                st.mean[6] = 0
                st.mean[7] = 0
            st.mean, st.covariance = STrack.shared_kalman.predict(st.mean, st.covariance)

    @staticmethod
    def multi_gmc(stracks, H=np.eye(2, 3)):
        if len(stracks) == 0:
            return
        R = H[:2, :2]
        R8x8 = np.kron(np.eye(4, dtype=float), R)
        t = H[:2, 2]
        for st in stracks:
            st.mean = R8x8.dot(st.mean)
            st.mean[:2] += t
            st.covariance = R8x8.dot(st.covariance).dot(R8x8.transpose())

    def activate(self, kalman_filter, frame_id):
        self.kalman_filter = kalman_filter
        self.id = self.next_id()
        self.mean, self.covariance = self.kalman_filter.initiate(self.xywh)
        self.state = TrackState.Tracked
        if frame_id == 1:
            self.is_activated = True
        self.frame_id = frame_id
        self.start_frame = frame_id

    def re_activate(self, new_track, frame_id, new_id=False):
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, new_track.xywh
        )
        if new_track.curr_feat is not None:
            self.update_features(new_track.curr_feat)
        self.state = TrackState.Tracked
        self.is_activated = True
        self.frame_id = frame_id
        if new_id:
            self.id = self.next_id()
        self.conf = new_track.conf
        self.cls = new_track.cls
        self.det_ind = new_track.det_ind

    def update(self, new_track, frame_id):
        self.frame_id = frame_id
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, new_track.xywh
        )
        if new_track.curr_feat is not None:
            self.update_features(new_track.curr_feat)
        self.state = TrackState.Tracked
        self.is_activated = True
        self.conf = new_track.conf
        self.cls = new_track.cls
        self.det_ind = new_track.det_ind


def joint_stracks(tlista, tlistb):
    exists = {}
    res = []
    for t in tlista:
        exists[t.id] = 1
        res.append(t)
    for t in tlistb:
        if not exists.get(t.id, 0):
            exists[t.id] = 1
            res.append(t)
    return res


def sub_stracks(tlista, tlistb):
    stracks = {t.id: t for t in tlista}
    for t in tlistb:
        stracks.pop(t.id, None)
    return list(stracks.values())


def remove_duplicate_stracks(stracksa, stracksb):
    pdist = iou_distance(stracksa, stracksb)
    pairs = np.where(pdist < 0.15)
    dupa, dupb = [], []
    for p, q in zip(*pairs):
        timep = stracksa[p].frame_id - stracksa[p].start_frame
        timeq = stracksb[q].frame_id - stracksb[q].start_frame
        if timep > timeq:
            dupb.append(q)
        else:
            dupa.append(p)
    resa = [t for i, t in enumerate(stracksa) if i not in dupa]
    resb = [t for i, t in enumerate(stracksb) if i not in dupb]
    return resa, resb


# ---------------------------------------------------------------------------
# BotSort (boxmot/trackers/botsort/botsort.py)
# ---------------------------------------------------------------------------


class BotSortOracle:
    def __init__(
        self,
        track_high_thresh=0.5,
        track_low_thresh=0.1,
        new_track_thresh=0.6,
        track_buffer=30,
        match_thresh=0.8,
        proximity_thresh=0.5,
        appearance_thresh=0.25,
        frame_rate=30,
        fuse_first_associate=False,
        with_reid=False,
    ):
        STrack.reset_count()
        self.active_tracks = []
        self.lost_stracks = []
        self.removed_stracks = []
        self.frame_count = 0
        self.track_high_thresh = track_high_thresh
        self.track_low_thresh = track_low_thresh
        self.new_track_thresh = new_track_thresh
        self.match_thresh = match_thresh
        self.proximity_thresh = proximity_thresh
        self.appearance_thresh = appearance_thresh
        self.fuse_first_associate = fuse_first_associate
        self.with_reid = with_reid
        self.buffer_size = int(frame_rate / 30.0 * track_buffer)
        self.max_time_lost = self.buffer_size
        self.kalman_filter = KalmanFilterXYWH()

    def update(self, dets, embs=None, warp=None):
        """dets (N, 6) [xyxy, conf, cls]; embs optional (N, E); warp
        optional (2, 3) camera motion.  Returns (M, 8)."""
        self.frame_count += 1
        activated_stracks, refind_stracks = [], []
        lost_stracks, removed_stracks = [], []

        dets = np.asarray(dets, float)
        dets = np.hstack([dets, np.arange(len(dets)).reshape(-1, 1)])
        confs = dets[:, 4]

        second_mask = np.logical_and(
            confs > self.track_low_thresh, confs < self.track_high_thresh
        )
        dets_second = dets[second_mask]
        first_mask = confs > self.track_high_thresh
        dets_first = dets[first_mask]
        if self.with_reid and embs is not None:
            features_high = np.asarray(embs, float)[first_mask]
            detections = [
                STrack(det, f) for det, f in zip(dets_first, features_high)
            ]
        else:
            detections = [STrack(det) for det in dets_first]

        unconfirmed, tracked_stracks = [], []
        for track in self.active_tracks:
            if not track.is_activated:
                unconfirmed.append(track)
            else:
                tracked_stracks.append(track)

        strack_pool = joint_stracks(tracked_stracks, self.lost_stracks)
        STrack.multi_predict(strack_pool)

        if warp is not None:
            STrack.multi_gmc(strack_pool, warp)
            STrack.multi_gmc(unconfirmed, warp)

        # first association
        ious_dists = iou_distance(strack_pool, detections)
        ious_dists_mask = ious_dists > self.proximity_thresh
        if self.fuse_first_associate:
            ious_dists = fuse_score(ious_dists, detections)
        if self.with_reid and embs is not None:
            emb_dists = embedding_distance(strack_pool, detections) / 2.0
            emb_dists[emb_dists > self.appearance_thresh] = 1.0
            emb_dists[ious_dists_mask] = 1.0
            dists = np.minimum(ious_dists, emb_dists)
        else:
            dists = ious_dists
        matches, u_track, u_detection = linear_assignment(dists, thresh=self.match_thresh)
        for itracked, idet in matches:
            track = strack_pool[itracked]
            det = detections[idet]
            if track.state == TrackState.Tracked:
                track.update(det, self.frame_count)
                activated_stracks.append(track)
            else:
                track.re_activate(det, self.frame_count, new_id=False)
                refind_stracks.append(track)

        # second association
        detections_second = [STrack(det) for det in dets_second]
        r_tracked_stracks = [
            strack_pool[i] for i in u_track if strack_pool[i].state == TrackState.Tracked
        ]
        dists = iou_distance(r_tracked_stracks, detections_second)
        matches, u_track, u_detection_second = linear_assignment(dists, thresh=0.5)
        for itracked, idet in matches:
            track = r_tracked_stracks[itracked]
            det = detections_second[idet]
            if track.state == TrackState.Tracked:
                track.update(det, self.frame_count)
                activated_stracks.append(track)
            else:
                track.re_activate(det, self.frame_count, new_id=False)
                refind_stracks.append(track)
        for it in u_track:
            track = r_tracked_stracks[it]
            if track.state != TrackState.Lost:
                track.state = TrackState.Lost
                lost_stracks.append(track)

        # unconfirmed
        detections = [detections[i] for i in u_detection]
        ious_dists = iou_distance(unconfirmed, detections)
        ious_dists_mask = ious_dists > self.proximity_thresh
        ious_dists = fuse_score(ious_dists, detections)
        if self.with_reid and embs is not None:
            emb_dists = embedding_distance(unconfirmed, detections) / 2.0
            emb_dists[emb_dists > self.appearance_thresh] = 1.0
            emb_dists[ious_dists_mask] = 1.0
            ious_dists = np.minimum(ious_dists, emb_dists)
        matches, u_unconfirmed, u_detection = linear_assignment(ious_dists, thresh=0.7)
        for itracked, idet in matches:
            unconfirmed[itracked].update(detections[idet], self.frame_count)
            activated_stracks.append(unconfirmed[itracked])
        for it in u_unconfirmed:
            track = unconfirmed[it]
            track.state = TrackState.Removed
            removed_stracks.append(track)

        # new tracks
        for inew in u_detection:
            track = detections[inew]
            if track.conf < self.new_track_thresh:
                continue
            track.activate(self.kalman_filter, self.frame_count)
            activated_stracks.append(track)

        # lost cleanup
        for track in self.lost_stracks:
            if self.frame_count - track.end_frame > self.max_time_lost:
                track.state = TrackState.Removed
                removed_stracks.append(track)

        self.active_tracks = [
            t for t in self.active_tracks if t.state == TrackState.Tracked
        ]
        self.active_tracks = joint_stracks(self.active_tracks, activated_stracks)
        self.active_tracks = joint_stracks(self.active_tracks, refind_stracks)
        self.lost_stracks = sub_stracks(self.lost_stracks, self.active_tracks)
        self.lost_stracks.extend(lost_stracks)
        self.lost_stracks = sub_stracks(self.lost_stracks, self.removed_stracks)
        self.active_tracks, self.lost_stracks = remove_duplicate_stracks(
            self.active_tracks, self.lost_stracks
        )
        self.removed_stracks.extend(removed_stracks)

        outputs = [
            [*t.xyxy, t.id, t.conf, t.cls, t.det_ind]
            for t in self.active_tracks
            if t.is_activated
        ]
        return np.asarray(outputs).reshape(-1, 8)
