"""OpenPose inference pipeline: peaks, PAF limb assembly, JSON output.

Host-side post-processing around :mod:`bodyfitting_tpu.models.openpose`,
re-implementing the reference's detector semantics (openpose/body.py:60-312,
hand.py:26-86, util.py:128-190):

  * multi-scale forward passes (0.5/1.0/1.5/2.0 x 368/H), stride-8 maps
    upsampled and averaged;
  * heatmap peaks via gaussian smoothing + 4-neighbour local maxima;
  * limb scoring by line integrals along the part-affinity fields with the
    distance prior, greedy bipartite matching, and person grouping with
    subset merging (the published greedy PAF algorithm);
  * hand boxes from wrist/elbow/shoulder geometry and face boxes from
    head keypoints; hand/face heatmap peaks carry their real heatmap
    scores as confidences;
  * :func:`detect_to_json` emits OpenPose-format JSON files (body + hands
    + 70-point face), making this a drop-in replacement for the external
    binary's ``--hand --face`` invocation in the fitting apps.

The network forward runs jitted (batched over scales when shapes allow);
everything data-dependent stays in numpy, mirroring the reference split.
"""

from __future__ import annotations

import json
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# BODY_25-style limb/PAF tables for the 18-part COCO model (published
# OpenPose constants; reference openpose/body.py:129-135).
LIMB_SEQ = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18], [3, 17], [6, 18],
]
MAP_IDX = [
    [31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44], [19, 20],
    [21, 22], [23, 24], [25, 26], [27, 28], [29, 30], [47, 48], [49, 50],
    [53, 54], [51, 52], [55, 56], [37, 38], [45, 46],
]

# COCO-18 -> OpenPose BODY_25 slot mapping (BODY_25 adds MidHip(8) and
# foot keypoints 19-24, which the COCO model does not produce).
COCO18_TO_BODY25 = [0, 1, 2, 3, 4, 5, 6, 7, 9, 10, 11, 12, 13, 14, 15, 16,
                    17, 18]


def pad_right_down(img: np.ndarray, stride: int, pad_value: int):
    """Pad H/W up to multiples of stride (reference util.py:12-32)."""
    h, w = img.shape[:2]
    pad_d = (stride - h % stride) % stride
    pad_r = (stride - w % stride) % stride
    out = np.pad(
        img, ((0, pad_d), (0, pad_r), (0, 0)), mode="constant",
        constant_values=pad_value,
    )
    return out, (0, 0, pad_d, pad_r)


def _multiscale_maps(apply_fn, ori_img, n_out_list, boxsize=368, stride=8,
                     pad_value=128, scales=(0.5, 1.0, 1.5, 2.0)):
    """Average per-scale network outputs, resized to the input resolution."""
    import cv2

    H, W = ori_img.shape[:2]
    avgs = [np.zeros((H, W, n), np.float32) for n in n_out_list]
    for s in scales:
        scale = s * boxsize / H
        scaled = cv2.resize(ori_img, (0, 0), fx=scale, fy=scale,
                            interpolation=cv2.INTER_CUBIC)
        padded, pad = pad_right_down(scaled, stride, pad_value)
        inp = padded[None].astype(np.float32) / 256.0 - 0.5
        outs = apply_fn(jnp.asarray(inp))
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        for oi, out in enumerate(outs):
            m = np.asarray(out[0], np.float32)
            m = cv2.resize(m, (0, 0), fx=stride, fy=stride,
                           interpolation=cv2.INTER_CUBIC)
            m = m[: padded.shape[0] - pad[2], : padded.shape[1] - pad[3]]
            m = cv2.resize(m, (W, H), interpolation=cv2.INTER_CUBIC)
            avgs[oi] += m / len(scales)
    return avgs


def find_peaks(heatmap_avg: np.ndarray, thre1: float = 0.1):
    """Per-part peak lists ``[(x, y, score, id), ...]``
    (reference body.py:104-127)."""
    from scipy.ndimage import gaussian_filter

    all_peaks = []
    counter = 0
    for part in range(heatmap_avg.shape[2] - 1):      # last ch = background
        m = heatmap_avg[:, :, part]
        sm = gaussian_filter(m, sigma=3)
        left = np.zeros_like(sm); left[1:, :] = sm[:-1, :]        # noqa: E702
        right = np.zeros_like(sm); right[:-1, :] = sm[1:, :]      # noqa: E702
        up = np.zeros_like(sm); up[:, 1:] = sm[:, :-1]            # noqa: E702
        down = np.zeros_like(sm); down[:, :-1] = sm[:, 1:]        # noqa: E702
        binary = (
            (sm >= left) & (sm >= right) & (sm >= up) & (sm >= down)
            & (sm > thre1)
        )
        ys, xs = np.nonzero(binary)
        peaks = [
            (int(x), int(y), float(m[y, x]), counter + i)
            for i, (x, y) in enumerate(zip(xs, ys))
        ]
        counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def _limb_links(peaks_a, peaks_b, paf_xy, img_h, thre2, mid_num):
    """Score and greedily match one limb type's endpoint peaks.

    The published PAF matching rule (Cao et al., CVPR 2017): each (a, b)
    peak pair is scored by the mean alignment of the part-affinity field
    sampled along the segment plus a length penalty, kept only when >80%
    of the samples align above ``thre2`` and the total is positive; pairs
    are then accepted best-first while neither endpoint is already taken,
    up to ``min(|A|, |B|)`` links.

    Returns ``[(global_peak_id_a, global_peak_id_b, score)]``.
    """
    scored = []
    for i, a in enumerate(peaks_a):
        for j, b in enumerate(peaks_b):
            dx, dy = b[0] - a[0], b[1] - a[1]
            length = max(math.hypot(dx, dy), 0.1)
            xs = np.round(np.linspace(a[0], b[0], mid_num)).astype(int)
            ys = np.round(np.linspace(a[1], b[1], mid_num)).astype(int)
            along = paf_xy[ys, xs] @ (
                np.array([dx, dy], np.float64) / length
            )
            score = along.mean() + min(0.5 * img_h / length - 1, 0)
            if np.count_nonzero(along > thre2) > 0.8 * mid_num and score > 0:
                scored.append((i, j, score))
    scored.sort(key=lambda t: t[2], reverse=True)
    links, taken_a, taken_b = [], set(), set()
    for i, j, score in scored:
        if i in taken_a or j in taken_b:
            continue
        links.append((int(peaks_a[i][3]), int(peaks_b[j][3]), score))
        taken_a.add(i)
        taken_b.add(j)
        if len(links) >= min(len(peaks_a), len(peaks_b)):
            break
    return links


class _PersonDraft:
    """A person being assembled: one global peak id per COCO-18 part slot
    (-1 = unfilled), plus the running score (member peak scores + limb
    scores) and the filled-part count."""

    __slots__ = ("part_peak", "score", "n_parts")

    def __init__(self):
        self.part_peak = np.full(18, -1, np.int64)
        self.score = 0.0
        self.n_parts = 0


def assemble_people(all_peaks, paf_avg, img_h, thre2: float = 0.05,
                    mid_num: int = 100):
    """Greedy PAF limb assembly -> ``(candidate [N,4], subset [P,20])``.

    The grouping *procedure* is the published OpenPose algorithm (Cao et
    al., CVPR 2017) that the reference vendors via pytorch-openpose (MIT;
    /root/reference/openpose/body.py:137-240): per limb type, greedy
    PAF-scored endpoint matching (:func:`_limb_links`); then each accepted
    link either extends a draft person owning one endpoint, merges two
    part-disjoint drafts, or — for the first 17 limb types — spawns a new
    draft.  Structured here around explicit :class:`_PersonDraft` records
    instead of CMU's growing score matrix; behaviour is identical,
    including the quirks: a draft matched only through its B-endpoint
    never gains the link's A-endpoint, and overlapping drafts absorb the
    B-endpoint into the first draft unconditionally.  One deliberate
    divergence: when a link matches >= 3 drafts (possible because the
    overlap branch lets two drafts share a B-endpoint) the vendored
    reference *raises IndexError* (``subset_idx[found]`` with
    ``found == 2`` on a 2-slot list, body.py:202-205); here the first
    two drafts in insertion order are handled exactly as the found==2
    branch and the rest are left untouched.

    Output contract (what the downstream JSON writer and tests consume):
    ``candidate`` rows are ``(x, y, score, id)`` peaks; ``subset`` rows are
    18 candidate ids (-1 = missing) + [total score, part count], filtered
    to >=4 parts and mean score >= 0.4.
    """
    candidate = np.array(
        [p for peaks in all_peaks for p in peaks], np.float64
    ).reshape(-1, 4)
    peak_score = candidate[:, 2] if len(candidate) else np.zeros(0)

    people = []
    for k, ((pa, pb), (mx, my)) in enumerate(zip(LIMB_SEQ, MAP_IDX)):
        slot_a, slot_b = pa - 1, pb - 1
        paf_xy = paf_avg[:, :, [mx - 19, my - 19]]
        links = _limb_links(
            all_peaks[slot_a], all_peaks[slot_b], paf_xy, img_h, thre2,
            mid_num,
        )
        for id_a, id_b, limb_score in links:
            owners = [
                p for p in people
                if p.part_peak[slot_a] == id_a or p.part_peak[slot_b] == id_b
            ]
            if len(owners) == 1:
                p = owners[0]
                if p.part_peak[slot_b] != id_b:
                    p.part_peak[slot_b] = id_b
                    p.n_parts += 1
                    p.score += peak_score[id_b] + limb_score
            elif len(owners) >= 2:
                first, second = owners[0], owners[1]
                overlap = (
                    (first.part_peak >= 0) & (second.part_peak >= 0)
                ).any()
                if not overlap:
                    take = first.part_peak < 0
                    first.part_peak[take] = second.part_peak[take]
                    first.n_parts += second.n_parts
                    first.score += second.score + limb_score
                    people.remove(second)
                else:
                    first.part_peak[slot_b] = id_b
                    first.n_parts += 1
                    first.score += peak_score[id_b] + limb_score
            elif k < 17:
                p = _PersonDraft()
                p.part_peak[slot_a] = id_a
                p.part_peak[slot_b] = id_b
                p.n_parts = 2
                p.score = peak_score[id_a] + peak_score[id_b] + limb_score
                people.append(p)

    kept = [
        p for p in people
        if p.n_parts >= 4 and p.score / p.n_parts >= 0.4
    ]
    subset = np.full((len(kept), 20), -1.0)
    for r, p in enumerate(kept):
        subset[r, :18] = p.part_peak
        subset[r, 18] = p.score
        subset[r, 19] = p.n_parts
    return candidate, subset


def hand_boxes(candidate, subset, img_shape, ratio_wrist_elbow=0.33):
    """Square hand crops from body keypoints (reference util.py:128-190).
    Returns ``[(x, y, w, is_left), ...]``."""
    H, W = img_shape[:2]
    out = []
    for person in subset.astype(int):
        for (s_i, e_i, w_i, is_left) in (
            (5, 6, 7, True), (2, 3, 4, False)
        ):
            if (person[[s_i, e_i, w_i]] == -1).any():
                continue
            x1, y1 = candidate[person[s_i]][:2]
            x2, y2 = candidate[person[e_i]][:2]
            x3, y3 = candidate[person[w_i]][:2]
            x = x3 + ratio_wrist_elbow * (x3 - x2)
            y = y3 + ratio_wrist_elbow * (y3 - y2)
            d_we = math.hypot(x3 - x2, y3 - y2)
            d_es = math.hypot(x2 - x1, y2 - y1)
            width = 1.5 * max(d_we, 0.9 * d_es)
            x -= width / 2
            y -= width / 2
            x, y = max(x, 0), max(y, 0)
            width = min(width, W - x, H - y)
            if width >= 20:
                out.append((int(x), int(y), int(width), is_left))
    return out


class BodyDetector:
    """End-to-end body keypoint detector (reference openpose/body.py)."""

    def __init__(self, checkpoint_path: Optional[str] = None,
                 scales=(0.5, 1.0, 1.5, 2.0)):
        from bodyfitting_tpu.models.openpose import load_body_net

        self.model, self.variables = load_body_net(checkpoint_path)
        self.scales = scales
        # weights ride as jit ARGUMENTS: closing over ~100-200MB of
        # net parameters embeds them as program constants, which the
        # remote-compile tunnel rejects (CLAUDE.md, HTTP 413)
        apply_jit = jax.jit(self.model.apply)
        self._apply = lambda x: apply_jit(self.variables, x)

    def __call__(self, ori_img: np.ndarray):
        paf_avg, heatmap_avg = _multiscale_maps(
            self._apply, ori_img, [38, 19], scales=self.scales
        )
        all_peaks = find_peaks(heatmap_avg)
        return assemble_people(all_peaks, paf_avg, ori_img.shape[0])


class HandDetector:
    """21-keypoint hand detector on a square crop (reference hand.py)."""

    def __init__(self, checkpoint_path: Optional[str] = None,
                 scales=(0.5, 1.0, 1.5, 2.0)):
        from bodyfitting_tpu.models.openpose import load_hand_net

        self.model, self.variables = load_hand_net(checkpoint_path)
        self.scales = scales
        # weights ride as jit ARGUMENTS: closing over ~100-200MB of
        # net parameters embeds them as program constants, which the
        # remote-compile tunnel rejects (CLAUDE.md, HTTP 413)
        apply_jit = jax.jit(self.model.apply)
        self._apply = lambda x: apply_jit(self.variables, x)

    def __call__(self, crop_img: np.ndarray, thre: float = 0.05):
        (heatmap_avg,) = _multiscale_maps(
            self._apply, crop_img, [22], scales=self.scales
        )
        return _crop_peaks_with_scores(heatmap_avg, 21, thre)


def _crop_peaks_with_scores(heatmap_avg, n_parts: int, thre: float):
    """Per-part strongest-blob peak with its real heatmap score.

    Returns ``[n_parts, 3]`` (x, y, score); score 0 marks a miss.  The
    score is the raw heatmap value at the peak — downstream losses weight
    keypoints by conf^2 (reference loss.py:134), so the binary's actual
    confidence semantics matter, not a 0/1 presence flag.
    """
    from scipy.ndimage import gaussian_filter, label

    peaks = []
    for part in range(n_parts):
        m = heatmap_avg[:, :, part]
        sm = gaussian_filter(m, sigma=3)
        binary = (sm > thre).astype(np.uint8)
        if binary.sum() == 0:
            peaks.append([0.0, 0.0, 0.0])
            continue
        # 8-connectivity, matching the reference's skimage
        # label(connectivity=2) (hand.py:69) — scipy defaults to
        # 4-connectivity, which splits diagonal-touching blobs
        labels, n = label(binary, structure=np.ones((3, 3), np.uint8))
        sums = [m[labels == i].sum() for i in range(1, n + 1)]
        best = int(np.argmax(sums)) + 1
        masked = np.where(labels == best, m, 0)
        y, x = np.unravel_index(np.argmax(masked), masked.shape)
        peaks.append([float(x), float(y), float(m[y, x])])
    return np.array(peaks, np.float32)


class FaceDetector:
    """70-keypoint face detector on a square crop.

    The counterpart of the binary's ``--face`` stage
    (/root/reference/apps/genebody_fitting.py:148); the reference's in-repo
    fallback has no face net at all.  Peak extraction mirrors the hand
    path: strongest blob per part, real heatmap value as confidence.
    """

    def __init__(self, checkpoint_path: Optional[str] = None,
                 scales=(1.0,), boxsize: int = 368):
        from bodyfitting_tpu.models.openpose import load_face_net

        self.model, self.variables = load_face_net(checkpoint_path)
        self.scales = scales
        self.boxsize = boxsize
        # weights ride as jit ARGUMENTS: closing over ~100-200MB of
        # net parameters embeds them as program constants, which the
        # remote-compile tunnel rejects (CLAUDE.md, HTTP 413)
        apply_jit = jax.jit(self.model.apply)
        self._apply = lambda x: apply_jit(self.variables, x)

    def __call__(self, crop_img: np.ndarray, thre: float = 0.05):
        (heatmap_avg,) = _multiscale_maps(
            self._apply, crop_img, [71], scales=self.scales,
            boxsize=self.boxsize,
        )
        return _crop_peaks_with_scores(heatmap_avg, 70, thre)


def face_box(candidate, person_row, img_shape):
    """Square face crop from body keypoints; ``(x, y, w)`` or ``None``.

    Re-derivation of the binary's face-ROI-from-pose heuristic: center on
    the nose (fallback: eye/ear mean), size from the neck-nose distance
    (fallback: inter-ear/eye span).  COCO-18 part order: nose 0, neck 1,
    eyes 14/15, ears 16/17 (1-based slots 1, 2, 15, 16, 17, 18).
    """
    H, W = img_shape[:2]
    person = person_row.astype(int)

    def pt(part):                       # COCO-18, 0-based
        idx = person[part]
        return candidate[idx][:2] if idx >= 0 else None

    nose, neck = pt(0), pt(1)
    eyes = [p for p in (pt(14), pt(15)) if p is not None]
    ears = [p for p in (pt(16), pt(17)) if p is not None]
    head_pts = [p for p in [nose] + eyes + ears if p is not None]
    if not head_pts:
        return None
    center = np.mean(head_pts, axis=0)
    if nose is not None and neck is not None:
        size = 1.5 * math.hypot(*(np.asarray(nose) - neck))
    elif len(ears) == 2:
        size = 3.0 * math.hypot(*(np.asarray(ears[0]) - ears[1]))
    elif len(eyes) == 2:
        size = 4.0 * math.hypot(*(np.asarray(eyes[0]) - eyes[1]))
    else:
        size = 0.25 * H
    x = max(center[0] - size / 2, 0)
    y = max(center[1] - size / 2, 0)
    size = min(size, W - x, H - y)
    if size < 20:
        return None
    return int(x), int(y), int(size)


def person_to_body25(candidate, person_row):
    """One subset row -> BODY_25 (u, v, conf) keypoints (COCO-18 slots)."""
    out = np.zeros((25, 3), np.float32)
    for coco_i, b25_i in enumerate(COCO18_TO_BODY25):
        idx = int(person_row[coco_i])
        if idx >= 0:
            out[b25_i] = candidate[idx][:3]
    # synthesize MidHip (8) from the two hips when both exist
    if out[9, 2] > 0 and out[12, 2] > 0:
        out[8, :2] = (out[9, :2] + out[12, :2]) / 2
        out[8, 2] = min(out[9, 2], out[12, 2])
    return out


def detect_to_json(
    image_dir: str,
    write_dir: str,
    body: BodyDetector,
    hand: Optional[HandDetector] = None,
    hand_face: bool = False,
    face: Optional[FaceDetector] = None,
):
    """Run detection over a directory and write OpenPose-format JSONs.

    Drop-in for the reference's binary invocation (genebody_fitting.py:
    144-155, ``--hand --face``): per image ``<stem>_keypoints.json`` with
    ``people[*].pose_keypoints_2d`` (75 floats) and, with ``hand_face``,
    hand (21x3 each) and face (70x3) keypoint blocks from the hand/face
    networks.  Confidences are the real heatmap peak scores — the fitting
    losses weight by conf^2 (reference loss.py:134).
    """
    import cv2

    os.makedirs(write_dir, exist_ok=True)
    for name in sorted(os.listdir(image_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        from bodyfitting_tpu.io.images import imread_checked

        img = imread_checked(os.path.join(image_dir, name))
        candidate, subset = body(img)
        people = []
        for row in subset:
            b25 = person_to_body25(candidate, row)
            person = {
                "pose_keypoints_2d":
                    [float(v) for v in b25.reshape(-1)],
            }
            if hand_face and hand is not None:
                lh = np.zeros((21, 3), np.float32)
                rh = np.zeros((21, 3), np.float32)
                for (x, y, w, is_left) in hand_boxes(
                    candidate, row[None], img.shape
                ):
                    crop = img[y:y + w, x:x + w]
                    if is_left:
                        crop = cv2.flip(crop, 1)
                    block = hand(crop).astype(np.float32)   # [21,3] x,y,score
                    if is_left:
                        block[:, 0] = w - 1 - block[:, 0]
                    block[:, :2] += np.array([x, y], np.float32)
                    block[:, :2] *= (block[:, 2:] > 0)      # zero misses
                    if is_left:
                        lh = block
                    else:
                        rh = block
                person["hand_left_keypoints_2d"] = [
                    float(v) for v in lh.reshape(-1)
                ]
                person["hand_right_keypoints_2d"] = [
                    float(v) for v in rh.reshape(-1)
                ]
            if hand_face and face is not None:
                fkp = np.zeros((70, 3), np.float32)
                box = face_box(candidate, row, img.shape)
                if box is not None:
                    x, y, w = box
                    block = face(img[y:y + w, x:x + w]).astype(np.float32)
                    block[:, :2] += np.array([x, y], np.float32)
                    block[:, :2] *= (block[:, 2:] > 0)
                    fkp = block
                person["face_keypoints_2d"] = [
                    float(v) for v in fkp.reshape(-1)
                ]
            people.append(person)
        stem = os.path.splitext(name)[0]
        with open(
            os.path.join(write_dir, f"{stem}_keypoints.json"), "w"
        ) as f:
            json.dump({"version": 1.3, "people": people}, f)


# ---------------------------------------------------------------------------
# Visualisation (reference openpose/util.py:42-126)
# ---------------------------------------------------------------------------

_LIMB_COLORS = [
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0),
    (170, 255, 0), (85, 255, 0), (0, 255, 0), (0, 255, 85),
    (0, 255, 170), (0, 255, 255), (0, 170, 255), (0, 85, 255),
    (0, 0, 255), (85, 0, 255), (170, 0, 255), (255, 0, 255),
    (255, 0, 170), (255, 0, 85),
]

_HAND_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 7), (7, 8),
    (0, 9), (9, 10), (10, 11), (11, 12), (0, 13), (13, 14), (14, 15),
    (15, 16), (0, 17), (17, 18), (18, 19), (19, 20),
]


def draw_bodypose(canvas, candidate, subset, stickwidth: int = 4):
    """Draw assembled skeletons: limb sticks + joint dots
    (reference util.py:42-94)."""
    import cv2

    canvas = canvas.copy()
    for k, limb in enumerate(LIMB_SEQ[:17]):
        color = _LIMB_COLORS[k % len(_LIMB_COLORS)]
        for person in subset.astype(int):
            ia, ib = person[limb[0] - 1], person[limb[1] - 1]
            if ia < 0 or ib < 0:
                continue
            xa, ya = candidate[ia][:2]
            xb, yb = candidate[ib][:2]
            mx, my = (xa + xb) / 2, (ya + yb) / 2
            length = float(np.hypot(xa - xb, ya - yb))
            angle = float(np.degrees(np.arctan2(ya - yb, xa - xb)))
            poly = cv2.ellipse2Poly(
                (int(mx), int(my)), (int(length / 2), stickwidth),
                int(angle), 0, 360, 1,
            )
            cv2.fillConvexPoly(canvas, poly, color)
    for part in range(18):
        color = _LIMB_COLORS[part % len(_LIMB_COLORS)]
        for person in subset.astype(int):
            idx = person[part]
            if idx < 0:
                continue
            x, y = candidate[idx][:2]
            cv2.circle(canvas, (int(x), int(y)), stickwidth, color, -1)
    return canvas


def draw_handpose(canvas, peaks, show_number: bool = False):
    """Draw the 21 hand keypoints + finger edges
    (reference util.py:96-126)."""
    import cv2

    canvas = canvas.copy()
    peaks = np.asarray(peaks)
    for (a, b) in _HAND_EDGES:
        if (peaks[a] == 0).all() or (peaks[b] == 0).all():
            continue
        cv2.line(
            canvas, tuple(peaks[a][:2].astype(int)),
            tuple(peaks[b][:2].astype(int)), (0, 0, 255), 2,
        )
    for i, p in enumerate(peaks):
        if (p == 0).all():
            continue
        cv2.circle(canvas, tuple(p[:2].astype(int)), 3, (0, 255, 0), -1)
        if show_number:
            cv2.putText(
                canvas, str(i), tuple(p[:2].astype(int)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.3, (0, 0, 0), 1,
            )
    return canvas
