"""Panorama stitching.

Functional port of panorama_stitching.rs (+panorama_utils): detect features
per frame, match pairs, estimate pairwise homographies with RANSAC, pick a
stitch order by connecting the strongest-inlier pairs first (the reference's
DSU ordering, :415-443), then warp everything into the reference frame and
feather-blend. The reference hand-rolls FAST/BRIEF because Rust lacks an
OpenCV; here detection/matching/homography use cv2 (ORB + BFMatcher +
findHomography) — same pipeline shape, hardened primitives.
"""

from __future__ import annotations

import numpy as np


class PanoramaError(ValueError):
    pass


def _to_u8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)


def _features(gray, orb):
    kp, des = orb.detectAndCompute(gray, None)
    return kp or [], des


def _pair_homography(f1, f2, matcher):
    kp1, des1 = f1
    kp2, des2 = f2
    if des1 is None or des2 is None or len(kp1) < 8 or len(kp2) < 8:
        return None, 0
    import cv2

    matches = matcher.knnMatch(des2, des1, k=2)
    good = [m for m, n in (p for p in matches if len(p) == 2) if m.distance < 0.75 * n.distance]
    if len(good) < 8:
        return None, 0
    src = np.float32([kp2[m.queryIdx].pt for m in good]).reshape(-1, 1, 2)
    dst = np.float32([kp1[m.trainIdx].pt for m in good]).reshape(-1, 1, 2)
    h, mask = cv2.findHomography(src, dst, cv2.RANSAC, 4.0)
    if h is None:
        return None, 0
    return h, int(mask.sum())


class _Dsu:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.p[rb] = ra
        return True


def stitch_panorama(images: list[np.ndarray]) -> np.ndarray:
    """Stitch planar (3, H, W) float frames into one panorama.

    Raises PanoramaError when fewer than two frames are given or no
    connected set of matches exists (panorama_stitching.rs:61-63, 444+).
    """
    import cv2

    if len(images) < 2:
        raise PanoramaError("Please select at least two images to stitch.")

    u8s = [_to_u8(im) for im in images]
    grays = [cv2.cvtColor(u, cv2.COLOR_RGB2GRAY) for u in u8s]
    orb = cv2.ORB_create(nfeatures=4000)
    feats = [_features(g, orb) for g in grays]
    matcher = cv2.BFMatcher(cv2.NORM_HAMMING)

    n = len(images)
    pair_h: dict[tuple[int, int], np.ndarray] = {}
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            h, inliers = _pair_homography(feats[i], feats[j], matcher)
            if h is not None and inliers >= 12:
                pair_h[(i, j)] = h
                edges.append((inliers, i, j))
    if not edges:
        raise PanoramaError("Could not find enough matching features between images.")

    # strongest-inlier spanning set (DSU ordering, :415-443)
    edges.sort(reverse=True)
    dsu = _Dsu(n)
    tree: dict[int, list[tuple[int, np.ndarray]]] = {i: [] for i in range(n)}
    for inliers, i, j in edges:
        if dsu.union(i, j):
            tree[i].append((j, pair_h[(i, j)]))
            tree[j].append((i, np.linalg.inv(pair_h[(i, j)])))

    # root = a member of the LARGEST connected component, not frame 0 —
    # an unrelated first shot must not reject a valid panorama among the
    # remaining frames
    comp_sizes: dict[int, int] = {}
    for i in range(n):
        comp_sizes[dsu.find(i)] = comp_sizes.get(dsu.find(i), 0) + 1
    best_comp = max(comp_sizes, key=comp_sizes.get)
    root = min(i for i in range(n) if dsu.find(i) == best_comp)
    # homography of each frame into the root's plane via BFS
    H = {root: np.eye(3)}
    queue = [root]
    while queue:
        cur = queue.pop(0)
        for nxt, h in tree[cur]:
            if nxt not in H:
                H[nxt] = H[cur] @ h
                queue.append(nxt)
    connected = sorted(H)
    if len(connected) < 2:
        raise PanoramaError("Images do not form a connected panorama.")

    # output bounds
    corners = []
    for i in connected:
        hgt, wdt = u8s[i].shape[:2]
        c = np.array(
            [[0, 0, 1], [wdt, 0, 1], [0, hgt, 1], [wdt, hgt, 1]], np.float64
        ).T
        pc = H[i] @ c
        pc = pc[:2] / pc[2]
        corners.append(pc)
    allc = np.concatenate(corners, axis=1)
    min_x, min_y = np.floor(allc.min(axis=1)).astype(int)
    max_x, max_y = np.ceil(allc.max(axis=1)).astype(int)
    out_w, out_h = int(max_x - min_x), int(max_y - min_y)
    if out_w * out_h > 120_000_000:
        raise PanoramaError("Panorama output too large — are the images related?")
    shift = np.array([[1, 0, -min_x], [0, 1, -min_y], [0, 0, 1]], np.float64)

    acc = np.zeros((out_h, out_w, 3), np.float64)
    wacc = np.zeros((out_h, out_w), np.float64)
    for i in connected:
        src = np.clip(np.asarray(images[i], np.float32), 0, 1).transpose(1, 2, 0)
        hgt, wdt = src.shape[:2]
        # feather weight: distance to frame edge
        yy = np.minimum(np.arange(hgt) + 1, np.arange(hgt)[::-1] + 1)
        xx = np.minimum(np.arange(wdt) + 1, np.arange(wdt)[::-1] + 1)
        weight = np.minimum(yy[:, None], xx[None, :]).astype(np.float32)
        weight /= weight.max()
        hw = (shift @ H[i]).astype(np.float64)
        warped = cv2.warpPerspective(src, hw, (out_w, out_h))
        wweight = cv2.warpPerspective(weight, hw, (out_w, out_h))
        acc += warped.astype(np.float64) * wweight[..., None]
        wacc += wweight
    out = acc / np.maximum(wacc, 1e-6)[..., None]
    return np.clip(out, 0, 1).astype(np.float32).transpose(2, 0, 1)
