"""Pure-numpy oracles transliterating the reference CUDA kernel semantics.

These are deliberately written as literal sequential scans mirroring
``lib/pointnet2/_ext_src/src/*.cu`` so the JAX ops can be parity-tested
against the exact reference behavior (padding skips, fill rules, tie-breaks).
"""

import numpy as np


def fps_oracle(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """sampling_gpu.cu:69-229 semantics (single batch sequential version)."""
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), dtype=np.int32)
    for bi in range(b):
        pts = xyz[bi].astype(np.float32)
        temp = np.full(n, 1e10, dtype=np.float32)
        old = 0
        out[bi, 0] = 0
        for j in range(1, npoint):
            best = -1.0
            besti = 0
            ref = pts[old]
            for k in range(n):
                mag = pts[k, 0] ** 2 + pts[k, 1] ** 2 + pts[k, 2] ** 2
                if mag <= 1e-3:
                    continue
                d = np.float32(
                    (pts[k, 0] - ref[0]) ** 2 + (pts[k, 1] - ref[1]) ** 2 + (pts[k, 2] - ref[2]) ** 2
                )
                d2 = min(d, temp[k])
                temp[k] = d2
                if d2 > best:
                    best = d2
                    besti = k
            old = besti
            out[bi, j] = besti
    return out


def ball_query_oracle(radius: float, nsample: int, xyz: np.ndarray, new_xyz: np.ndarray) -> np.ndarray:
    """ball_query_gpu.cu:9-54 semantics."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    r2 = radius * radius
    idx = np.zeros((b, m, nsample), dtype=np.int32)
    for bi in range(b):
        for j in range(m):
            cnt = 0
            for k in range(n):
                d2 = np.float32(np.sum((new_xyz[bi, j].astype(np.float32) - xyz[bi, k].astype(np.float32)) ** 2))
                if d2 < r2:
                    if cnt == 0:
                        idx[bi, j, :] = k
                    idx[bi, j, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


def three_nn_oracle(unknown: np.ndarray, known: np.ndarray):
    """interpolate_gpu.cu:9-68 semantics (with the wrapper's sqrt)."""
    b, n, _ = unknown.shape
    m = known.shape[1]
    dist = np.zeros((b, n, 3), dtype=np.float32)
    idx = np.zeros((b, n, 3), dtype=np.int32)
    for bi in range(b):
        for j in range(n):
            best = [1e40, 1e40, 1e40]
            besti = [0, 0, 0]
            for k in range(m):
                d = float(np.sum((unknown[bi, j].astype(np.float32) - known[bi, k].astype(np.float32)) ** 2))
                if d < best[0]:
                    best = [d, best[0], best[1]]
                    besti = [k, besti[0], besti[1]]
                elif d < best[1]:
                    best = [best[0], d, best[1]]
                    besti = [besti[0], k, besti[1]]
                elif d < best[2]:
                    best[2] = d
                    besti[2] = k
            dist[bi, j] = np.sqrt(np.array(best, dtype=np.float32))
            idx[bi, j] = besti
    return dist, idx
