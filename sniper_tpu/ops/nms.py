"""NMS family: host greedy NMS / soft-NMS oracles + jittable device NMS.

Host (NumPy) versions reproduce the reference Cython kernels exactly and
serve both the eval path (order-dependent soft-NMS must be bit-faithful
for mAP parity) and as oracles for the device versions:
- greedy NMS:  /root/reference/lib/nms/cpu_nms.pyx:112-163
- soft-NMS:    /root/reference/lib/nms/cpu_nms.pyx:17-110 (Navaneeth
  swap-based variant: in-place max-selection sort + score decay with a
  dynamic tail; method 2 = gaussian weight exp(-ov^2/sigma))

Device version ``nms_jax`` is a static-shape jittable greedy NMS
(select-max / suppress loop under ``lax.fori_loop``) used inside the
fused proposal ops; it matches the host greedy NMS keep-set for
distinct scores.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sniper_tpu.ops.boxes import box_area

NEG_INF = -1e10


def nms_np(dets: np.ndarray, thresh: float) -> list[int]:
    """Greedy hard NMS. dets [N,5] (xyxy, score) -> keep indices.

    Suppression uses ``ovr >= thresh`` like the reference CPU kernel.
    """
    if dets.shape[0] == 0:
        return []
    boxes = dets[:, :4].astype(np.float64)
    scores = dets[:, 4]
    areas = box_area(boxes)
    order = scores.argsort()[::-1]
    suppressed = np.zeros(dets.shape[0], dtype=bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        # degenerate/inverted boxes (x2 < x1-1) have +1-convention area
        # <= 0; the raw division then yields NaN, and ``NaN >= thresh``
        # is False — such a box would silently never be suppressed (and
        # never suppress). Guard the denominator: zero-area boxes can't
        # overlap anything, so their IoU is 0.
        denom = areas[i] + areas - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            ovr = np.where(denom > 0, inter / denom, 0.0)
        suppressed |= ovr >= thresh
    return keep


def soft_nms_np(
    boxes: np.ndarray,
    sigma: float = 0.5,
    Nt: float = 0.3,
    threshold: float = 0.001,
    method: int = 2,
    return_indices: bool = False,
):
    """Soft-NMS, bit-faithful to the reference Cython kernel.

    ``boxes`` is [N,5] float32 (xyxy, score); returns the surviving
    [M,5] rows in the reference's emission order (max-score selection
    sort with swap; decayed boxes below ``threshold`` replaced by the
    dynamic tail). Sequential by nature — float32 arithmetic throughout
    to match the Cython float locals. ``return_indices`` also returns
    each surviving row's ORIGINAL index (for carrying per-detection
    payloads like instance masks through the rescoring).

    The reference kernel is a scalar double loop; here the inner
    decay pass is VECTORIZED, which is exact: at each step i every
    remaining box is decayed exactly once (independently of the others
    and of the tail-swap order — swapped-in tail rows are re-examined
    by the reference's ``pos -= 1``), so computing all decays in one
    fp32 vector op gives bit-identical scores. The threshold drop's
    tail-swap dance is then replayed on the decayed rows to keep the
    exact array order (argmax tie-breaking depends on it).
    """
    b = np.array(boxes, dtype=np.float32, copy=True)
    if return_indices:
        # ride an index column through the row swaps (cols 0-4 drive the
        # algorithm; the extra column is inert)
        idx_col = np.arange(b.shape[0], dtype=np.float32)[:, None]
        b = np.concatenate([b, idx_col], axis=1)
    N = b.shape[0]
    sigma = np.float32(sigma)
    one = np.float32(1)
    i = 0
    while i < N:
        # select max-score box in b[i:N], swap into position i
        maxpos = i + int(np.argmax(b[i:N, 4]))
        b[[i, maxpos]] = b[[maxpos, i]]
        tx1, ty1, tx2, ty2 = b[i, 0], b[i, 1], b[i, 2], b[i, 3]
        tarea = np.float32((tx2 - tx1 + 1) * (ty2 - ty1 + 1))

        rest = b[i + 1 : N]
        if len(rest):
            area = (rest[:, 2] - rest[:, 0] + one) * (
                rest[:, 3] - rest[:, 1] + one
            )
            iw = np.minimum(tx2, rest[:, 2]) - np.maximum(tx1, rest[:, 0]) + one
            ih = np.minimum(ty2, rest[:, 3]) - np.maximum(ty1, rest[:, 1]) + one
            hit = (iw > 0) & (ih > 0)
            inter = iw * ih
            # guard degenerate boxes (area <= 0 under the +1 convention):
            # tarea + area - inter can be <= 0 only when both boxes are
            # degenerate, where a NaN score would otherwise poison the
            # argmax selection and never drop. IoU := 0 there.
            denom = tarea + area - inter
            with np.errstate(divide="ignore", invalid="ignore"):
                ov = np.where(
                    hit & (denom > 0), inter / denom, np.float32(0)
                )
            if method == 1:  # linear
                weight = np.where(ov > Nt, one - ov, one)
            elif method == 2:  # gaussian
                weight = np.exp(-(ov * ov) / sigma)
            else:  # hard
                weight = np.where(ov > Nt, np.float32(0), one)
            rest[:, 4] = np.where(hit, weight * rest[:, 4], rest[:, 4])
            # replay the reference's drop/tail-swap order exactly: only
            # rows whose decay ran (hit) are eligible to drop
            drop = hit & (rest[:, 4] < threshold)
            if drop.any():
                eligible = np.zeros(len(b), bool)
                eligible[i + 1 : N] = drop
                pos = i + 1
                while pos < N:
                    if eligible[pos]:
                        b[pos] = b[N - 1]
                        eligible[pos] = eligible[N - 1]
                        N -= 1
                    else:
                        pos += 1
        i += 1
    if return_indices:
        return b[:N, :5], b[:N, 5].astype(np.int64)
    return b[:N]


def soft_nms_np_batched(
    dets_list,
    sigma: float = 0.5,
    Nt: float = 0.3,
    threshold: float = 0.001,
    method: int = 2,
    return_indices: bool = False,
):
    """Run soft-NMS on many INDEPENDENT problems (e.g. one per class) in
    a single padded greedy loop — bit-identical per problem to
    soft_nms_np, but the Python loop runs max(kept) iterations instead
    of sum(kept): one [C, Nmax] vector op per step covers every class.

    dets_list: sequence of [N_c, 5] float32 arrays. Returns a list of
    surviving [M_c, 5] arrays (plus a list of original-index arrays
    when return_indices).
    """
    C = len(dets_list)
    Ns = np.array([d.shape[0] for d in dets_list], dtype=int)
    Nmax = int(Ns.max()) if C else 0
    if Nmax == 0:
        outs = [np.zeros((0, 5), np.float32) for _ in range(C)]
        if return_indices:
            return outs, [np.zeros((0,), np.int64) for _ in range(C)]
        return outs
    K = 6 if return_indices else 5
    b = np.zeros((C, Nmax, K), np.float32)
    for c, d in enumerate(dets_list):
        n = d.shape[0]
        b[c, :n, :5] = d
        if return_indices:
            b[c, :n, 5] = np.arange(n, dtype=np.float32)

    N = Ns.copy()                 # live length per problem
    i = np.zeros(C, dtype=int)    # kept count per problem
    pos_idx = np.arange(Nmax)
    sigma = np.float32(sigma)
    one = np.float32(1)
    while True:
        act = i < N
        if not act.any():
            break
        rows = np.where(act)[0]
        ic = i[rows]
        # argmax over each row's [i_c, N_c) window (first-index ties,
        # like the scalar kernel's slice argmax)
        selmask = (pos_idx >= ic[:, None]) & (pos_idx < N[rows, None])
        S = np.where(selmask, b[rows, :, 4], -np.inf)
        maxpos = S.argmax(1)
        tmp = b[rows, ic].copy()
        b[rows, ic] = b[rows, maxpos]
        b[rows, maxpos] = tmp
        t = b[rows, ic]  # [R, K] the kept boxes this step
        tarea = (t[:, 2] - t[:, 0] + one) * (t[:, 3] - t[:, 1] + one)
        x1 = b[rows, :, 0]
        y1 = b[rows, :, 1]
        x2 = b[rows, :, 2]
        y2 = b[rows, :, 3]
        area = (x2 - x1 + one) * (y2 - y1 + one)
        iw = np.minimum(t[:, 2, None], x2) - np.maximum(t[:, 0, None], x1) + one
        ih = np.minimum(t[:, 3, None], y2) - np.maximum(t[:, 1, None], y1) + one
        postmask = (pos_idx[None] > ic[:, None]) & (pos_idx[None] < N[rows, None])
        hit = (iw > 0) & (ih > 0) & postmask
        inter = iw * ih
        # same degenerate-box guard as soft_nms_np: denom <= 0 => IoU 0
        denom = tarea[:, None] + area - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            ov = np.where(hit & (denom > 0), inter / denom, np.float32(0))
        if method == 1:
            weight = np.where(ov > Nt, one - ov, one)
        elif method == 2:
            weight = np.exp(-(ov * ov) / sigma)
        else:
            weight = np.where(ov > Nt, np.float32(0), one)
        scores = b[rows, :, 4]
        b[rows, :, 4] = np.where(hit, weight * scores, scores)
        # replay the reference drop/tail-swap order per row (rare path)
        drop = hit & (b[rows, :, 4] < threshold)
        for r, c in zip(np.where(drop.any(1))[0], rows[drop.any(1)]):
            elig = drop[r].copy()
            pos = int(elig.argmax())
            n_c = int(N[c])
            while pos < n_c:
                if elig[pos]:
                    b[c, pos] = b[c, n_c - 1]
                    elig[pos] = elig[n_c - 1]
                    n_c -= 1
                else:
                    pos += 1
            N[c] = n_c
        i[rows] = ic + 1
    outs = [b[c, : N[c], :5] for c in range(C)]
    if return_indices:
        return outs, [b[c, : N[c], 5].astype(np.int64) for c in range(C)]
    return outs


class NMSWrapper:
    """thresh>0 -> hard NMS; else gaussian soft-NMS with ``sigma``.

    Mirrors /root/reference/lib/nms/nms.py:15-23 so config
    (TEST.NMS, TEST.NMS_SIGMA) drives the same behavior.
    """

    def __init__(self, thresh: float, sigma: float):
        assert thresh < 0 or sigma < 0, "set exactly one of thresh/sigma"
        self.thresh = thresh
        self.sigma = sigma

    def __call__(self, dets: np.ndarray, return_indices: bool = False):
        if self.thresh > 0:
            keep = nms_np(dets.astype(np.float32), self.thresh)
            if return_indices:
                return dets[keep], np.asarray(keep, np.int64)
            return dets[keep]
        return soft_nms_np(dets, sigma=self.sigma, method=2,
                           return_indices=return_indices)

    def batched(self, dets_list, return_indices: bool = False):
        """NMS over many independent det sets (e.g. the per-class sets
        of one image) — soft-NMS runs them in one padded greedy loop."""
        if self.thresh > 0:
            outs = [self(d, return_indices) for d in dets_list]
            if return_indices:
                return [o[0] for o in outs], [o[1] for o in outs]
            return outs
        return soft_nms_np_batched(dets_list, sigma=self.sigma, method=2,
                                   return_indices=return_indices)


def nms_jax(
    boxes: jax.Array,
    scores: jax.Array,
    max_out: int,
    thresh: float,
    strict: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Static-shape greedy NMS for one image, jittable.

    boxes [N,4] xyxy, scores [N] (invalid entries must carry score
    <= NEG_INF/2). Returns (keep_idx [max_out] int32, valid [max_out]
    bool). Greedy order = descending score; suppression ``ovr >= thresh``
    (or ``>`` when strict=True, the CUDA-kernel convention).

    Select-max/suppress loop: max_out iterations of an O(N) argmax +
    IoU row — O(max_out * N) work, all VPU-friendly, no [N,N] matrix.
    """
    n = boxes.shape[0]
    areas = box_area(boxes)

    def body(_, state):
        live_scores, keep, valid, k = state
        i = jnp.argmax(live_scores)
        ok = live_scores[i] > NEG_INF / 2
        bi = boxes[i]
        xx1 = jnp.maximum(bi[0], boxes[:, 0])
        yy1 = jnp.maximum(bi[1], boxes[:, 1])
        xx2 = jnp.minimum(bi[2], boxes[:, 2])
        yy2 = jnp.minimum(bi[3], boxes[:, 3])
        inter = jnp.maximum(0.0, xx2 - xx1 + 1) * jnp.maximum(0.0, yy2 - yy1 + 1)
        denom = areas[i] + areas - inter  # <= 0 only for degenerate pairs
        ovr = jnp.where(denom > 0, inter / denom, 0.0)
        sup = (ovr > thresh) if strict else (ovr >= thresh)
        new_scores = jnp.where(ok & sup, NEG_INF, live_scores)
        new_scores = new_scores.at[i].set(NEG_INF)
        keep = keep.at[k].set(jnp.where(ok, i.astype(jnp.int32), -1))
        valid = valid.at[k].set(ok)
        return new_scores, keep, valid, k + 1

    keep0 = jnp.full((max_out,), -1, dtype=jnp.int32)
    valid0 = jnp.zeros((max_out,), dtype=bool)
    _, keep, valid, _ = jax.lax.fori_loop(
        0, max_out, body, (scores.astype(jnp.float32), keep0, valid0, 0)
    )
    del n
    return keep, valid
