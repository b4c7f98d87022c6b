"""Pallas TPU kernel: per-roi bilinear patch extraction for the
deformable PSROI pools.

The einsum patch extraction (ops.deform._extract_patch_batched) resizes
every roi onto its (T+2M)^2 sample grid with two dense per-roi tent
matrices, [E,H] x [H,W*C] then [E,W] applied along the other axis. The
tent matrices have <= 2 nonzeros per row, so of the E*H*W*C MACs only
2*E*W*C are useful (~40-60x padding per contraction at test canvases),
and the [*, E, W, C] intermediate round-trips HBM between the two
einsums (~35 MB per 16-roi chunk at the large canvas — the measured
bandwidth cost of the head; ARCHITECTURE.md "Pooling patch extraction
is work-bound at low MXU efficiency").

This kernel does the math the direct way, one roi per grid step:

  - the roi's whole [H, W, ct] feature-map block is VMEM-resident
    (revisited grid blocks are not re-fetched, so each image's map is
    DMA'd once per channel tile, not once per roi),
  - row pass: for each of the E patch rows, dynamic-slice the two
    bilinear source rows and blend on the VPU into a [E, W, ct] VMEM
    scratch (never leaves VMEM — the HBM intermediate is gone),
  - column pass: blend column pairs of the scratch into the [E, E, ct]
    output block.

Sample-position semantics are identical to ops.deform._resize_matrices
(the DCN CUDA kernel's): a sample at position p contributes iff
-0.5 < p < n-0.5 (else its weight row is zero — the drop-from-count
rule), and in-bounds positions clamp to [0, n-1]. Weights here are
computed and applied in fp32 and the result is rounded once to the
feature dtype — the einsum path instead rounds the tent weights to
bf16 before a bf16 matmul, so the two paths agree to bf16 tolerance
(parity-tested in tests/test_pallas_roi_patch.py).

Forward-only (no VJP). MEASURED SLOWER than the einsum extraction on
v5e (scripts/profile_pallas_pool.py, scalar-forced outputs): 22.3 vs
15.7 ms (small b4), 40.6 vs 24.0 ms (mid b8), 14.4 vs 11.2 ms (large
b2) for the full fused_offset_pool — the per-roi VPU tap blends and
the strided single-sublane writes of the column pass dominate, and the
full-axis [B*rpi, E, E, C] patch round-trips HBM anyway. extract=
"einsum" therefore stays the default everywhere; this kernel is kept
as the parity oracle for the in-VMEM sampling semantics that
ops/pallas/fused_pool.py builds on.

Reference lineage: the fork's DeformablePSROIPooling CUDA op
(/root/reference/symbols/faster/resnet_mx_101_e2e.py:286-293 call
sites); this file is the TPU-native sampling core behind it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _taps(start, step, t, n):
    """Bilinear taps for output cell t of a 1-D resize onto n cells.

    Returns (i0 int32, w0, w1) with the drop-from-count/clamp rules of
    ops.deform._resize_matrices: zero weights outside (-0.5, n-0.5),
    clamp inside to [0, n-1]. i0 is clipped to n-2 so the (i0, i0+1)
    pair always indexes in-bounds; the weights stay exact because at
    the upper clamp w0 = 0.
    """
    pos = start + t * step
    inb = jnp.logical_and(pos > -0.5, pos < n - 0.5)
    valid = jnp.where(inb, 1.0, 0.0).astype(jnp.float32)
    posc = jnp.clip(pos, 0.0, float(n - 1))
    i0f = jnp.clip(jnp.floor(posc), 0.0, float(max(n - 2, 0)))
    d = posc - i0f
    return i0f.astype(jnp.int32), (1.0 - d) * valid, d * valid


def _patch_kernel(geom_ref, feat_ref, out_ref, tmp_ref, *, E, H, W):
    # geom arrives in 8-row SMEM blocks (the TPU block-shape rule demands
    # a sublane dim divisible by 8); this step's row is r % 8
    row = pl.program_id(1) % 8
    ys = geom_ref[row, 0]
    xs = geom_ref[row, 1]
    sh = geom_ref[row, 2]
    sw = geom_ref[row, 3]

    # row pass: E blended feature rows into VMEM scratch
    for t in range(E):
        y0, w0, w1 = _taps(ys, sh, float(t), H)
        rows = feat_ref[0, pl.ds(y0, 2), :, :].astype(jnp.float32)
        tmp_ref[t, :, :] = w0 * rows[0] + w1 * rows[1]

    # column pass: blend column pairs of the scratch into the output
    for s in range(E):
        x0, w0, w1 = _taps(xs, sw, float(s), W)
        cols = tmp_ref[:, pl.ds(x0, 2), :]
        out_ref[0, :, s, :] = (
            w0 * cols[:, 0, :] + w1 * cols[:, 1, :]
        ).astype(out_ref.dtype)


def extract_patches(
    featc: jax.Array,
    ys: jax.Array,
    xs: jax.Array,
    sub_h: jax.Array,
    sub_w: jax.Array,
    *,
    rois_per_image: int,
    patch_cells: int,
    c_tile: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """All-roi patch extraction: [B,H,W,C] feat -> [B*rpi,E,E,C] patches.

    ys/xs/sub_h/sub_w are per-roi fp32 [B*rpi] sample-grid origins and
    spacings in feature-map pixels (cell t samples at ys + t*sub_h),
    exactly the arguments ops.deform._patch_matrices derives from
    _roi_geom. Rois must be image-contiguous (roi i -> image i // rpi).
    """
    B, H, W, C = featc.shape
    E = patch_cells
    rpi = rois_per_image
    R = B * rpi
    ct = min(c_tile, C)
    if C % ct:
        ct = C  # fall back to untiled channels
    n_c = C // ct
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    geom = jnp.stack(
        [ys, xs, sub_h, sub_w], axis=-1
    ).astype(jnp.float32)  # [R, 4]

    kernel = functools.partial(_patch_kernel, E=E, H=H, W=W)
    # grid (channel tile, roi): roi innermost so the feature block index
    # (r // rpi) is unchanged between consecutive steps — each image's
    # map is DMA'd once per channel tile
    out = pl.pallas_call(
        kernel,
        grid=(n_c, R),
        in_specs=[
            pl.BlockSpec((8, 4), lambda c, r: (r // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, W, ct), lambda c, r: (r // rpi, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, E, E, ct), lambda c, r: (r, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, E, E, C), featc.dtype),
        scratch_shapes=[pltpu.VMEM((E, W, ct), jnp.float32)],
        interpret=interpret,
    )(geom, featc)
    return out
