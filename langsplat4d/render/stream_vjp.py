"""Stream-binned analytic custom-VJP compositing for the TRAINING path.

The tile-list training composite (render/composite_vjp.py) pays for padded
per-tile capacity lists: bin_tiles' top-k cascade builds [T, K] entries and
both the primal and the backward gather/scatter T*K rows. This module is the
stream-binned replacement (PERF.md round-3 roadmap #2): the narrow-sort
stream build (render/stream.py build_stream_train) assigns each (Gaussian,
tile) pair one slot of a chunk-ALIGNED stream, and the fused pallas pair
(ops/tile_composite.composite_stream_chunks_pallas / _backward_pallas)
composites / differentiates it with the chunk index as the sequential grid —
work and memory scale with actual pairs, not num_tiles * capacity, with NO
scatter conflicts (every chunk is owned by exactly one tile).

Differentiability contract (mirrors composite_cv):
- inputs: packed [N, 6+c] differentiable per-Gaussian rows
  [pix(2) | conic(3) | opacity(1) | colors/features/depth], bg [3];
  src/valid/chunk_tile are integer plumbing from build_stream_train
  (float0 cotangents).
- ONE differentiable gather packed[src] feeds the kernels; its VJP is ONE
  scatter-add of the backward's per-slot gradient rows — the kernel emits
  d_op (not d_ln_op), so the scatter lands directly on the packed layout.
- the forward saves only (accum); T_fin derives from the alpha channel and
  the backward recomputes its sweep from the gathered rows (same
  no-residual design as composite_vjp, which is what lets the primal run
  fully fused).

CUDA-parity semantics (alpha >= 1/255 cutoff, T >= 1e-4 early stop,
alpha <= 0.99 clamp with zero gradient in the clamped/killed regions) are
identical to the tile-list path — gradient equality is tested end-to-end in
tests/test_stream_train.py.

Reference role: the CUDA rasterizer's BACKWARD kernel over the same
duplicate+radix-sort binning (4d-langsplat-rasterization submodule,
gaussian_renderer/__init__.py:49-63 interface).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from langsplat4d.ops.tile_composite import (
    HDR, composite_stream_chunks_backward_pallas,
    composite_stream_chunks_pallas)

HP = jax.lax.Precision.HIGHEST


def _stream_rows(packed: jnp.ndarray, src: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
    """ONE differentiable gather -> kernel-layout stream rows [PW, B_al].

    packed: [N, 6+c] rows [pix(2), conic(3), opacity, feats...]. The kernel
    layout inserts the 2 spare header rows and carries ln(opacity); invalid
    slots are killed via ln_op = -1e30 (zero alpha => zero gradient)."""
    rows = packed[src]                               # [B_al, 6+c] (the VJP
    # of this gather is the single scatter-add of the backward's rows)
    ln_op = jnp.log(jnp.maximum(rows[:, 5], 1e-30))
    ln_op = jnp.where(valid, ln_op, jnp.float32(-1e30))
    out = jnp.concatenate([
        rows[:, :5], ln_op[:, None],
        jnp.zeros((rows.shape[0], 2), packed.dtype), rows[:, 6:],
    ], axis=1)                                       # [B_al, HDR + c_all]
    return out.T                                     # [PW = HDR+c_all, B_al]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_stream_train(settings, packed, src, valid, chunk_tile, bg):
    """-> accum [num_tiles, c_out, px] (same channel layout as
    composite_cv: [rgb | feats | depth | alpha], bg-blended RGB)."""
    rows = _stream_rows(packed, src, valid)
    return composite_stream_chunks_pallas(
        rows, chunk_tile, bg, tiles_x=settings.tiles_x,
        num_tiles=settings.num_tiles, tile_size=settings.tile_size,
        g=settings.stream_train_chunk, hard_cutoffs=settings.hard_cutoffs)


def _fwd(settings, packed, src, valid, chunk_tile, bg):
    rows = _stream_rows(packed, src, valid)
    accum = composite_stream_chunks_pallas(
        rows, chunk_tile, bg, tiles_x=settings.tiles_x,
        num_tiles=settings.num_tiles, tile_size=settings.tile_size,
        g=settings.stream_train_chunk, hard_cutoffs=settings.hard_cutoffs)
    # rows ride to the backward (saves re-gathering B_al rows); accum gives
    # total and T_fin without any scan residuals
    return accum, (packed, src, valid, chunk_tile, bg, rows, accum)


def _bwd(settings, res, g_out):
    packed, src, valid, chunk_tile, bg, rows, accum = res
    c_all = packed.shape[1] - 6
    total = jnp.sum(accum * g_out, axis=1)            # [T, px]
    T_fin = 1.0 - accum[:, c_all, :]                  # alpha channel id.
    d_rows = composite_stream_chunks_backward_pallas(
        rows, chunk_tile, g_out, total, tiles_x=settings.tiles_x,
        num_tiles=settings.num_tiles, tile_size=settings.tile_size,
        g=settings.stream_train_chunk,
        hard_cutoffs=settings.hard_cutoffs)           # [PW, B_al]
    # [dmx, dmy, dc0, dc1, dc2, d_op, 0, 0 | d_feats] -> packed layout
    d_sel = jnp.concatenate(
        [d_rows[:6], d_rows[HDR:HDR + c_all]], axis=0).T   # [B_al, 6+c]
    grads = jnp.zeros_like(packed).at[src].add(d_sel)
    d_bg = jnp.einsum("tp,tcp->c", T_fin, g_out[:, :3, :], precision=HP)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
    return grads, f0(src), f0(valid), f0(chunk_tile), d_bg


composite_stream_train.defvjp(_fwd, _bwd)
