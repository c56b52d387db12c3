#!/usr/bin/env python
"""Span/pair-count statistics of the realistic bench scene (CPU, no TPU).

Sizes the big-splat problem for the stream binning redesign: exact
(Gaussian, tile) pair counts with and without an ellipse-tile intersection
cull, per-span-bucket demand, and the emitted-slot cost of candidate tier
configurations. The opacity-aware rect (render/raster.py preprocess) is the
baseline; the ellipse cull drops rect tiles where min over the tile of the
conic quadratic form exceeds t2 = 2*ln(255*op) (alpha < 1/255 everywhere in
the tile -> the compositor would skip every pixel anyway).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def tile_min_quad(A, B, C, cx, cy, x0, x1, y0, y1):
    """Min of q(x,y)=A(x-cx)^2+2B(x-cx)(y-cy)+C(y-cy)^2 over [x0,x1]x[y0,y1].

    Vectorized over Gaussians x tiles. Exact for PSD quadratics: if the
    center is inside the rect the min is 0; otherwise the min is on the
    boundary — evaluate the four clamped edge minima.
    """
    inside = (cx >= x0) & (cx <= x1) & (cy >= y0) & (cy <= y1)

    def edge_x(xe):
        # fix x=xe, minimize over y in [y0,y1]: dq/dy = 0 -> y* = cy - B(xe-cx)/C
        dx = xe - cx
        ys = cy - B * dx / np.maximum(C, 1e-12)
        yc = np.clip(ys, y0, y1)
        dy = yc - cy
        return A * dx * dx + 2 * B * dx * dy + C * dy * dy

    def edge_y(ye):
        dy = ye - cy
        xs = cx - B * dy / np.maximum(A, 1e-12)
        xc = np.clip(xs, x0, x1)
        dx = xc - cx
        return A * dx * dx + 2 * B * dx * dy + C * dy * dy

    m = np.minimum(np.minimum(edge_x(x0), edge_x(x1)),
                   np.minimum(edge_y(y0), edge_y(y1)))
    return np.where(inside, 0.0, m)


def main():
    import jax
    import jax.numpy as jnp
    from langsplat4d.core.transforms import safe_normalize
    from langsplat4d.render.raster import CameraParams, RasterSettings, \
        preprocess
    from langsplat4d.core.transforms import projection_matrix, world_to_view
    from langsplat4d.utils.synth import realistic_gaussians

    H = int(os.getenv("BENCH_H", 1014))
    W = int(os.getenv("BENCH_W", 1352))
    n = int(os.getenv("BENCH_N", 200_000))
    gs = realistic_gaussians(n, lang_dim=3, seed=0)

    settings = RasterSettings(image_height=H, image_width=W, sh_degree=3,
                              lang_dim=3, include_feature=True,
                              tile_capacity=512)
    Rm = np.eye(3)
    T = np.array([0.0, 0.0, 4.5])
    wv = world_to_view(Rm, T).T
    proj = projection_matrix(0.01, 100.0, 1.0, 0.8).T
    cam = CameraParams(
        viewmatrix=jnp.asarray(wv), projmatrix=jnp.asarray(wv @ proj),
        campos=jnp.asarray(np.linalg.inv(wv)[3, :3]),
        tanfovx=jnp.asarray(np.tan(0.5)), tanfovy=jnp.asarray(np.tan(0.4)))

    prep = preprocess(settings, cam, gs.xyz, jnp.zeros((gs.capacity, 2)),
                      jax.nn.sigmoid(gs.opacity), jnp.exp(gs.scaling),
                      safe_normalize(gs.rotation), None,
                      colors_precomp=jnp.zeros((gs.capacity, 3)),
                      active=gs.active_mask())

    vis = np.asarray(prep["visible"])
    rmin = np.asarray(prep["rect_min"]).astype(np.int64)
    rmax = np.asarray(prep["rect_max"]).astype(np.int64)
    conic = np.asarray(prep["conic"])
    op = np.asarray(prep["opacity"])
    pix = np.asarray(prep["point_image"])

    sx = np.where(vis, rmax[:, 0] - rmin[:, 0], 0)
    sy = np.where(vis, rmax[:, 1] - rmin[:, 1], 0)
    span = np.maximum(sx, sy)
    area = np.where(vis, sx * sy, 0)

    print(f"visible: {vis.sum()} / {n}")
    print(f"rect-pair total M_exact = {area.sum():,}")
    qs = [50, 90, 99, 99.9, 100]
    print("span quantiles:", {q: float(np.percentile(span[vis], q))
                              for q in qs})
    for lo, hi in [(0, 2), (3, 3), (4, 6), (7, 16), (17, 32), (33, 64),
                   (65, 10 ** 9)]:
        m = vis & (span >= lo) & (span <= hi)
        print(f"  span {lo:>3}-{hi if hi < 10**9 else 'inf':>3}: "
              f"count {m.sum():>7,}  pairs {area[m].sum():>12,}")

    # ellipse-tile cull on the big ones (span > 2): chunked over span
    # buckets, vectorized over (gauss, tile-slot)
    t2 = 2.0 * np.log(np.clip(255.0 * op, 1.0, None))
    culled_total = int(area[vis & (span <= 2)].sum())
    kept_by_bucket = {}
    for lo, hi in [(3, 6), (7, 16), (17, 32), (33, 64), (65, 10 ** 9)]:
        m = vis & (span >= lo) & (span <= hi)
        idx = np.nonzero(m)[0]
        if idx.size == 0:
            continue
        smax = int(span[idx].max())
        kept = 0
        # enumerate slots of the max rect once; mask per Gaussian
        dxs, dys = np.meshgrid(np.arange(smax), np.arange(smax),
                               indexing="ij")
        dxs, dys = dxs.ravel()[None], dys.ravel()[None]      # [1, S*S]
        for c0 in range(0, idx.size, 2048):
            ii = idx[c0:c0 + 2048]
            tx = rmin[ii, 0:1] + dxs                           # [B, S*S]
            ty = rmin[ii, 1:2] + dys
            okr = (tx < rmax[ii, 0:1]) & (ty < rmax[ii, 1:2])
            x0, x1 = tx * 16.0, tx * 16.0 + 15.0
            y0, y1 = ty * 16.0, ty * 16.0 + 15.0
            q = tile_min_quad(conic[ii, 0:1], conic[ii, 1:2], conic[ii, 2:3],
                              pix[ii, 0:1], pix[ii, 1:2], x0, x1, y0, y1)
            kept += int((okr & (q <= t2[ii, None])).sum())
        kept_by_bucket[(lo, hi)] = (int(area[m].sum()), kept)
        culled_total += kept
    print("\nellipse-tile cull (exact alpha>=1/255 coverage):")
    for (lo, hi), (rect_pairs, kept) in kept_by_bucket.items():
        print(f"  span {lo:>3}-{hi if hi < 10**9 else 'inf':>3}: "
              f"rect {rect_pairs:>12,} -> ellipse {kept:>12,} "
              f"({kept / max(rect_pairs, 1):.2%})")
    print(f"M_exact with cull = {culled_total:,} "
          f"(vs rect {int(area.sum()):,})")


if __name__ == "__main__":
    main()
