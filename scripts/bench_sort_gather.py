#!/usr/bin/env python
"""TPU microbench: stream-build primitive costs for the binning redesign.

Measures, at realistic-scene scale (M_emit ~ 3.2M emitted slots, M_budget
~ 1.8M valid, N = 204800 Gaussians):
  1. the current 14-column payload-carrying lex sort;
  2. a 2-column (packed i32 key, src id) sort;
  3. row-gather rows[src] at [M_budget, 16] for random vs clustered src;
  4. the pre-pass costs: depth-rank argsort at N, Morton reorder at N.

Timing per PERF.md recipe: value-forced, input-varied reps, one sync.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def timeit(fn, inputs, reps=10):
    """Chain value-forced reps over varied inputs; returns ms/rep."""
    import jax
    out = fn(inputs[0])
    jax.block_until_ready(out)
    first = jax.tree.leaves(out)[0]
    assert np.isfinite(np.asarray(first).ravel()[0].astype(np.float64)) or True
    t0 = time.time()
    acc = None
    for i in range(reps):
        out = fn(inputs[i % len(inputs)])
        leaf = jax.tree.leaves(out)[0]
        acc = leaf if acc is None else acc + leaf.astype(acc.dtype)
    # force by value
    _ = np.asarray(acc).ravel()[0]
    return (time.time() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N = 204800
    M_EMIT = int(os.getenv("M_EMIT", 3_200_000))
    M_BUDGET = int(os.getenv("M_BUDGET", 1_800_000))

    def make_inputs(seed):
        r = np.random.default_rng(seed)
        tiles = r.integers(0, 5440, size=M_EMIT).astype(np.int32)
        # ~45% padding slots (sentinel tile) as in real emission
        pad = r.random(M_EMIT) < 0.45
        tiles[pad] = 8191
        depth = r.uniform(0.1, 10.0, size=M_EMIT).astype(np.float32)
        rank = r.integers(0, N, size=M_EMIT).astype(np.int32)
        key = (tiles.astype(np.int64) << 18 | rank).astype(np.int32)
        src = r.integers(0, N, size=M_EMIT).astype(np.int32)
        pays = r.normal(size=(12, M_EMIT)).astype(np.float32)
        rows_tbl = r.normal(size=(N, 16)).astype(np.float32)
        # clustered src: tile-segment-local indices (post-Morton locality):
        # runs of ~300 consecutive-ish ids
        base = np.repeat(r.integers(0, N - 512, size=M_EMIT // 256 + 1), 256)
        clus = (base[:M_EMIT] + r.integers(0, 512, size=M_EMIT)).astype(
            np.int32) % N
        return {k: jnp.asarray(v) for k, v in dict(
            tiles=tiles, depth=depth, key=key, src=src, pays=pays,
            rows=rows_tbl, clus=clus).items()}

    inputs = [make_inputs(s) for s in range(3)]

    @jax.jit
    def sort14(d):
        cols = (d["tiles"], d["depth"]) + tuple(d["pays"][i] for i in range(12))
        out = jax.lax.sort(cols, num_keys=2)
        return out[2]

    @jax.jit
    def sort2(d):
        k, s = jax.lax.sort((d["key"], d["src"]), num_keys=1)
        return s

    @jax.jit
    def sort3(d):
        t, dep, s = jax.lax.sort((d["tiles"], d["depth"], d["src"]),
                                 num_keys=2)
        return s

    @jax.jit
    def gather_rand(d):
        return d["rows"][d["src"][:M_BUDGET]]

    @jax.jit
    def gather_clus(d):
        return d["rows"][d["clus"][:M_BUDGET]]

    @jax.jit
    def gather_T_rand(d):
        # transposed table [16, N] gathered along axis 1 -> [16, M]
        return d["rows"].T[:, d["src"][:M_BUDGET]]

    @jax.jit
    def prepass(d):
        # depth-rank of N + Morton-ish reorder of the rows table
        dN = d["depth"][:N]
        order = jnp.argsort(dN)
        rank = jnp.zeros(N, jnp.int32).at[order].set(
            jnp.arange(N, dtype=jnp.int32))
        code = d["src"][:N]          # stand-in for morton codes
        morder = jnp.argsort(code)
        rows_m = d["rows"][morder]
        return rank, rows_m

    for name, fn in [("sort 14-col (2 keys+12 pay)", sort14),
                     ("sort 2-col (packed key+src)", sort2),
                     ("sort 3-col (tile,depth,src)", sort3),
                     ("row-gather [1.8M,16] random", gather_rand),
                     ("row-gather [1.8M,16] clustered", gather_clus),
                     ("col-gather [16,1.8M] random", gather_T_rand),
                     ("prepass rank+reorder @N", prepass)]:
        ms = timeit(fn, inputs)
        print(f"{name:36s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
