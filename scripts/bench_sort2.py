#!/usr/bin/env python
"""Follow-up: XLA TPU sort scaling in M, dtype, and column count."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np


def timeit(fn, inputs, reps=8):
    import jax
    out = fn(inputs[0])
    jax.block_until_ready(out)
    t0 = time.time()
    acc = None
    for i in range(reps):
        leaf = fn(inputs[i % len(inputs)])
        acc = leaf if acc is None else acc + leaf
    _ = np.asarray(acc).ravel()[0]
    return (time.time() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    for M in (1_100_000, 2_100_000, 3_200_000):
        rows = []
        for tag, keydt in (("f32", np.float32), ("i32", np.int32)):
            ins = []
            for s in range(2):
                r = np.random.default_rng(s)
                k = r.uniform(0, 1e6, size=M).astype(np.float32)
                k = k.astype(keydt)
                p = [r.normal(size=M).astype(np.float32) for _ in range(12)]
                ins.append((jnp.asarray(k),
                            tuple(jnp.asarray(x) for x in p)))

            @jax.jit
            def s1(d):
                k, p = d
                return jax.lax.sort((k, p[0]), num_keys=1)[1]

            @jax.jit
            def s13(d):
                k, p = d
                return jax.lax.sort((k,) + p, num_keys=1)[1]

            ms1 = timeit(s1, ins)
            ms13 = timeit(s13, ins)
            rows.append(f"  key={tag}: 2-col {ms1:7.2f} ms   13-col {ms13:7.2f} ms")
        print(f"M={M:,}")
        for rw in rows:
            print(rw)


if __name__ == "__main__":
    main()
