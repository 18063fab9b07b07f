"""Micro-benchmark of gather formulations at CORE2+ sizes.

fill_up_dn_grad gathers [nl-1, E] operands with 1-D [Ed] edge indices
(column gathers) and measured 1.12 s at 188k nodes — far off the
~300M idx/s the [K, N]-indexed kernels get.  This probes which
formulation is fast so the MUSCL gradient fill can be rewritten.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def barrier(x):
    float(jnp.asarray(x).astype(jnp.float32).sum())


def bench(name, fn, *args, n=5):
    jf = jax.jit(fn)
    barrier(jf(*args))
    barrier(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    barrier(out)
    dt = (time.perf_counter() - t0) / n
    print(f"  {name:34s}: {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    NL = 47
    E = 377_000
    Ed = 566_000
    rng = np.random.RandomState(0)
    gx = jnp.asarray(rng.randn(NL, E).astype(np.float32))
    gxT = jnp.asarray(np.ascontiguousarray(np.asarray(gx).T))
    ups = jnp.asarray(rng.randint(0, E, Ed).astype(np.int32))
    dns = jnp.asarray(rng.randint(0, E, Ed).astype(np.int32))
    gy = gx + 1.0
    g2 = jnp.stack([gx, gy])                       # [2, NL, E]

    # A: current form — 1-D index, levels-major operand (column gather)
    bench("A col-gather [NL,E] idx[Ed]", lambda a, i: jnp.take(a, i, axis=-1),
          gx, ups)
    # B: entity-major operand (row gather, contiguous 188 B per index)
    bench("B row-gather [E,NL] idx[Ed]", lambda a, i: jnp.take(a, i, axis=0),
          gxT, ups)
    # C: 2-D index (the [K,N] pattern of the fast kernels)
    ups2 = ups.reshape(2, Ed // 2)
    bench("C col-gather idx[2,Ed/2]",
          lambda a, i: jnp.take(a, i, axis=-1), gx, ups2)
    # D: four col gathers (the actual fill pattern)
    def four(a, b, i, j):
        return (jnp.take(a, i, axis=-1), jnp.take(a, j, axis=-1),
                jnp.take(b, i, axis=-1), jnp.take(b, j, axis=-1))
    bench("D 4x col-gather", four, gx, gy, ups, dns)
    # E: one stacked gather for both components, shared index
    def stacked(g, i, j):
        ij = jnp.stack([i, j])                    # [2, Ed]
        return jnp.take(g, ij, axis=-1)           # [2, NL, 2, Ed]
    bench("E stacked [2,NL,E] idx[2,Ed]", stacked, g2, ups, dns)
    # F: per-level batched via vmap over levels (index re-used per level)
    def per_level(a, i):
        return jax.vmap(lambda row: jnp.take(row, i))(a)
    bench("F vmap-level row take", per_level, gx, ups)
    # G: row gather from [E, NL] then transpose back
    bench("G row-gather + transpose",
          lambda a, i: jnp.take(a, i, axis=0).T, gxT, ups)


if __name__ == "__main__":
    main()


def main2():
    NL = 47
    E = 377_000
    Ed = 566_000
    N = 188_661
    K = 9
    KE = 8
    rng = np.random.RandomState(1)
    opE = jnp.asarray(rng.randn(NL, E).astype(np.float32))
    opEd = jnp.asarray(rng.randn(NL, Ed).astype(np.float32))
    op2E = jnp.stack([opE, opE + 1])
    op2Ed = jnp.stack([opEd, opEd + 1])
    idxK = jnp.asarray(rng.randint(0, E, (K, N)).astype(np.int32))
    idxKE = jnp.asarray(rng.randint(0, Ed, (KE, N)).astype(np.int32))

    bench("H [NL,Ed] idx[KE,N]", lambda a, i: jnp.take(a, i, axis=-1),
          opEd, idxKE)
    bench("I [2,NL,Ed] idx[KE,N]", lambda a, i: jnp.take(a, i, axis=-1),
          op2Ed, idxKE)
    bench("J [NL,E] idx[K,N]", lambda a, i: jnp.take(a, i, axis=-1),
          opE, idxK)
    bench("K [2,NL,E] idx[K,N]", lambda a, i: jnp.take(a, i, axis=-1),
          op2E, idxK)
    # vmap over the stacked pair, shared index (what jax.vmap(stage1) emits)
    bench("L vmap-pair [NL,Ed] idx[KE,N]",
          lambda a, i: jax.vmap(lambda x: jnp.take(x, i, axis=-1))(a),
          op2Ed, idxKE)
    # explicit per-component python loop (no batch dim in the gather)
    bench("M loop-pair [NL,Ed] idx[KE,N]",
          lambda a, i: jnp.stack([jnp.take(a[0], i, axis=-1),
                                  jnp.take(a[1], i, axis=-1)]),
          op2Ed, idxKE)


if __name__ == "__main__":
    main2()
