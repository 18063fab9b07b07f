"""Micro-benchmark: [.., E, 3] vertex gather+reduce vs 3 planar gathers.

The PGF static-shift rewrite (round 3) found that a fused
``take(x, elem_nodes, axis=-1)`` puts the 3-vertex axis minor, which the
TPU (8,128) tiling pads 3->128 (42x HBM expansion).  This probes whether
XLA fuses the padded intermediate away when a reduction follows —
scalar_gradient (every SSH CG iteration), tracer_gradient_elements, and
the FCT elementwise bounds all use the fused form.

PYTHONPATH=/root/repo python scripts/gather3_micro.py
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
    print(f"  {name:40s}: {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    NL = 47
    N = 188_661
    E = 373_696
    rng = np.random.RandomState(0)
    t = jnp.asarray(rng.randn(NL, N).astype(np.float32))
    en = jnp.asarray(rng.randint(0, N, (E, 3)).astype(np.int32))
    g = jnp.asarray(rng.randn(E, 6).astype(np.float32))

    # gradient: fused [NL,E,3] gather + weighted sum
    def grad_fused(tt):
        te = jnp.take(tt, en, axis=-1)
        return ((te * g[:, 0:3]).sum(-1), (te * g[:, 3:6]).sum(-1))

    # gradient: 3 planar gathers
    def grad_planar(tt):
        gx = None
        gy = None
        for v in range(3):
            tv = tt[:, en[:, v]]
            gx = tv * g[:, v] if gx is None else gx + tv * g[:, v]
            gy = tv * g[:, 3 + v] if gy is None else gy + tv * g[:, 3 + v]
        return gx, gy

    # max-reduce forms (FCT bounds)
    def max_fused(tt):
        return jnp.take(tt, en, axis=-1).max(-1)

    def max_planar(tt):
        return jnp.maximum(jnp.maximum(tt[:, en[:, 0]], tt[:, en[:, 1]]),
                           tt[:, en[:, 2]])

    # 2-D surface-only forms (EVP-style)
    t2 = t[0]

    def mean_fused2(tt):
        return jnp.take(tt, en, axis=-1).mean(-1)

    def mean_planar2(tt):
        return (tt[en[:, 0]] + tt[en[:, 1]] + tt[en[:, 2]]) / 3.0

    a = bench("grad fused [NL,E,3]", grad_fused, t)
    b = bench("grad planar 3x[NL,E]", grad_planar, t)
    c = bench("max fused [NL,E,3]", max_fused, t)
    d = bench("max planar 3x[NL,E]", max_planar, t)
    e = bench("mean2d fused [E,3]", mean_fused2, t2)
    f = bench("mean2d planar 3x[E]", mean_planar2, t2)
    print(f"speedups: grad {a/b:.2f}x  max {c/d:.2f}x  mean2d {e/f:.2f}x")


if __name__ == "__main__":
    main()
