"""Gather cost model on TPU: per-index vs per-value bound?

The tracer/EVP phases at 188k are dominated by XLA gathers (measured
~2G values/s in round 4).  Whether merging gathers that SHARE an index
table (stacking operands along a leading F axis) is free decides the
whole round-5 restructuring strategy:

- per-INDEX bound: [F,N] operand with the same [K,N] indices costs the
  same for F=47 and F=94  ->  merge everything sharing indices.
- per-VALUE bound: cost ~ F  ->  only reducing gathered values helps.

Also probes: value dtype width (f32 vs bf16 vs f64), index count scaling,
and whether a Pallas kernel can express a local VMEM gather at all.

Run on the TPU host:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/gather_cost_model.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fesom2_tpu.utils.profiling import _barrier


def bench(name, fn, *args, n=5):
    jf = jax.jit(fn)
    _barrier(jf(*args))
    _barrier(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    _barrier(out)
    dt = (time.perf_counter() - t0) / n
    print(f"  {name:44s}: {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    N = 188_661
    Ed = 566_000
    K = 8
    rng = np.random.RandomState(0)
    idxK = jnp.asarray(rng.randint(0, Ed, (K, N)).astype(np.int32))
    idx1 = jnp.asarray(rng.randint(0, Ed, (Ed,)).astype(np.int32))

    print("== F scaling, operand [F, Ed] f32, idx [8, N] (1.51M indices) ==")
    for F in (2, 8, 16, 32, 47, 94, 141, 188):
        op = jnp.asarray(rng.randn(F, Ed).astype(np.float32))
        bench(f"F={F:<3d} [F,Ed] idx[8,N]",
              lambda a, i: jnp.take(a, i, axis=-1), op, idxK)

    print("== dtype width, operand [47, Ed], idx [8, N] ==")
    for dt_ in (np.float32, jnp.bfloat16, np.float64, np.int8):
        op = jnp.asarray(rng.randn(47, Ed)).astype(dt_)
        bench(f"dtype={np.dtype(dt_).name:8s}",
              lambda a, i: jnp.take(a, i, axis=-1), op, idxK)

    print("== index count scaling, operand [47, Ed] f32 ==")
    op47 = jnp.asarray(rng.randn(47, Ed).astype(np.float32))
    for frac in (1, 2, 4, 8):
        ii = idxK[:, : N // frac]
        bench(f"idx[8,N/{frac}]",
              lambda a, i: jnp.take(a, i, axis=-1), op47, ii)

    print("== 1-D edge-index gathers (edge endpoint loads) ==")
    bench("[47,Ed] idx[Ed] 1-D", lambda a, i: jnp.take(a, i, axis=-1),
          op47, idx1)
    bench("[47,Ed] idx[2,Ed/2]", lambda a, i: jnp.take(a, i, axis=-1),
          op47, idx1.reshape(2, -1))

    print("== sorted vs random indices (locality sensitivity) ==")
    idx_sorted = jnp.asarray(np.sort(np.asarray(idxK), axis=-1))
    bench("idx[8,N] random", lambda a, i: jnp.take(a, i, axis=-1),
          op47, idxK)
    bench("idx[8,N] sorted per row", lambda a, i: jnp.take(a, i, axis=-1),
          op47, idx_sorted)
    # fully local: indices within a small window of the output position
    base = np.arange(N, dtype=np.int64) * Ed // N
    loc = (base[None, :] + rng.randint(0, 256, (K, N))) % Ed
    idx_local = jnp.asarray(loc.astype(np.int32))
    bench("idx[8,N] windowed-local", lambda a, i: jnp.take(a, i, axis=-1),
          op47, idx_local)

    print("== fused consumers: 1 gather feeding 3 reductions ==")
    def three_reds(a, i):
        v = jnp.take(a, i, axis=-1)
        return v.max(-2), v.min(-2), v.sum(-2)
    bench("gather + max/min/sum", three_reds, op47, idxK)

    def three_gathers(a, i):
        return (jnp.take(a, i, axis=-1).max(-2),
                jnp.take(a + 1.0, i, axis=-1).min(-2),
                jnp.take(a + 2.0, i, axis=-1).sum(-2))
    bench("3 gathers (distinct ops)", three_gathers, op47, idxK)


def pallas_probe():
    print("== Pallas local-gather probe ==")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 1024       # node window resident in VMEM
    T = 256        # outputs per tile
    NL = 48
    G = 512        # number of tiles
    rng = np.random.RandomState(1)
    vals = jnp.asarray(rng.randn(G, W, NL).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, W, (G, T)).astype(np.int32))

    def kern(idx_ref, val_ref, out_ref):
        out_ref[:] = jnp.take(val_ref[0], idx_ref[0], axis=0)[None]

    try:
        f = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((1, T), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, W, NL), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, NL), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, T, NL), jnp.float32),
        )
        def run(i, v):
            return f(i.reshape(G, T), v)
        bench("pallas take(axis=0) [W,NL] idx[T]", run, idx, vals)
        ref = jnp.take_along_axis(vals, idx[:, :, None].astype(jnp.int32)
                                  .repeat(NL, -1), axis=1)
        got = jax.jit(run)(idx, vals)
        err = float(jnp.abs(got - ref).max())
        print(f"  pallas gather correctness max err: {err:.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"  pallas take-based gather FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")

    # one-hot MXU variant for comparison (8 tiles per program for tiling)
    try:
        B = 8

        def kern2(idx_ref, val_ref, out_ref):
            oh = (idx_ref[:][:, :, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (B, T, W), 2))
            out_ref[:] = jax.lax.dot_general(
                oh.astype(jnp.float32), val_ref[:],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        f2 = pl.pallas_call(
            kern2,
            grid=(G // B,),
            in_specs=[
                pl.BlockSpec((B, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, W, NL), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, T, NL), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, T, NL), jnp.float32),
        )
        bench("pallas one-hot MXU gather", lambda i, v: f2(i, v), idx, vals)
        ref = jnp.take_along_axis(vals, idx[:, :, None].astype(jnp.int32)
                                  .repeat(NL, -1), axis=1)
        got = jax.jit(f2)(idx, vals)
        err = float(jnp.abs(got - ref).max())
        print(f"  pallas one-hot correctness max err: {err:.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"  pallas one-hot gather FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    if "--pallas-only" not in sys.argv:
        main()
    pallas_probe()
