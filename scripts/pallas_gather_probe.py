"""Why the sweep kernels are XLA gathers, not Pallas: measured evidence.

Every learner's hot op is a random gather from [N]-sized residual/param
tables (e/q/t caches, per-column stats).  This probe pins down the
alternatives on the actual TPU:

1. XLA 1-D ``jnp.take`` from a 4 MB table: ~7 ns/idx (~144M idx/s) —
   latency-bound, NOT bandwidth-bound, so in principle there is headroom.
2. XLA lane-local ``take_along_axis`` ([S,128] table, per-lane indices):
   SLOWER (~74M idx/s) — restructuring column lists per lane buys nothing.
3. Pallas/Mosaic: the only gather primitive is ``tpu.dynamic_gather``, an
   intra-tile sublane shuffle.  It lowers ONLY when the gather depth fits
   one (8, 128) register tile — depth 8.  Any deeper table fails to
   compile (verified below), so a VMEM-resident table gather kernel is
   not expressible; the remaining encodings (one-hot MXU matmul: O(N) per
   index; per-element DMA: serial) were measured slower in rounds 1-2.

Conclusion (matches CLAUDE.md's perf model): XLA's gather is the floor
for this op mix on this hardware generation; the framework's wins come
from MINIMIZING INDEX PASSES (channel-stacking, factor blocking), not
from hand-written kernels.

Usage: python scripts/pallas_gather_probe.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M = 1_000_000, 2_000_000
    rng = np.random.default_rng(0)

    # --- 1. XLA 1-D take ------------------------------------------------
    idx = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    e = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    @jax.jit
    def xla_take(e):
        return e + 1e-30 * jnp.take(e, idx).sum()

    x = xla_take(e); np.asarray(x[:1])
    t0 = time.perf_counter()
    for _ in range(50):
        x = xla_take(x)
    np.asarray(x[:1])
    w = time.perf_counter() - t0
    print(f"XLA 1-D take      : {w/50*1e3:6.2f} ms = {M*50/w/1e6:5.0f}M idx/s"
          f" ({w/50/M*1e9:.2f} ns/idx)")

    # --- 2. XLA lane-local take_along_axis ------------------------------
    S, LANES = N // 128, 128
    T = M // 128
    e2d = jnp.asarray(rng.standard_normal((S, LANES)).astype(np.float32))
    idx2 = jnp.asarray(rng.integers(0, S, (T, LANES)).astype(np.int32))

    @jax.jit
    def xla_tala(e):
        return e + 1e-30 * jnp.take_along_axis(e, idx2, axis=0).sum()

    x = xla_tala(e2d); np.asarray(x[0, :1])
    t0 = time.perf_counter()
    for _ in range(50):
        x = xla_tala(x)
    np.asarray(x[0, :1])
    w = time.perf_counter() - t0
    print(f"XLA lane-local TAA: {w/50*1e3:6.2f} ms = {M*50/w/1e6:5.0f}M idx/s")

    # --- 3. Pallas dynamic_gather depth probe ---------------------------
    for depth in (8, 32, 1024):
        t = jnp.asarray(rng.standard_normal((depth, LANES)).astype(np.float32))
        i = jnp.asarray(rng.integers(0, depth, (depth, LANES)).astype(np.int32))

        def kernel(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

        pc = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((depth, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        try:
            y = jax.jit(pc)(t, i)
            ok = bool(jnp.allclose(y, jnp.take_along_axis(t, i, axis=0)))
            print(f"pallas dynamic_gather depth {depth:5d}: lowers, "
                  f"correct={ok}")
        except Exception as ex:
            print(f"pallas dynamic_gather depth {depth:5d}: DOES NOT LOWER "
                  f"({type(ex).__name__})")


if __name__ == "__main__":
    main()
