"""Round-5 phase ablation at bench scale: phase1-only vs full SpMV,
plus a phase2 variant without the pack stages — attributes the 2.6 ms
between benes/gather (p1), route+reduce (p2), and the pack tail."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphblas_tpu.kernels import spmv_route as SPRT
from graphblas_tpu.kernels import static_route as SRT

PLAN = "/root/repo/.bench_plan.npz"
SYNC = 0.0286


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])[0])


def timeit(fn, *args, iters=30):
    y = fn(*args)
    sync(y)
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        y = fn(*args)
        sync(y)
        best = min(best, time.perf_counter() - t0)
    return max(best - SYNC, 1e-9) / iters


def phase1_only(plan, iters):
    gp, gs = plan.gp, plan.g
    T2, R1 = gp.T, gp.R1
    TR = gp.TR
    rows_pp = gp.rows_pp
    ratio = gs.RBL // TR
    cp = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)
    k1 = functools.partial(SPRT._gather_phase1_kernel, dists=gp.dists1,
                           R=R1, rows_in=TR, rows_out=T2 * rows_pp)
    phase1 = pl.pallas_call(
        k1, grid=(T2,),
        in_specs=[
            pl.BlockSpec((128, 128), lambda t: (t // ratio, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R1, 128), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T2 * rows_pp, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T2 * T2 * rows_pp, 128),
                                       jnp.float32),
        compiler_params=cp)

    @jax.jit
    def run(x, pln):
        g2 = pln.g
        def body(i, acc):
            with jax.enable_x64(False):
                mid = phase1(SPRT._window_xt(acc[: g2.n], g2), g2.hi,
                             g2.val, pln.gp.bits1)
            return acc.at[:1].add(mid[0, :1] * 1e-30)
        return jax.lax.fori_loop(0, iters, body, x)
    return run


def main():
    plan = SPRT.load_plan(PLAN)
    if isinstance(plan, SPRT.StripedSpmvPlan):
        stripes = plan.plans
    else:
        stripes = [plan]
    plan = SPRT.plan_to_device(plan)
    stripes_d = plan.plans if isinstance(plan, SPRT.StripedSpmvPlan) \
        else [plan]
    n = stripes[0].n
    rng = np.random.default_rng(1)
    x0 = jnp.asarray((rng.standard_normal(n) * 1e-3).astype(np.float32))
    IT = 30

    @jax.jit
    def full(x, pln):
        def body(i, acc):
            y = SPRT.spmv_route(acc, pln)
            return acc.at[:1].add(y[:1] * 1e-30)
        return jax.lax.fori_loop(0, IT, body, x)

    t_full = timeit(full, x0, plan, iters=IT)
    print(f"full spmv: {t_full*1e3:.3f} ms")

    for k, (ps, pd) in enumerate(zip(stripes, stripes_d)):
        run = phase1_only(ps, IT)
        t1 = timeit(run, x0, pd, iters=IT)
        frac = ps.T * ps.TR * 128
        print(f"stripe{k} (T={ps.T}, slots={frac/1e6:.1f}M) "
              f"phase1-only: {t1*1e3:.3f} ms")


if __name__ == "__main__":
    main()
