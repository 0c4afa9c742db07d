"""Component micro-benchmarks — the successor of the reference's
``scripts/ann_benchmark.py``, ``annoy_benchmark.py`` and
``fftw_mem_profile.py`` (SURVEY.md §2.2 #24-26).

Times each pipeline stage separately on the current default backend and
prints one JSON line per stage.  Usage::

    python benchmarks/components.py [--n-grid 512] [--n-particles 10000000]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax

    jax.tree_util.tree_map(
        lambda a: np.asarray(a.ravel()[:1]) if hasattr(a, "ravel") else a, x
    )


def timed(fn, *args, repeats=2):
    r = fn(*args)
    sync(r)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = fn(*args)
        sync(r)
        best = min(best, time.perf_counter() - t0)
    del r   # free device HBM before the next stage
    return best, None


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-grid", type=int, default=512)
    parser.add_argument("--n-particles", type=int, default=10_000_000)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vpower_tpu.deposit.nn import nn_assign
    from vpower_tpu.deposit.scatter import deposit_cic, deposit_ngp
    from vpower_tpu.deposit.sph import sph_deposit
    from vpower_tpu.spectrum.power import shell_bin, vector_power

    N = args.n_grid
    NP = args.n_particles
    key = jax.random.PRNGKey(0)
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (NP, 3), jnp.float32)
    vel = jax.random.normal(kv, (NP, 3), jnp.float32)
    mass = jnp.ones((NP,), jnp.float32)
    values = jnp.concatenate([vel * mass[:, None], mass[:, None]], axis=1)

    def report(stage, seconds, unit_count, unit):
        print(json.dumps({
            "stage": stage,
            "seconds": round(seconds, 4),
            "throughput": round(unit_count / seconds / 1e6, 1),
            "unit": f"M{unit}/s",
        }), flush=True)

    t, _ = timed(jax.jit(lambda p, v: deposit_ngp(p, v, N, 1.0)), pos, values)
    report("deposit_ngp", t, NP, "particles")

    t, _ = timed(jax.jit(lambda p, v: deposit_cic(p, v, N, 1.0)), pos, values)
    report("deposit_cic", t, NP, "particles")

    h = jnp.full((NP,), 1.5 / N, jnp.float32)
    t, _ = timed(
        jax.jit(lambda p, v, hh: sph_deposit(p, v, hh, N, 1.0, s_max=1)),
        pos, values, h,
    )
    report("deposit_sph_smax1", t, NP, "particles")

    t, _ = timed(jax.jit(lambda p: nn_assign(p, N, 1.0)), pos)
    report("nn_assign", t, N**3, "queries")

    if N % 64 == 0:
        from vpower_tpu.deposit.nn_window import nn_window_gather

        t, _ = timed(
            lambda p, v: nn_window_gather(p, v, N, 1.0)[0], pos, values
        )  # host-orchestrated (tier syncs) -- not jittable as a whole
        report("nn_exact_window", t, N**3, "queries")

    v_grid = jax.random.normal(jax.random.PRNGKey(1), (3, N, N, N), jnp.float32)
    t, _ = timed(jax.jit(lambda v: vector_power(v, 1.0)), v_grid)
    report("vector_power_3xFFT", t, 3 * N**3, "modes")

    p_grid = jax.jit(lambda v: vector_power(v, 1.0))(v_grid)
    del v_grid
    t, _ = timed(jax.jit(lambda p: shell_bin(p, 1.0)), p_grid)
    report("shell_bin", t, N**3, "modes")

    return 0


if __name__ == "__main__":
    sys.exit(main())
