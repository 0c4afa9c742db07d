"""Measured large-range folded VELOCITY spectrum on one chip — the
reference's canonical workload (``parallel_optimized.py:337-398``:
NN-gather velocity, phase, fold) at a dynamic range it never recorded.

Writes ``benchmarks/streamed_velocity_<ntot>.json`` with stage timings.
Run: ``python benchmarks/streamed_velocity.py [NTOT] [N_BETAS]``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    ntot = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_betas = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    # persistent compile cache (same facility as the CLI's
    # --compile-cache): the record keeps first-block-incl-compile
    # separate, and cached reruns measure the steady pipeline
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vpower_jax"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vpower_tpu.io.synthetic import (
        gaussian_random_field, grid_positions, particles_from_field,
    )
    from vpower_tpu.run.streamed import streamed_folded_sweep
    from vpower_tpu.spectrum.spectrum import random_beta_sequence

    # Same 10M-particle workload as bench.py.
    key = jax.random.PRNGKey(42)
    kf, kp = jax.random.split(key)
    field = gaussian_random_field(kf, 256, 1.0)
    pos = grid_positions(216, 1.0, key=kp, jitter=3.0)
    particles = particles_from_field(field, 1.0, pos)
    import jax.numpy as jnp
    float(jnp.sum(particles.pos[:, 0]))  # materialize inputs

    # Plan: n_grid 256 blocks (NN working set + beta-batch accumulators
    # fit the 16 GB chip), m = ntot / 256.
    n_grid = 256
    m = ntot // n_grid
    betas = random_beta_sequence(m, seed=1)[:n_betas]

    t_first_block = [None]
    t0 = time.time()

    def progress(bi, n_batches, q, n_blocks):
        if t_first_block[0] is None:
            t_first_block[0] = time.time() - t0
        if (q + 1) % 32 == 0:
            el = time.time() - t0
            print(f"[{el:8.1f}s] batch {bi + 1}/{n_batches} "
                  f"block {q + 1}/{n_blocks}", flush=True)

    # margin: density-aware certified default (~3 mean spacings -> a
    # 320^3 extended descent instead of the worst-case-64-margin 384^3;
    # blocks that cannot be certified escalate automatically)
    stages = {}
    sweep = streamed_folded_sweep(
        particles, n_grid, m, quantity="velocity", method="nn",
        beta_sequence=betas, beta_batch=min(n_betas, 8),
        cache=False, progress=progress,
        stage_times=stages,
    )
    wall = time.time() - t0
    combined = sweep.combine_all()

    # stage_times carries the certificate counters inline; split them
    # out so "stages" stays a pure wall-time map (ADVICE round 3)
    certificate = {
        k: stages.pop(k)
        for k in ("suspect_cells", "escalated_blocks", "uncertified_cells")
        if k in stages
    }
    result = {
        "metric": f"{ntot}-range folded velocity P(k), NN gather, "
                  f"{n_betas} betas, 10M particles, 1 chip",
        "ntot": ntot,
        "n_grid": n_grid,
        "fold_m": m,
        "n_betas": n_betas,
        "wall_s": round(wall, 2),
        "s_per_beta": round(wall / n_betas, 2),
        "first_block_s_incl_compile": round(t_first_block[0] or 0.0, 2),
        "modes_binned": float(combined.Nsample.sum()),
        "n_blocks": m**3,
        "stages": stages,
        "certificate": certificate,
    }
    print(json.dumps(result), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"streamed_velocity_{ntot}.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
