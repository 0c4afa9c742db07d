"""1024^3-dynamic-range snapshot -> P(k) on ONE chip (BASELINE.md
north-star config; VERDICT r1 item 6).

A raw 1024^3 velocity deposit needs 4 x 4.3 GB grids — more than one
v5e's 15.75 GB HBM — so the production single-chip answer is the
reference planner's own move (``parallel_optimized.py:70-88``): fold
m=2 over a 512^3 grid, 8 phase-shifted sub-spectra, O(512^3) memory.
The betas are embarrassingly parallel across chips, so the v5p-16
number is ~this wall / 16 + the unfolded low-k pass.

Prints one JSON line per stage and a total.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vpower_tpu.io.synthetic import (
        gaussian_random_field, grid_positions, particles_from_field,
    )
    from vpower_tpu.run.pipeline import fused_fold_full_spectrum

    key = jax.random.PRNGKey(42)
    kf, kp = jax.random.split(key)
    box = 1.0
    field = gaussian_random_field(kf, 256, box)
    pos = grid_positions(216, box, key=kp, jitter=3.0)   # ~10.1M particles
    particles = particles_from_field(field, box, pos)
    float(jnp.sum(particles.pos[:, 0]))

    # Warm-up compile with the SAME batch shape — excluded, like the
    # reference's cached FFTW plans (interp.py:41).
    t0 = time.perf_counter()
    fused_fold_full_spectrum(particles, 512, 2, beta_batch=8)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    spec = fused_fold_full_spectrum(particles, 512, 2, beta_batch=8)
    total = time.perf_counter() - t0

    print(json.dumps({
        "config": "1024^3 dynamic range, 10M particles, 1 chip "
                  "(fold m=2 over 512^3, all 8 betas)",
        "compile_s": round(compile_s, 2),
        "wall_s": round(total, 2),
        "per_beta_s": round(total / 8, 3),
        "n_bins": len(spec),
        "finite": bool(np.isfinite(spec.P).all()),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
