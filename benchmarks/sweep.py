"""Parameter-sweep harness — the analog of the reference's
``scripts/buffer_test.sh`` (NBUFFER sweep with recorded wall times,
``buffer_test.log``).  Our equivalent tunable is ``beta_batch``: how
many folded sub-spectra one device program scans before the host
accumulates (bounded by execution watchdogs and accumulator memory).

Sweeps beta_batch over the fused-fold momentum sweep and records wall
seconds per configuration to ``benchmarks/sweep_beta_batch.json``.

Run: ``python benchmarks/sweep.py [n_grid] [m] [n_lattice]``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_lattice = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    from vpower_tpu import fused_fold_full_spectrum, synthetic_particles

    particles = synthetic_particles(
        jax.random.PRNGKey(0), n_lattice, box_size=1.0, jitter=0.4
    )
    float(jnp.sum(particles.pos[:, 0]))

    results = []
    reference = None
    for beta_batch in (1, 2, 4, 8):
        if beta_batch > m**3:
            continue
        # warm-up compiles this batch shape
        fused_fold_full_spectrum(particles, n_grid, m=m,
                                 beta_batch=beta_batch)
        t0 = time.time()
        s = fused_fold_full_spectrum(particles, n_grid, m=m,
                                     beta_batch=beta_batch)
        wall = time.time() - t0
        if reference is None:
            reference = s
        else:  # every batching must give identical spectra
            np.testing.assert_allclose(s.Psum, reference.Psum, rtol=1e-5)
        row = {"beta_batch": beta_batch, "wall_s": round(wall, 3),
               "s_per_beta": round(wall / m**3, 4)}
        print(json.dumps(row), flush=True)
        results.append(row)

    record = {"n_grid": n_grid, "m": m, "n_particles": int(len(particles)),
              "platform": jax.default_backend(), "sweep": results}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "sweep_beta_batch.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)


if __name__ == "__main__":
    main()
