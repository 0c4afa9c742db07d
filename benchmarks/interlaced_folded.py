"""Recorded interlaced + window-compensated FOLDED spectrum — the
"folded/interlaced" BASELINE.md scale-ceiling phrase, backed by an
artifact (VERDICT r3 item 8).

1024-range: fused-fold CIC momentum at n_grid=512, m=2, all 8 betas,
with interlacing (second half-cell-shifted deposit combined on the
global mode lattice K = m t + beta) and 1/W(K)^2 compensation.
Validation mirror: the unfolded interlaced 512^3 spectrum must agree
on the overlap band (tests/test_extras.py proves ~1e-7 at equal total
resolution; here resolutions differ so the band match is physical, not
bitwise).

Writes ``benchmarks/interlaced_folded_1024.json``.
Run on the chip: ``python benchmarks/interlaced_folded.py``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vpower_jax"),
    )
    import jax.numpy as jnp

    from vpower_tpu import power_spectrum, relative_diff
    from vpower_tpu.io.synthetic import (
        gaussian_random_field, grid_positions, particles_from_field,
    )
    from vpower_tpu.run.pipeline import fused_fold_full_spectrum
    from vpower_tpu.spectrum.spectrum import PowerSpectrum

    key = jax.random.PRNGKey(42)
    kf, kp = jax.random.split(key)
    field = gaussian_random_field(kf, 256, 1.0)
    pos = grid_positions(216, 1.0, key=kp, jitter=3.0)
    particles = particles_from_field(field, 1.0, pos)
    float(jnp.sum(particles.pos[:, 0]))

    n_grid, m = 512, 2
    fused_fold_full_spectrum(particles, n_grid, m, method="cic",
                             interlace=True, compensate=True)  # compile
    t0 = time.time()
    folded = fused_fold_full_spectrum(particles, n_grid, m, method="cic",
                                      interlace=True, compensate=True)
    wall = time.time() - t0

    t1 = time.time()
    unfolded = power_spectrum(particles, n_grid, method="cic",
                              quantity="momentum", interlace=True,
                              compensate=True)
    unfolded_s = time.time() - t1

    n = min(len(unfolded), len(folded))
    lo, hi = 8, max(n // 2, 10)
    band_u = PowerSpectrum(unfolded.k[lo:hi], unfolded.P[lo:hi],
                           unfolded.Psum[lo:hi], unfolded.Nsample[lo:hi])
    band_f = PowerSpectrum(folded.k[lo:hi], folded.P[lo:hi],
                           folded.Psum[lo:hi], folded.Nsample[lo:hi])

    result = {
        "metric": "1024-range interlaced+compensated folded momentum "
                  "P(k) (CIC, m=2, all 8 betas), 10M particles, 1 chip",
        "n_grid": n_grid,
        "fold_m": m,
        "interlace": True,
        "compensate": True,
        "wall_s": round(wall, 2),
        "unfolded_interlaced_s": round(unfolded_s, 2),
        "modes_binned": float(folded.Nsample.sum()),
        "overlap_relative_diff": {
            "band_bins": [lo, hi],
            "max": relative_diff(band_u, band_f, "max"),
            "mean": relative_diff(band_u, band_f, "mean"),
        },
    }
    print(json.dumps(result), flush=True)
    with open(os.path.join(HERE, "interlaced_folded_1024.json"), "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
