"""Recorded interlaced + window-compensated FOLDED spectrum — the
"folded/interlaced" BASELINE.md scale-ceiling phrase, backed by an
artifact (VERDICT r3 item 8).

1024-range: fused-fold CIC momentum at n_grid=256, m=4, all 64 betas,
with interlacing (second half-cell-shifted deposit combined on the
global mode lattice K = m t + beta) and 1/W(K)^2 compensation.
(n_grid=512/m=2 holds two 3-channel complex 512^3 grids + FFT temps +
two 80M-row phased target tables per beta — 18.2 GB compiled peak,
past the 15.75 GB chip; m=4 x 256^3 spans the same 1024 range in
1/8 the memory.)
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

    n_grid, m = 256, 4
    fused_fold_full_spectrum(particles, n_grid, m, method="cic",
                             interlace=True, compensate=True)  # compile
    t0 = time.time()
    folded = fused_fold_full_spectrum(particles, n_grid, m, method="cic",
                                      interlace=True, compensate=True)
    wall = time.time() - t0

    t1 = time.time()
    unfolded = power_spectrum(particles, 512, method="cic",
                              quantity="momentum", interlace=True,
                              compensate=True)
    unfolded_s = time.time() - t1

    # momentum here is per-cell (mass-weighted velocity; reference
    # ``interp.py:521-541`` convention), an EXTENSIVE quantity — its
    # P(k) scales as V_cell^2.  The two runs deposit at different cell
    # sizes (1/1024 vs 1/512), so normalize both to momentum DENSITY
    # (divide the field by V_cell -> P by V_cell^2) before comparing.
    def _density_norm(s, n_cells_axis):
        v2 = (1.0 / n_cells_axis) ** 6  # (V_cell)^2 at box = 1
        return PowerSpectrum(s.k, s.P / v2, s.Psum / v2, s.Nsample)

    unfolded_d = _density_norm(unfolded, 512)
    folded_d = _density_norm(folded, n_grid * m)
    n = min(len(unfolded_d), len(folded_d))
    lo, hi = 8, max(n // 2, 10)
    band_u = PowerSpectrum(
        unfolded_d.k[lo:hi], unfolded_d.P[lo:hi],
        unfolded_d.Psum[lo:hi], unfolded_d.Nsample[lo:hi])
    band_f = PowerSpectrum(
        folded_d.k[lo:hi], folded_d.P[lo:hi],
        folded_d.Psum[lo:hi], folded_d.Nsample[lo:hi])

    result = {
        "metric": f"1024-range interlaced+compensated folded momentum "
                  f"P(k) (CIC, m={m}, all {m**3} betas), 10M "
                  f"particles, 1 chip",
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
