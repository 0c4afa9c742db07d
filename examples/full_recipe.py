"""End-to-end worked example: the reference's full production recipe.

Reproduces, on a synthetic snapshot, the complete workflow the
reference ran on its cluster (SURVEY.md §3.3; reference
``scripts/parallel_optimized.py`` + ``vpower/spctrm.py:142-166``):

1. load a snapshot (here: generated and saved, then loaded back),
2. exact-NN deposit the velocity field at the base resolution and
   measure the UNFOLDED spectrum (guaranteed low-k coverage),
3. run the folded streamed sweep for the high-k band at ``m x`` the
   dynamic range (memory stays O(n_grid^3)),
4. splice low-k and folded high-k with ``PowerSpectrum.append``,
5. save ``Pk.txt`` + a plot.

Run:  python examples/full_recipe.py [out_dir]
Sizes are laptop/CI-friendly; scale ``N_GRID``/``FOLD_M``/particle
count up on real hardware (see benchmarks/ for measured large runs).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

N_GRID = 32          # base grid (per-beta folded grid size)
FOLD_M = 2           # dynamic range = FOLD_M * N_GRID
N_LATTICE = 24       # particles = N_LATTICE^3


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "example_out"
    os.makedirs(out, exist_ok=True)

    from vpower_tpu import (
        load_snapshot, save_snapshot, spectrum_from_field,
        streamed_folded_sweep, synthetic_particles,
    )
    from vpower_tpu.deposit.nn import nn_interp_to_field

    # -- 1. snapshot ----------------------------------------------------
    snap = os.path.join(out, "snapshot.hdf5")
    save_snapshot(snap, synthetic_particles(
        jax.random.PRNGKey(42), N_LATTICE, box_size=1.0, jitter=0.4,
    ))
    particles = load_snapshot(snap, box_size=1.0)
    print(f"snapshot: {len(particles)} particles")

    # -- 2. unfolded low-k spectrum --------------------------------------
    field = nn_interp_to_field(particles, N_GRID)
    low_k = spectrum_from_field(field, quantity="velocity")
    print(f"unfolded: {len(low_k)} k-bins up to {low_k.k[-1]:.1f}")

    # -- 3. folded high-k via the streamed sweep -------------------------
    stages = {}
    sweep = streamed_folded_sweep(
        particles, N_GRID, FOLD_M, quantity="velocity", method="nn",
        beta_batch=8, stage_times=stages,
    )
    high_k = sweep.combine_all()
    high_k.m = FOLD_M
    print(f"folded m={FOLD_M}: {len(sweep)} sub-spectra; "
          f"certificate: {stages.get('suspect_cells', 0)} suspect cells, "
          f"{stages.get('escalated_blocks', 0)} blocks escalated")

    # -- 4. splice --------------------------------------------------------
    full = low_k.append(high_k)
    print(f"spliced: {len(full)} k-bins up to {full.k[-1]:.1f} "
          f"({FOLD_M}x the unfolded reach)")

    # -- 5. save + plot ---------------------------------------------------
    full.save_txt(os.path.join(out, "Pk.txt"))
    try:
        import matplotlib

        matplotlib.use("Agg")
        full.plot()
        import matplotlib.pyplot as plt

        plt.savefig(os.path.join(out, "Pk.png"), dpi=120)
        print(f"wrote {out}/Pk.txt and {out}/Pk.png")
    except Exception as e:  # plotting is optional sugar
        print(f"wrote {out}/Pk.txt (plot skipped: {e})")


if __name__ == "__main__":
    main()
