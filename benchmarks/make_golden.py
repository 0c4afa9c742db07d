"""f64 golden spectra for the bench workload (VERDICT r4 items 5-6).

Produces ``benchmarks/golden_bench.npz``: float64, CPU, fully
independent implementations — scipy cKDTree for exact periodic NN
(the role ANN/pyann played for the reference, ``interp.py:1027-1034``),
``np.add.at`` for NGP (reference ``deposit_to_grid``,
``interp.py:996-1015``), numpy pocketfft + histogram binning for the
spectrum (reference ``interp.py:1372-1481``).  Nothing here shares code
with the JAX path, so agreement certifies the whole TPU chain — the
1e-6 north star (BASELINE.md) at production sizes, not just the 32-128
grids of tests/test_accuracy.py.

The particle workload is bench.py's: velocities sampled from a 256^3
Gaussian random field (computed by JAX on CPU — the field generator is
the one platform-dependent stage, its FFT differing from TPU at the
~1e-7 level, which bounds how tightly any cross-platform gate can sit).

Run:  JAX_PLATFORMS=cpu python benchmarks/make_golden.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOX = 1.0
GRIDS = (256, 512)
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "golden_bench.npz")


def np_vector_power(v64, box_size):
    """f64 mirror of spectrum.power.vector_power (interp.py:1372-1387)."""
    n = v64.shape[-1]
    a = (box_size / (2 * np.pi)) ** 1.5 / float(n) ** 3
    p = np.zeros((n, n, n))
    for c in range(v64.shape[0]):
        fk = np.fft.fftn(v64[c]) * a
        p += 0.5 * np.abs(fk) ** 2
    return p


def np_shell_bin(power, box_size):
    """f64 mirror of spectrum.power.shell_bin (interp.py:1440-1481)."""
    n = power.shape[0]
    cell = box_size / n
    kmin = 2 * np.pi / box_size
    kmax = np.pi / cell
    spacing = kmin
    n_bins = int((kmax - kmin) / spacing) + 1
    centers = kmin + spacing * np.arange(n_bins)
    edges = np.concatenate([centers - spacing / 2,
                            [centers[-1] + spacing / 2]])
    ks = 2 * np.pi * np.fft.fftfreq(n, cell)
    kk = np.sqrt(
        (ks**2)[:, None, None] + (ks**2)[None, :, None]
        + (ks**2)[None, None, :]
    ).ravel()
    psum, _ = np.histogram(kk, bins=edges, weights=power.ravel())
    nsamp, _ = np.histogram(kk, bins=edges)
    return centers, psum, nsamp


def main():
    import bench  # the workload definition lives there

    t0 = time.time()
    particles = bench.make_workload()
    pos = np.asarray(particles.pos, np.float64) % BOX
    vel = np.asarray(particles.vel, np.float64)
    print(f"workload: {pos.shape[0]} particles  [{time.time()-t0:.1f}s]",
          flush=True)

    tree = cKDTree(pos, boxsize=BOX)
    out = {"box_size": BOX, "n_particles": pos.shape[0]}
    for n_grid in GRIDS:
        cell = BOX / n_grid
        t0 = time.time()
        axis = (np.arange(n_grid, dtype=np.float64) + 0.5) * cell
        cx, cy, cz = np.meshgrid(axis, axis, axis, indexing="ij")
        queries = np.stack([cx.ravel(), cy.ravel(), cz.ravel()], axis=1)
        del cx, cy, cz
        _, idx = tree.query(queries, k=1, workers=-1)
        del queries
        v_grid = vel[idx].T.reshape(3, n_grid, n_grid, n_grid)
        del idx
        print(f"{n_grid}^3 kd-tree NN done [{time.time()-t0:.1f}s]",
              flush=True)

        t0 = time.time()
        k, psum, nsamp = np_shell_bin(np_vector_power(v_grid, BOX), BOX)
        del v_grid
        out[f"k_{n_grid}"] = k
        out[f"nn_psum_{n_grid}"] = psum
        out[f"nn_nsample_{n_grid}"] = nsamp
        print(f"{n_grid}^3 NN spectrum done [{time.time()-t0:.1f}s]",
              flush=True)

        # NGP: mass-weighted mean velocity per cell (uniform masses here),
        # empty cells zero — mirrors run.pipeline._deposit_scatter.
        t0 = time.time()
        ijk = (np.floor(pos / cell).astype(np.int64)) % n_grid
        flat = (ijk[:, 0] * n_grid + ijk[:, 1]) * n_grid + ijk[:, 2]
        del ijk
        m = np.asarray(particles.mass, np.float64)
        msum = np.zeros(n_grid**3)
        np.add.at(msum, flat, m)
        v_grid = np.zeros((3, n_grid, n_grid, n_grid))
        safe = np.where(msum > 0, msum, 1.0)
        for c in range(3):
            s = np.zeros(n_grid**3)
            np.add.at(s, flat, m * vel[:, c])
            v_grid[c] = (s / safe).reshape(n_grid, n_grid, n_grid)
        del flat, msum, safe
        k, psum, nsamp = np_shell_bin(np_vector_power(v_grid, BOX), BOX)
        del v_grid
        out[f"ngp_psum_{n_grid}"] = psum
        out[f"ngp_nsample_{n_grid}"] = nsamp
        print(f"{n_grid}^3 NGP spectrum done [{time.time()-t0:.1f}s]",
              flush=True)

    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
