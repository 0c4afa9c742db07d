"""Reference-workload ingestion proof (VERDICT r4 "missing" item 3).

The reference's recorded runs consume a real GMC snapshot
(``snapshot_550.hdf5``, 9.6M gas particles — ``scripts/buffer_test.log:11``)
through ``parallel_optimized.py``.  Everything recorded here so far used
synthetic jittered-lattice particles, which are spatially benign.  This
script closes the "would it run their data" gap:

1. writes a 9.6M-particle snapshot in the reference's exact PartType0
   layout (Coordinates/Masses/Densities via ``Density``/Velocities),
   SPLIT across 4 part files (Gadget-4/Arepo ``snap_550.N.hdf5``
   convention) — and makes it *adversarially GMC-like* rather than
   uniform: ~70% of particles in ~300 dense clumps (lognormal sizes,
   down to ~2 grid cells), 30% diffuse background, lognormal masses,
   a turbulent large-scale velocity field plus a bulk drift (so
   ``remove_bulk_velocity`` actually has work to do);
2. drives the REAL CLI end-to-end on the chip:
   ``python -m vpower_tpu.run.cli -i 'snap_550.*.hdf5' -o out -N 512
   -M 256 --method nn --quantity velocity -f`` (planner -> streamed
   folded NN velocity spectrum, all betas — the reference's exact
   canonical configuration, ``scripts/parallel_optimized.py:348-356``);
3. records wall times + output checks to
   ``benchmarks/reference_workload_run.json``.

Run on the chip:  python benchmarks/reference_workload.py
"""
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
WORKDIR = "/tmp/vpower_ref_workload"
N_PART = 9_600_000
N_CLUMPS = 300
CLUMP_FRAC = 0.7
BOX = 1.0


def make_snapshot_parts(rng: np.random.Generator, n_files: int = 4):
    """Clustered GMC-like particle set, written as reference-layout
    HDF5 parts.  Returns the part paths."""
    import h5py

    n_clumped = int(N_PART * CLUMP_FRAC)
    n_bg = N_PART - n_clumped

    # clump centers uniform; sizes lognormal (median ~1% of the box,
    # down to ~2 cells of a 512 grid); population ~ size^-1 so small
    # clumps are dense — the NN descent's worst case
    centers = rng.uniform(0, BOX, (N_CLUMPS, 3))
    sigma = np.exp(rng.normal(np.log(0.01), 0.7, N_CLUMPS))
    sigma = np.clip(sigma, 2.0 / 512, 0.08)
    weights = 1.0 / sigma
    weights /= weights.sum()
    counts = rng.multinomial(n_clumped, weights)

    pos = np.empty((N_PART, 3), np.float32)
    off = 0
    for c in range(N_CLUMPS):
        k = counts[c]
        pos[off:off + k] = (
            centers[c] + rng.normal(0, sigma[c], (k, 3))
        ) % BOX
        off += k
    pos[off:] = rng.uniform(0, BOX, (n_bg, 3))

    # turbulent-ish velocity: superpose a handful of large-scale modes
    # (deterministic function of position — cheap, smooth, non-trivial
    # spectrum), plus per-particle dispersion and a bulk drift
    vel = np.zeros((N_PART, 3), np.float32)
    for _ in range(24):
        kvec = rng.integers(1, 6, 3) * (2 * np.pi / BOX)
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.normal(0, 1.0, 3) / np.linalg.norm(kvec)
        vel += np.float32(np.sin(pos @ kvec + phase))[:, None] * \
            amp[None, :].astype(np.float32)
    vel += rng.normal(0, 0.05, (N_PART, 3)).astype(np.float32)
    vel += np.float32([3.0, -1.0, 0.5])  # bulk drift to be removed

    mass = np.exp(rng.normal(0.0, 0.3, N_PART)).astype(np.float32)
    # density proxy: clump particles ~ 1/sigma^3, background ~ 1
    dens = np.ones(N_PART, np.float32)
    off = 0
    for c in range(N_CLUMPS):
        k = counts[c]
        dens[off:off + k] = np.float32(1.0 / sigma[c] ** 3)
        off += k

    order = rng.permutation(N_PART)  # parts must not be spatially sorted
    paths = []
    bounds = np.linspace(0, N_PART, n_files + 1).astype(int)
    for i in range(n_files):
        sel = order[bounds[i]:bounds[i + 1]]
        path = os.path.join(WORKDIR, f"snap_550.{i}.hdf5")
        with h5py.File(path, "w") as f:
            g = f.create_group("PartType0")
            g.create_dataset("Coordinates", data=pos[sel])
            g.create_dataset("Masses", data=mass[sel])
            g.create_dataset("Density", data=dens[sel])
            g.create_dataset("Velocities", data=vel[sel])
        paths.append(path)
    return paths


def main():
    shutil.rmtree(WORKDIR, ignore_errors=True)
    os.makedirs(WORKDIR)
    t0 = time.time()
    rng = np.random.default_rng(550)
    paths = make_snapshot_parts(rng)
    gen_s = time.time() - t0
    size_mb = sum(os.path.getsize(p) for p in paths) / 1e6
    print(f"wrote {len(paths)} parts, {size_mb:.0f} MB [{gen_s:.1f}s]",
          flush=True)

    out_dir = os.path.join(WORKDIR, "out")
    os.makedirs(out_dir, exist_ok=True)
    cmd = [
        sys.executable, "-m", "vpower_tpu.run.cli",
        "-i", os.path.join(WORKDIR, "snap_550.*.hdf5"),
        "-o", out_dir, "-N", "512", "-M", "256",
        "--method", "nn", "--quantity", "velocity", "-f",
        "--compile-cache", os.path.expanduser("~/.cache/vpower_jax"),
    ]
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=3600,
        env={**os.environ, "PYTHONPATH": REPO + os.pathsep +
             os.environ.get("PYTHONPATH", "")},
    )
    cli_s = time.time() - t0
    sys.stdout.write(proc.stdout[-3000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:])
        raise SystemExit(f"CLI failed rc={proc.returncode}")

    pk = np.loadtxt(os.path.join(out_dir, "Pk.txt"))
    assert np.isfinite(pk).all() and pk.shape[0] > 50, pk.shape
    assert (pk[:, 1] > 0).any()

    record = {
        "snapshot": "synthetic GMC-like, reference PartType0 layout, "
                    "4 split parts (snap_550.*.hdf5)",
        "n_particles": N_PART,
        "snapshot_mb": round(size_mb, 1),
        "clumps": N_CLUMPS,
        "cli": " ".join(cmd[2:]),
        "generate_s": round(gen_s, 1),
        "cli_wall_s": round(cli_s, 1),
        "pk_rows": int(pk.shape[0]),
        "pk_finite": True,
    }
    with open(os.path.join(HERE, "reference_workload_run.json"), "w") as fh:
        json.dump(record, fh, indent=1)
        fh.write("\n")
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
