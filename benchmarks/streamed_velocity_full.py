"""FULL 2048-range folded velocity spectrum — every beta of the m^3
lattice — the BASELINE.md scale ceiling and the reference's canonical
complete run (``scripts/parallel_optimized.py:323, 470-487`` loops all
n^3 offsets to completion).

Two structural optimizations over the naive 512-beta loop:

1. **Conjugate-pair halving** (exact): the full-resolution field is
   real, so P(-K) = P(K) and the beta and (-beta mod m) sub-spectra bin
   identical values (``tests/test_fold.py``); only the 260 half-space
   representatives are computed and combined with multiplicity weights
   — bit-identical to the full sweep's combine.
2. **Large beta batches, no value cache**: the measured axon tunnel
   moves ~0.02 GB/s host<->device, so the disk/host block-value cache
   (great on PCIe-attached hardware) would cost ~45 min per cached
   batch in transfers alone here.  Instead the accumulators for 16
   betas (6.4 GB of the 16 GB HBM) ride one pass, and blocks are
   recomputed per pass by the chunked device-side scan.

Also records a coarse unfolded low-k pass, the folded-vs-unfolded
overlap agreement (``relative_diff``), and the spliced full-range
``Pk_full_2048.txt`` (``PowerSpectrum.append``).

Crash-resume: every sub-spectrum is checkpointed to
``benchmarks/full_sweep_ckpt/`` as it completes; a rerun skips
finished betas.

Run: ``python benchmarks/streamed_velocity_full.py [NTOT] [BETA_BATCH]``.
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
    ntot = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    beta_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vpower_jax"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from vpower_tpu import power_spectrum, relative_diff
    from vpower_tpu.io.synthetic import (
        gaussian_random_field, grid_positions, particles_from_field,
    )
    from vpower_tpu.run.streamed import streamed_folded_sweep
    from vpower_tpu.spectrum.spectrum import (
        PowerSpectrum, SpectrumList, beta_half_space,
    )

    # Same 10M-particle workload as bench.py / streamed_velocity.py.
    key = jax.random.PRNGKey(42)
    kf, kp = jax.random.split(key)
    field = gaussian_random_field(kf, 256, 1.0)
    pos = grid_positions(216, 1.0, key=kp, jitter=3.0)
    particles = particles_from_field(field, 1.0, pos)
    float(jnp.sum(particles.pos[:, 0]))  # materialize inputs

    n_grid = 256
    m = ntot // n_grid
    betas_all, weights_all = beta_half_space(m)

    ckpt = os.path.join(HERE, f"full_sweep_ckpt_{ntot}")
    os.makedirs(ckpt, exist_ok=True)
    done = {
        tuple(int(x) for x in f[len("sub_spctrm_b"):-4].split("_"))
        for f in os.listdir(ckpt)
        if f.startswith("sub_spctrm_b") and f.endswith(".npz")
    }
    todo = np.array([b for b in betas_all if tuple(b) not in done],
                    np.int32)
    print(f"[full sweep] {len(betas_all)} half-space betas "
          f"(= {int(weights_all.sum())} effective), {len(done)} done, "
          f"{len(todo)} to compute, beta_batch={beta_batch}", flush=True)

    t0 = time.time()
    batch_walls = []
    t_last = [t0]

    def progress(bi, n_batches, q, n_blocks):
        if (q + 1) % 128 == 0:
            el = time.time() - t0
            print(f"[{el:8.1f}s] batch {bi + 1}/{n_batches} "
                  f"block {q + 1}/{n_blocks}", flush=True)

    def on_spectrum(s):
        s.save(ckpt)
        now = time.time()
        batch_walls.append(round(now - t_last[0], 2))
        t_last[0] = now

    stages = {}
    if len(todo):
        streamed_folded_sweep(
            particles, n_grid, m, quantity="velocity", method="nn",
            beta_sequence=todo, beta_batch=beta_batch,
            cache=False, progress=progress, on_spectrum=on_spectrum,
            stage_times=stages,
        )
    wall = time.time() - t0

    # reload the complete set (this run + any prior resumed runs)
    sweep = SpectrumList.load(ckpt)
    by_beta = {s.beta: s for s in sweep}
    ordered = SpectrumList([by_beta[tuple(int(x) for x in b)]
                            for b in betas_all])
    combined = ordered.combine_weighted(weights_all)
    combined.m = m

    # coarse unfolded low-k pass (reference: the unfolded spectrum the
    # folded one is spliced onto) + overlap agreement
    t1 = time.time()
    coarse = power_spectrum(particles, n_grid, method="nn",
                            quantity="velocity")
    coarse_s = time.time() - t1
    n = min(len(coarse), len(combined))
    lo, hi = 8, max(n // 2, 10)  # well-sampled overlap band
    band_c = PowerSpectrum(
        coarse.k[lo:hi], coarse.P[lo:hi], coarse.Psum[lo:hi],
        coarse.Nsample[lo:hi],
    )
    band_f = PowerSpectrum(
        combined.k[lo:hi], combined.P[lo:hi], combined.Psum[lo:hi],
        combined.Nsample[lo:hi],
    )
    overlap = {
        "band_bins": [lo, hi],
        "max": relative_diff(band_c, band_f, "max"),
        "mean": relative_diff(band_c, band_f, "mean"),
    }

    full = coarse.append(combined)
    full.save_txt(os.path.join(HERE, f"Pk_full_{ntot}.txt"))

    certificate = {
        k: stages.pop(k)
        for k in ("suspect_cells", "escalated_blocks", "uncertified_cells")
        if k in stages
    }
    result = {
        "metric": f"FULL {ntot}-range folded velocity P(k) "
                  f"(all {m}^3 = {m**3} betas via {len(betas_all)} "
                  f"conjugate representatives), 10M particles, 1 chip",
        "ntot": ntot,
        "n_grid": n_grid,
        "fold_m": m,
        "n_betas_total": int(m**3),
        "n_betas_computed": int(len(betas_all)),
        "n_betas_this_run": int(len(todo)),
        "beta_batch": beta_batch,
        "wall_s": round(wall, 2),
        "s_per_effective_beta": round(wall / max(int(weights_all.sum()), 1), 3),
        "coarse_unfolded_s": round(coarse_s, 2),
        "modes_binned_weighted": float(combined.Nsample.sum()),
        "n_blocks": m**3,
        "block_passes": int(np.ceil(len(todo) / beta_batch)),
        "stages": stages,
        "certificate": certificate,
        "batch_walls_s": batch_walls[:: max(beta_batch, 1)],
        "overlap_relative_diff": overlap,
        "note": "no block-value cache: measured axon host<->device "
                "tunnel ~0.02 GB/s makes cached batches transfer-bound; "
                "conjugate-pair halving + 16-beta batches instead",
    }
    print(json.dumps(result), flush=True)
    with open(os.path.join(HERE, f"streamed_velocity_{ntot}_full.json"),
              "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
