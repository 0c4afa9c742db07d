"""Per-stage time + device-memory profile — the analog of the
reference's ``scripts/fftw_mem_profile.py`` / ``bcmk.txt`` record
(memory_profiler over preplanned-FFTW vs numpy-interface FFTs).

Runs the single-chip pipeline stage by stage (deposit -> FFT power ->
binning) at a configurable grid, printing per-stage wall seconds and,
where the platform reports ``memory_stats`` (not the axon tunnel),
peak/current device bytes.  Also cross-checks the two FFT-power
entry points (real vs complex-input path) like the reference asserted
``np.allclose`` between its two FFT implementations
(``fftw_mem_profile.py:130``).

Run: ``python benchmarks/memory_profile.py [n_grid] [n_lattice]``.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def mem_snapshot():
    stats = jax.devices()[0].memory_stats()
    if not stats:
        return None
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
    }


def main():
    n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_lattice = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from vpower_tpu import deposit, synthetic_particles
    from vpower_tpu.spectrum import power as _power

    # jit the stage entry points (box static: bin lattice derives from
    # it at trace time); the library leaves jitting to callers
    shell_bin = jax.jit(lambda p: _power.shell_bin(p, 1.0))
    vector_power = jax.jit(lambda v: _power.vector_power(v, 1.0))
    vector_power_from_complex = jax.jit(
        lambda v: _power.vector_power_from_complex(v, 1.0))
    from vpower_tpu.utils.profiling import StageTimer

    particles = synthetic_particles(
        jax.random.PRNGKey(0), n_lattice, box_size=1.0, jitter=0.4
    )
    float(jnp.sum(particles.pos[:, 0]))

    timer = StageTimer()
    warm = StageTimer()
    stages = {}

    # First pass under `warm` includes compile (the reference excluded
    # FFTW planning via its plan cache, interp.py:41); the `timer` pass
    # is steady-state.
    with warm("deposit_cic") as t:
        field = deposit(particles, n_grid, method="cic")
        t.observe(field.mass)
    with timer("deposit_cic") as t:
        field = deposit(particles, n_grid, method="cic")
        t.observe(field.mass)
    stages["deposit_cic"] = mem_snapshot()

    with warm("fft_power") as t:
        p_grid = vector_power(field.velocity)
        t.observe(p_grid)
    with timer("fft_power") as t:
        p_grid = vector_power(field.velocity)
        t.observe(p_grid)
    stages["fft_power"] = mem_snapshot()

    with warm("shell_bin") as t:
        k, psum, nsamp = shell_bin(p_grid)
        t.observe(psum)
    with timer("shell_bin") as t:
        k, psum, nsamp = shell_bin(p_grid)
        t.observe(psum)
    stages["shell_bin"] = mem_snapshot()

    # Real-input vs complex-input FFT power paths agree (the reference's
    # preplanned-vs-numpy-interface allclose check).
    with timer("fft_power_complex") as t:
        p2 = vector_power_from_complex(
            field.velocity.astype(jnp.complex64)
        )
        t.observe(p2)
    agree = bool(
        np.allclose(np.asarray(p_grid), np.asarray(p2), rtol=1e-4, atol=1e-10)
    )

    print(timer.report())
    record = {
        "n_grid": n_grid,
        "n_particles": int(len(particles)),
        "stage_seconds": {k: round(timer.total(k), 3) for k in timer.spans},
        "first_call_seconds_incl_compile":
            {k: round(warm.total(k), 3) for k in warm.spans},
        "stage_memory": stages,
        "fft_paths_allclose": agree,
        "platform": jax.default_backend(),
    }
    print(json.dumps(record), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"memory_profile_{n_grid}.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)


if __name__ == "__main__":
    main()
