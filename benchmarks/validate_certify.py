"""Hardware validation of the streamed-NN margin certificate.

Runs the certified sweep (density-aware small margin + escalation)
against a worst-case-margin exact run on the SAME particles and asserts
the folded spectra agree — on a uniform box (no escalations expected)
and on a box with a planted void (escalations must fire and still end
certified).  Also times both, so the certificate's speedup over the
worst-case margin is recorded next to its correctness.

Run on a real chip: ``python benchmarks/validate_certify.py [NTOT]``.
Writes ``benchmarks/validate_certify_<ntot>.json``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _run(particles, n_grid, m, betas, **kw):
    from vpower_tpu.run.streamed import streamed_folded_sweep

    stages = {}
    t0 = time.time()
    sweep = streamed_folded_sweep(
        particles, n_grid, m, quantity="velocity", method="nn",
        beta_sequence=betas, beta_batch=len(betas), cache=False,
        stage_times=stages, **kw,
    )
    wall = time.time() - t0
    return sweep, wall, stages


def main():
    ntot = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_grid = 256
    m = ntot // n_grid

    from vpower_tpu.io.synthetic import (
        gaussian_random_field, grid_positions, particles_from_field,
    )
    from vpower_tpu.spectrum.spectrum import random_beta_sequence

    key = jax.random.PRNGKey(42)
    kf, kp = jax.random.split(key)
    field = gaussian_random_field(kf, 128, 1.0)
    pos = grid_positions(160, 1.0, key=kp, jitter=3.0)  # ~4.1M
    uniform = particles_from_field(field, 1.0, pos)

    # planted void: drop every particle in a corner cube 1.5 blocks wide
    hi = 1.5 / m
    pn = np.asarray(uniform.pos)
    keep = ~np.all(pn < hi, axis=1)
    voided = uniform[jnp.asarray(np.nonzero(keep)[0])]

    betas = random_beta_sequence(m, seed=1)[:4]
    margin_max = (ntot - n_grid) // 2
    report = {"ntot": ntot, "n_grid": n_grid, "fold_m": m,
              "n_particles": int(pn.shape[0]),
              "n_particles_voided": int(keep.sum()), "cases": {}}

    for name, p in (("uniform", uniform), ("voided", voided)):
        certified, t_cert, stages = _run(p, n_grid, m, betas, exact=True)
        worst, t_worst, _ = _run(
            p, n_grid, m, betas, exact=True,
            margin_cells=min(margin_max, n_grid), certify=False,
        )
        max_rel = 0.0
        for sc, sw in zip(certified, worst):
            denom = np.where(np.abs(sw.Psum) > 0, np.abs(sw.Psum), 1.0)
            max_rel = max(max_rel,
                          float(np.max(np.abs(sc.Psum - sw.Psum) / denom)))
            assert (sc.Nsample == sw.Nsample).all()
        case = {
            "certified_s": round(t_cert, 2),
            "worst_margin_s": round(t_worst, 2),
            "speedup": round(t_worst / t_cert, 2),
            "max_rel_diff_vs_worst_margin": max_rel,
            "suspect_cells": stages.get("suspect_cells"),
            "escalated_blocks": stages.get("escalated_blocks"),
            "uncertified_cells": stages.get("uncertified_cells"),
        }
        print(name, json.dumps(case), flush=True)
        if name == "uniform":
            assert case["escalated_blocks"] == 0, case
        else:
            assert case["escalated_blocks"] > 0, case
        assert case["uncertified_cells"] == 0, case
        assert max_rel < 1e-4, max_rel
        report["cases"][name] = case

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"validate_certify_{ntot}.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"ok": True, "out": out}))


if __name__ == "__main__":
    main()
