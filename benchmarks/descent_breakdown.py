"""Per-stage HBM breakdown of the 512^3 value-carry NN descent.

The descent is >85% of the headline at ~17% of HBM bandwidth
(``profile_stages.json``); this script decomposes it so the bytes can
be attacked where they actually are.  Mirrors ``nn_gather_grid``'s
velocity-only flow stage by stage, jitting each in isolation to read
XLA's ``cost_analysis`` bytes-accessed plus steady-state wall time:

1. seed deposit (one Morton sort + MXU deposit, 512^3 rank-1)
2. pool pyramid 512 -> 8 (``_pool_seeds_vals`` per level)
3. coarsest dense solve (8^3)
4. seeded sweep levels 16..256 (upsample + Pallas sweeps)
5. finest level: upsample, premerge, fused payload sweep

Writes ``benchmarks/descent_breakdown.json``.  Run on the chip:
``python benchmarks/descent_breakdown.py``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.sum(leaf))


def measure(name, fn, *args, repeats=2):
    jfn = jax.jit(fn)
    out = jfn(*args)
    _sync(out)
    try:
        ca = jfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        nbytes = float(ca.get("bytes accessed", float("nan")))
    except Exception:  # noqa: BLE001
        nbytes = float("nan")
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jfn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    rec = {
        "s": round(dt, 4),
        "gb": round(nbytes / 1e9, 2) if np.isfinite(nbytes) else None,
        "gb_per_s": round(nbytes / dt / 1e9, 1) if np.isfinite(nbytes) else None,
    }
    print(f"{name:32s} {rec}", flush=True)
    return rec, out


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/vpower_jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import bench
    from vpower_tpu.deposit import nn as nnmod
    from vpower_tpu.deposit.nn import (
        _coarsest_exact_vals, _make_dist2, _parent_dist2, _pallas_zc,
        _pool_seeds_vals, _premerge_upsampled, _seed_grids_vals,
        _upsample_vals_mxu,
    )
    from vpower_tpu.deposit.nn_pallas import (
        fit_iters, halo_z, sweep_tiles_vals, wrap_pad,
    )

    particles = bench.make_workload()
    pos = particles.pos % 1.0
    vals = particles.vel.astype(jnp.float32)
    _sync(pos)

    n_grid, box, periodic, n_seeds, rounds = 512, 1.0, True, 2, 1
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    results = {}

    # 1. finest seed deposit (rank-1, premerge mode)
    results["seed_deposit_512_k1"], seed_ch = measure(
        "seed_deposit_512_k1",
        lambda p, v: _seed_grids_vals(p, v, n_grid, box, 1),
        pos, vals,
    )

    # 2. pool pyramid
    levels = [n_grid]
    while levels[-1] > 8 and levels[-1] % 2 == 0:
        levels.append(levels[-1] // 2)
    seeds = {n_grid: seed_ch}
    for n in levels[1:]:
        def pool(sc, n=n):
            pd2 = _parent_dist2(n * 2, box, periodic, jnp.float32)
            return _pool_seeds_vals(sc, pd2, n_seeds, big)
        results[f"pool_{n * 2}_to_{n}"], seeds[n] = measure(
            f"pool_{n * 2}_to_{n}", pool, seeds[n * 2]
        )

    # 3. coarsest solve
    def coarsest(sc):
        return _coarsest_exact_vals(sc, 8, box, periodic, big)[0]
    results["coarsest_8"], state_ch = measure("coarsest_8", coarsest, seeds[8])

    # 4. seeded levels 16..256 (upsample + merge + sweeps, Pallas where
    #    the tiling fits; mirrors nn.py's planning incl. the r5 reroute)
    for n in reversed(levels[1:-1]):
        sc = seeds[n]
        n_ch = sc.shape[1]

        def level(st, sc, n=n, n_ch=n_ch):
            ch = _upsample_vals_mxu(st)
            zc = _pallas_zc(n)
            if zc:
                # mirrors nn.py's r5 plan: one seeded pass, then
                # state-only repair passes (seed re-reads are redundant)
                kt_p = wrap_pad(
                    sc.reshape(sc.shape[0] * n_ch, n, n, n), 1, halo_z(zc)
                )
                ch = sweep_tiles_vals(
                    ch, kt_p, box, periodic=periodic,
                    seeds_prepadded=True, zc=zc, iters=1,
                )
                left = rounds
                max_it = fit_iters(n_ch, 0, zc, 2)
                while left > 0:
                    it = min(max_it, left)
                    ch = sweep_tiles_vals(
                        ch, None, box, periodic=periodic, zc=zc, iters=it,
                    )
                    left -= it
                return ch
            d2 = _make_dist2(n, box, periodic, jnp.float32)
            d = jnp.where(ch[-1] > 0.5, d2(ch[:3]), big)
            state = (ch, d)
            for r in range(sc.shape[0]):
                cd = jnp.where(sc[r, -1] > 0.5, d2(sc[r, :3]), big)
                take = cd < state[1]
                state = (jnp.where(take[None], sc[r], state[0]),
                         jnp.where(take, cd, state[1]))
            return nnmod._sweep_vals(state, d2, big,
                                     nnmod._level_shifts(rounds), sc)[0]

        results[f"seeded_level_{n}"], state_ch = measure(
            f"seeded_level_{n}", level, state_ch, sc
        )

    # 5. finest level, decomposed.  Free the pyramid first: stage
    # isolation keeps every level's seeds alive, and at 512^3 the
    # leftovers (~8 GB) OOM the final sweep on a 16 GB chip even
    # though the real fused pipeline never holds them concurrently.
    for n in list(seeds):
        if n != n_grid:
            del seeds[n]
    results["fused_premerge_512"], st7 = measure(
        "fused_premerge_512",
        lambda st, sc: _premerge_upsampled(st[:-1], sc[0], n_grid, box,
                                           periodic, big),
        state_ch, seed_ch,
    )
    del state_ch, seed_ch, seeds
    zc = _pallas_zc(n_grid, state_only=True)

    def final_sweep(st):
        return sweep_tiles_vals(
            st, None, box, periodic=periodic, has_occ=False,
            payload_out=True, zc=zc, iters=rounds + 1,
        )

    results["fused_payload_sweep_512"], pay = measure(
        "fused_payload_sweep_512", final_sweep, st7
    )

    total_s = sum(r["s"] for r in results.values())
    total_gb = sum(r["gb"] or 0 for r in results.values())
    out = {
        "chip": jax.devices()[0].device_kind,
        "stages": results,
        "total_s": round(total_s, 3),
        "total_gb": round(total_gb, 1),
        "note": "stage isolation adds HBM materialization boundaries "
                "the fused pipeline may not have; treat as upper bounds",
    }
    print(json.dumps({"total_s": out["total_s"], "total_gb": out["total_gb"]}))
    with open(os.path.join(HERE, "descent_breakdown.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
