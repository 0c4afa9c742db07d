"""Decompose the 512^3 rank-1 seed deposit (0.25 s @ 74 GB/s — the
largest single stage of the descent after the r5 fusions).

Components timed in isolation on the chip:
* key prep (ids, d2)
* lax.sort with the 6 payload columns riding (production config)
* lax.sort with 3 columns (keys + index) — the payload-gather
  alternative's sort cost
* plan build (make_deposit_plan)
* MXU deposit (deposit_planned, 7 channels)

Writes ``benchmarks/probe_seed_deposit.json``.
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


def measure(name, fn, *args, repeats=3):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x[..., :1])), out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.tree_util.tree_map(lambda x: float(jnp.sum(x[..., :1])), out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:28s} {dt:.4f} s", flush=True)
    return round(dt, 4)


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/vpower_jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import bench
    from vpower_tpu.deposit import mxu_scatter

    n_grid, box = 512, 1.0
    particles = bench.make_workload()
    pos = particles.pos % box
    vals = particles.vel.astype(jnp.float32)
    float(jnp.sum(pos))

    n_cells = n_grid ** 3
    cell = box / n_grid

    def keys(pos):
        ijk = jnp.floor(pos / cell).astype(jnp.int32) % n_grid
        ids = (ijk[:, 0] * n_grid + ijk[:, 1]) * n_grid + ijk[:, 2]
        centers = (ijk.astype(pos.dtype) + 0.5) * cell
        d2 = jnp.sum((pos - centers) ** 2, axis=1)
        return ids, d2

    rec = {}
    rec["keys"] = measure("keys", keys, pos)
    ids, d2 = jax.jit(keys)(pos)

    def sort8(ids, d2, pos, vals):
        cols = [pos[:, 0], pos[:, 1], pos[:, 2]] + \
            [vals[:, c] for c in range(3)]
        return jax.lax.sort((ids, d2) + tuple(cols), num_keys=2)

    def sort3(ids, d2):
        pidx = jnp.arange(ids.shape[0], dtype=jnp.int32)
        return jax.lax.sort((ids, d2, pidx), num_keys=2)

    def sort1(ids):
        return jax.lax.sort((ids,), num_keys=1)

    rec["sort8"] = measure("sort8 (production)", sort8, ids, d2, pos, vals)
    rec["sort3"] = measure("sort3 (keys+index)", sort3, ids, d2)
    rec["sort1"] = measure("sort1 (ids only)", sort1, ids)

    ids_s, d2_s, *cols_s = jax.jit(sort8)(ids, d2, pos, vals)

    rec["plan"] = measure(
        "plan", lambda s: mxu_scatter.make_deposit_plan(s, n_cells), ids_s
    )
    plan = jax.jit(
        lambda s: mxu_scatter.make_deposit_plan(s, n_cells)
    )(ids_s)

    def dep(plan, ids_s, cols):
        new_seg = ids_s[1:] != ids_s[:-1]
        m = jnp.concatenate([jnp.array([True]), new_seg]).astype(jnp.float32)
        chans = [c * m for c in cols] + [m]
        return mxu_scatter.deposit_planned(
            plan, jnp.stack(chans, axis=1), n_cells
        )

    rec["mask+deposit7"] = measure(
        "mask+deposit (7ch)", dep, plan, ids_s, tuple(cols_s)
    )

    print(json.dumps(rec), flush=True)
    with open(os.path.join(HERE, "probe_seed_deposit.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
