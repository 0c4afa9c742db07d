"""A/B the sweep kernel's x/y tile size (default 8).

``sweep_tiles_vals`` DMAs a (tile + 2*_HALO)^2 x/y window per tile:
tile=8 reads every field 4x in x/y ((16/8)^2); tile=16 cuts that to
2.25x and tile=32 to 1.56x, at larger VMEM scratch windows.  Whether
that wins depends on where each config actually sits between DMA-bound
and VPU-compute-bound (52 stencil offsets per iteration) — so measure,
on the chip, for the two dominant production configs:

* final state-only sweep: n_ch=7, k=0, zc=512, iters=2, payload_out
* seeded pass at 256^3:   n_ch=7, k=2, zc=256, iters=1

Configs that blow the scoped-VMEM envelope are recorded as "oom"
rather than crashing the sweep.  Writes ``benchmarks/ab_tile.json``.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))


def measure(fn, *args, repeats=3):
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.sum(out[0]))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jfn(*args)
        float(jnp.sum(out[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/vpower_jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from vpower_tpu.deposit.nn_pallas import halo_z, sweep_tiles_vals, wrap_pad

    box = 1.0
    rec = {}

    # synthetic occupied state: positions near their own cell centers
    # (timing is data-independent; values only need to be in-box)
    def make_state(n, n_ch, key):
        ax = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
        px, py, pz = jnp.meshgrid(ax, ax, ax, indexing="ij")
        extra = jax.random.uniform(key, (n_ch - 3, n, n, n), jnp.float32)
        return jnp.concatenate(
            [px[None], py[None], pz[None], extra], axis=0
        )

    key = jax.random.PRNGKey(0)

    # --- final state-only sweep, 512^3 ---
    st = make_state(512, 7, key)
    float(jnp.sum(st))
    for tile in (8, 16, 32):
        name = f"final512_state_iters2_tile{tile}"
        try:
            dt = measure(
                lambda s, t=tile: sweep_tiles_vals(
                    s, None, box, has_occ=False, payload_out=True,
                    zc=512, iters=2, tile=t,
                ),
                st,
            )
            rec[name] = round(dt, 4)
        except Exception as e:  # noqa: BLE001
            rec[name] = f"fail: {type(e).__name__}"
        print(name, rec[name], flush=True)
    del st

    # --- seeded pass, 256^3, k=2 ---
    st = make_state(256, 7, key)
    seeds = jnp.concatenate(
        [make_state(256, 7, jax.random.PRNGKey(i)) for i in (1, 2)], axis=0
    )
    seeds_p = wrap_pad(seeds, 1, halo_z(256))
    float(jnp.sum(seeds_p))
    for tile in (8, 16, 32):
        name = f"seeded256_k2_iters1_tile{tile}"
        try:
            dt = measure(
                lambda s, kp, t=tile: sweep_tiles_vals(
                    s, kp, box, seeds_prepadded=True, zc=256, iters=1,
                    tile=t,
                ),
                st, seeds_p,
            )
            rec[name] = round(dt, 4)
        except Exception as e:  # noqa: BLE001
            rec[name] = f"fail: {type(e).__name__}"
        print(name, rec[name], flush=True)

    print(json.dumps(rec), flush=True)
    with open(os.path.join(HERE, "ab_tile.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
