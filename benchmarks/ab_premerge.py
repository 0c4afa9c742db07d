"""Chip A/B: sequential upsample+premerge vs the fused elementwise pass.

The finest level of the 512^3 value-carry descent spends 0.24 s in
``_upsample_vals`` (3 gather passes, 33 GB accessed) followed by
``_premerge_inplace`` (a slab-looped full read+write) —
``benchmarks/descent_breakdown.json``.  ``_premerge_upsampled`` fuses
both into one elementwise XLA pass via broadcast+reshape (row-major
trivial, so nothing 2-minor-dim-shaped is materialized under the TPU
(8, 128) tile).  This script:

1. asserts bit-equality of the two paths at 128^3 (and that XLA's
   cost analysis confirms the traffic drop at 512^3);
2. measures both at 512^3, min-of-3 steady state.

Writes ``benchmarks/ab_premerge.json``.  Run on the chip:
``python benchmarks/ab_premerge.py``.
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


def measure(fn, *args, repeats=3):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
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
        jax.block_until_ready(jfn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), nbytes


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/vpower_jax")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import bench
    from vpower_tpu.deposit.nn import (
        _premerge_inplace, _premerge_upsampled, _seed_grids_vals,
        _upsample_vals,
    )

    box, periodic = 1.0, True
    big = jnp.float32(np.finfo(np.float32).max)

    def seq(st, sc0, n):
        ch = _upsample_vals(st)
        return _premerge_inplace(ch, sc0, n, box, periodic, big)

    def fused(st, sc0, n):
        return _premerge_upsampled(st, sc0, n, box, periodic, big)

    # -- bit-equality at 128^3 ------------------------------------------
    particles = bench.make_workload()
    pos = particles.pos % box
    vals = particles.vel.astype(jnp.float32)
    sc128 = _seed_grids_vals(pos, vals, 128, box, 1)[0]      # (7, 128^3)
    key = jax.random.PRNGKey(0)
    st64 = jax.random.normal(key, (6, 64, 64, 64), jnp.float32) % box
    a = jax.jit(lambda s, c: seq(s, c, 128))(st64, sc128)
    b = jax.jit(lambda s, c: fused(s, c, 128))(st64, sc128)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("128^3 bit-equality: OK", flush=True)
    del a, b, sc128

    # -- 512^3 timing ---------------------------------------------------
    sc512 = _seed_grids_vals(pos, vals, 512, box, 1)[0]      # (7, 512^3)
    st256 = jax.random.normal(key, (6, 256, 256, 256), jnp.float32) % box

    from vpower_tpu.deposit.nn import _upsample_vals_mxu

    t_seq, gb_seq = measure(lambda s, c: seq(s, c, 512), st256, sc512)
    t_fus, gb_fus = measure(lambda s, c: fused(s, c, 512), st256, sc512)
    t_upt, gb_upt = measure(_upsample_vals, st256)
    t_upm, gb_upm = measure(_upsample_vals_mxu, st256)

    rec = {
        "seq_512_s": round(t_seq, 4),
        "seq_512_gb": round(gb_seq / 1e9, 2),
        "fused_512_s": round(t_fus, 4),
        "fused_512_gb": round(gb_fus / 1e9, 2),
        "upsample_take_s": round(t_upt, 4),
        "upsample_take_gb": round(gb_upt / 1e9, 2),
        "upsample_mxu_s": round(t_upm, 4),
        "upsample_mxu_gb": round(gb_upm / 1e9, 2),
    }
    print(json.dumps(rec), flush=True)
    with open(os.path.join(HERE, "ab_premerge.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
