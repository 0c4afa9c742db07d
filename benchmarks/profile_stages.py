"""Measured per-stage profile of the 512^3 headline pipeline and the
320^3 streamed-block descent (VERDICT r3 item 3: measure, then raise,
utilization).

For each stage: wall time over repeats (scalar-transfer synced —
``block_until_ready`` is a no-op on the axon remote platform) plus the
XLA-compiled ``cost_analysis`` bytes-accessed, giving a MEASURED GB/s
against the chip's ~820 GB/s HBM instead of the old hand model.  Also
A/Bs the flag-gated ``VPOWER_STATE_ZC512`` single-z-chunk sweep so the
flag can be promoted or deleted on data.

Writes ``benchmarks/profile_stages.json``.  Run on the real chip:
``python benchmarks/profile_stages.py``.
"""
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
HBM_GBPS = 820.0  # v5e-class


def _sync(x):
    # Scalar-reduction sync: ``leaf.ravel()[:1]`` materialized a full
    # device copy of the leaf first (2 GB at 512^3 x 4ch), which tipped
    # the 16 GB chip into RESOURCE_EXHAUSTED next to the stage's own
    # working set; a jnp.sum reads the buffer without copying it.
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.sum(leaf))


def _cost_bytes(fn, *args):
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("bytes accessed", float("nan")))
    except Exception as e:  # noqa: BLE001 — platform may not support it
        print(f"  cost_analysis unavailable: {e}", flush=True)
        return float("nan")


def _free(x):
    for leaf in jax.tree_util.tree_leaves(x):
        try:
            leaf.delete()
        except Exception:  # noqa: BLE001 — already donated/deleted
            pass


def _time(fn, *args, reps=3):
    """Best-of-reps wall time with EXPLICIT buffer deletion between
    runs — holding two 512^3 multi-channel outputs at once (previous
    rep + in-flight rep) tipped the 16 GB chip into
    RESOURCE_EXHAUSTED.  Stages run under one jit like the production
    pipelines (an eager call would materialize every multigrid level)."""
    fn = jax.jit(fn)
    out = fn(*args)
    _sync(out)
    _free(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
        _free(out)
    return best


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vpower_jax"),
    )

    from vpower_tpu.io.synthetic import (
        gaussian_random_field, grid_positions, particles_from_field,
    )

    key = jax.random.PRNGKey(42)
    kf, kp = jax.random.split(key)
    field = gaussian_random_field(kf, 256, 1.0)
    pos = grid_positions(216, 1.0, key=kp, jitter=3.0)
    particles = particles_from_field(field, 1.0, pos)
    float(jnp.sum(particles.pos[:, 0]))

    from vpower_tpu.deposit.nn import nn_gather_grid
    from vpower_tpu.spectrum.power import shell_bin, vector_power

    vals = jnp.concatenate(
        [particles.vel, particles.density[:, None]], axis=1
    ).astype(jnp.float32)

    stages = {}

    def record(name, seconds, nbytes):
        gbps = nbytes / seconds / 1e9 if np.isfinite(nbytes) else None
        stages[name] = {
            "s": round(seconds, 4),
            "bytes_accessed": None if not np.isfinite(nbytes) else nbytes,
            "gb_per_s": None if gbps is None else round(gbps, 1),
            "hbm_frac": None if gbps is None else round(gbps / HBM_GBPS, 3),
        }
        print(f"  {name}: {seconds:.3f}s"
              + (f"  {gbps:.0f} GB/s ({gbps / HBM_GBPS * 100:.0f}% HBM)"
                 if gbps else ""), flush=True)

    # ---- headline stages at 512^3 ---------------------------------- #
    print("[profile] 512^3 headline stages", flush=True)

    def stage_descent(p, v):
        return nn_gather_grid(p, v, 512, 1.0)

    t = _time(stage_descent, particles.pos, vals)
    b = _cost_bytes(stage_descent, particles.pos, vals)
    record("descent_512_value_carry", t, b)

    # hand-off cube built inside one jit so the full 4-channel payload
    # (2 GB) never coexists with its 3-channel copy on the 16 GB chip
    vel_grid = jax.jit(
        lambda p, v: stage_descent(p, v)[0][:3]
    )(particles.pos, vals)
    _sync(vel_grid)

    def stage_fft(vg):
        return vector_power(vg, 1.0)

    t = _time(stage_fft, vel_grid)
    b = _cost_bytes(stage_fft, vel_grid)
    record("fft_power_512_3comp", t, b)

    p_grid = jax.jit(stage_fft)(vel_grid)
    _sync(p_grid)
    _free(vel_grid)

    def stage_bin(pg):
        return shell_bin(pg, 1.0)

    t = _time(stage_bin, p_grid)
    b = _cost_bytes(stage_bin, p_grid)
    record("shell_bin_512", t, b)
    _free(p_grid)

    # ---- streamed 320^3 block descent (the 2048-range workhorse) --- #
    print("[profile] 320^3 streamed block (production margin)", flush=True)
    from vpower_tpu.run import streamed as rs

    m, n_grid = 8, 256
    want = rs._default_margin_cells(n_grid, m * n_grid, pos.shape[0])
    n_ext, mc = rs._round_ext_capped(n_grid, want, (m * n_grid - n_grid) // 2)
    rows_d, starts, counts, pad, ext_box, _ = rs._block_candidates_device(
        particles, m, n_grid, mc
    )
    _sync(rows_d)
    cell = 1.0 / (m * n_grid)
    cand = jax.lax.dynamic_slice(rows_d, (int(starts[0]), 0), (pad, 7))
    cnt = jnp.int32(counts[0])

    def one_block(c, k):
        return rs._nn_block_values(
            c, k, n_grid, n_ext, mc, float(n_ext * cell), float(cell),
            "velocity", False, certify=True,
        )

    t = _time(one_block, cand, cnt)
    b = _cost_bytes(one_block, cand, cnt)
    record(f"block_{n_ext}_descent_certified", t, b)
    # the candidate-run table (~1.5 GB at 10M particles) must not
    # coexist with the A/B's full 512^3 descent peak
    _free((rows_d, cand, cnt))

    # ---- VPOWER_STATE_ZC512 A/B at 512^3 --------------------------- #
    print("[profile] state-only z-chunk A/B at 512^3", flush=True)
    from vpower_tpu.deposit import nn as nn_mod

    # flag=0 is exactly the descent_512_value_carry stage above — reuse
    # it instead of paying the multi-minute axon compile twice
    zc_ab = {"zc384_default": stages["descent_512_value_carry"]["s"]}
    os.environ["VPOWER_STATE_ZC512"] = "1"
    importlib.reload(nn_mod)

    def run_flag(p, v):
        return nn_mod.nn_gather_grid(p, v, 512, 1.0)

    t = _time(run_flag, particles.pos, vals)
    zc_ab["zc512_on"] = round(t, 4)
    print(f"  VPOWER_STATE_ZC512=1: {t:.3f}s", flush=True)
    os.environ.pop("VPOWER_STATE_ZC512", None)
    importlib.reload(nn_mod)

    # ---- device trace support probe -------------------------------- #
    # (the remote-execution axon platform may not emit device traces;
    # record the factual answer either way so the profile artifact says
    # what tooling exists here)
    trace_support = "unknown"
    try:
        import glob
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                x = jnp.ones((256, 256)) @ jnp.ones((256, 256))
                _sync(x)
            files = glob.glob(td + "/**/*.pb", recursive=True) + \
                glob.glob(td + "/**/*.xplane*", recursive=True)
            trace_support = (
                f"{len(files)} trace artifacts" if files
                else "trace ran, no device artifacts"
            )
    except Exception as e:  # noqa: BLE001
        trace_support = f"unavailable: {type(e).__name__}"
    print(f"[profile] jax.profiler.trace: {trace_support}", flush=True)

    out = {
        "chip": str(jax.devices()[0]),
        "hbm_ref_gb_per_s": HBM_GBPS,
        "stages": stages,
        "state_zc512_ab_512": zc_ab,
        "jax_profiler_trace": trace_support,
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "profile_stages.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
