"""Round-5 chip A/Bs: seeded-sweep fusion strategy and rfft-vs-fftn.

HISTORICAL RECORD (ab_r5.json): the zc=128/iters=2 fused-seeded
reroute measured SLOWER (1.705 s) than plain zc=256 single passes
(1.558 s) — the seeded levels are DMA-descriptor-bound, so halving the
chunk costs more than the fused pass saves.  Both arms were then
obsoleted by the seeded-once + state-only split in ``nn.py`` (later
passes provably never need the seed fields); the
``VPOWER_SEEDED_ZC128`` knob no longer exists, so re-running this
script today measures the same (current) plan twice.  rfft vs fftn
(0.235 vs 0.313 s) still reflects live alternatives.

Three measurements on the real chip, steady-state min-of-3 each.
Writes ``benchmarks/ab_r5.json``.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vpower_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import bench
particles = bench.make_workload()
float(jnp.sum(particles.pos[:, 0]))
from vpower_tpu.deposit.nn import nn_velocity_grid
run = jax.jit(lambda p: nn_velocity_grid(p, 512))
v = run(particles); float(jnp.sum(v))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    v = run(particles); float(jnp.sum(v))
    ts.append(time.perf_counter() - t0)
print("RESULT " + json.dumps(min(ts)))
"""


def descent_variant(seeded_zc128: str) -> float:
    env = dict(os.environ)
    env["VPOWER_SEEDED_ZC128"] = seeded_zc128
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO)],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return float(json.loads(line[7:]))
    raise RuntimeError(
        f"descent variant failed (rc={proc.returncode}):\n{proc.stderr[-2000:]}"
    )


def fft_ab():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/vpower_jax")
    )
    from vpower_tpu.spectrum.power import (
        real_power_binned, shell_bin, vector_power,
    )

    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (3, 512, 512, 512), jnp.float32)
    float(jnp.sum(v))

    run_r = jax.jit(lambda x: real_power_binned(x, 1.0))
    run_f = jax.jit(lambda x: shell_bin(vector_power(x, 1.0), 1.0))
    out = {}
    for name, fn in (("rfft_binned", run_r), ("fftn_binned", run_f)):
        k, psum, ns = fn(v)
        float(jnp.sum(psum))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            k, psum, ns = fn(v)
            float(jnp.sum(psum))
            ts.append(time.perf_counter() - t0)
        out[name] = round(min(ts), 4)
    return out


def main():
    res = {
        "descent_512_seeded_zc128_iters2_s": round(descent_variant("1"), 4),
        "descent_512_seeded_keepzc_iters1_s": round(descent_variant("0"), 4),
    }
    res.update(fft_ab())
    print(json.dumps(res), flush=True)
    with open(os.path.join(HERE, "ab_r5.json"), "w") as fh:
        json.dump(res, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
