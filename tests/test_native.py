"""Native host-runtime tests (C++ via ctypes): Gadget binary reader,
Morton pre-sort, raw-brick I/O with prefetch.  Skipped when the
toolchain can't build the library."""
import os
import struct

import numpy as np
import pytest

pytest.importorskip("ctypes")

from vpower_tpu.io import native


pytestmark = [
    pytest.mark.fast,
    pytest.mark.skipif(
        not native.native_available(), reason="native library unavailable"
    ),
]


def write_gadget_snapshot(path, pos, vel, mass, rho, box=1.0):
    """Minimal Gadget-2 SnapFormat-1 writer (gas only, variable masses)."""
    n = len(pos)

    def block(payload):
        return struct.pack("<I", len(payload)) + payload + struct.pack(
            "<I", len(payload)
        )

    header = struct.pack("<6I", n, 0, 0, 0, 0, 0)
    header += struct.pack("<6d", 0, 0, 0, 0, 0, 0)  # mass table: all varying
    header += struct.pack("<dd", 0.0, 0.0)  # time, redshift
    header += struct.pack("<ii", 0, 0)  # flags
    header += struct.pack("<6I", n, 0, 0, 0, 0, 0)
    header += struct.pack("<ii", 0, 1)  # cooling, num_files
    header += struct.pack("<dddd", box, 0.3, 0.7, 0.7)
    header += b"\0" * (256 - len(header))

    with open(path, "wb") as f:
        f.write(block(header))
        f.write(block(np.asarray(pos, np.float32).tobytes()))
        f.write(block(np.asarray(vel, np.float32).tobytes()))
        f.write(block(np.arange(n, dtype=np.uint32).tobytes()))  # IDs
        f.write(block(np.asarray(mass, np.float32).tobytes()))
        f.write(block(np.zeros(n, np.float32).tobytes()))  # U
        f.write(block(np.asarray(rho, np.float32).tobytes()))


def test_gadget_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 1000
    pos = rng.random((n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    mass = rng.random(n).astype(np.float32) + 0.5
    rho = rng.random(n).astype(np.float32) + 0.5
    path = str(tmp_path / "snap.bin")
    write_gadget_snapshot(path, pos, vel, mass, rho, box=2.5)

    p2, v2, m2, r2, box = native.load_gadget_binary(path, snap_format=1)
    assert box == 2.5
    np.testing.assert_array_equal(p2, pos)
    np.testing.assert_array_equal(v2, vel)
    np.testing.assert_array_equal(m2, mass)
    np.testing.assert_array_equal(r2, rho)


def test_morton_argsort_orders_spatially():
    rng = np.random.default_rng(1)
    pos = rng.random((5000, 3)).astype(np.float32)
    order = native.morton_argsort(pos, 1.0)
    assert sorted(order.tolist()) == list(range(5000))
    # neighbors in Morton order are spatially close on average
    sorted_pos = pos[order]
    d_sorted = np.linalg.norm(np.diff(sorted_pos, axis=0), axis=1).mean()
    d_orig = np.linalg.norm(np.diff(pos, axis=0), axis=1).mean()
    assert d_sorted < 0.5 * d_orig


def test_morton_sort_particles():
    import jax
    import jax.numpy as jnp
    from vpower_tpu import synthetic_particles

    p = synthetic_particles(jax.random.PRNGKey(0), 8, jitter=0.3)
    ps = native.morton_sort_particles(p)
    assert len(ps) == len(p)
    # same multiset of masses; conserved totals
    np.testing.assert_allclose(
        float(ps.mass.sum()), float(p.mass.sum()), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(ps.pos[:, 0])), np.sort(np.asarray(p.pos[:, 0])),
        rtol=1e-6,
    )


def test_brick_raw_io_and_prefetch(tmp_path):
    rng = np.random.default_rng(2)
    a = rng.random((4, 4, 4, 4)).astype(np.float32)
    b = rng.random((4, 4, 4, 4)).astype(np.float32)
    pa = str(tmp_path / "a.bin")
    pb = str(tmp_path / "b.bin")
    native.brick_write_raw(pa, a)
    native.brick_write_raw(pb, b)

    np.testing.assert_array_equal(
        native.brick_read_raw(pa, a.size).reshape(a.shape), a
    )

    pf = native.BrickPrefetcher()
    pf.start(pa, a.size)
    got_a = pf.finish(a.size)
    pf.start(pb, b.size)
    got_b = pf.finish(b.size)
    pf.close()
    np.testing.assert_array_equal(got_a, a.ravel())
    np.testing.assert_array_equal(got_b, b.ravel())


def test_nn_exact_kdtree_matches_bruteforce():
    """Native kd-tree == brute force on uniform AND clustered inputs,
    periodic and open — the genuinely exact ANN-parity path."""
    from vpower_tpu.deposit.nn import nn_brute_force
    from vpower_tpu.io.native import native_available, nn_exact_host

    if not native_available():
        pytest.skip("no native toolchain")
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(3)
    # clustered: thousands of particles in a few cells
    kc, ko = jax.random.split(key)
    centers = jax.random.uniform(kc, (6, 3), jnp.float32)
    which = jax.random.randint(ko, (8192,), 0, 6)
    pos = (centers[which] + 0.02 * jax.random.normal(
        jax.random.fold_in(key, 7), (8192, 3), jnp.float32)) % 1.0
    for periodic in (True, False):
        got = nn_exact_host(np.asarray(pos), 32, 1.0, periodic=periodic)
        ref = np.asarray(nn_brute_force(pos, 32, 1.0, periodic=periodic))
        # compare by distance (tie-safe)
        cell = 1.0 / 32
        axis = (np.arange(32) + 0.5) * cell
        cx, cy, cz = np.meshgrid(axis, axis, axis, indexing="ij")
        centers_np = np.stack([cx, cy, cz], axis=-1)
        p = np.asarray(pos)

        def d2(idx):
            d = centers_np - p[idx]
            if periodic:
                d = d - np.round(d)
            return (d * d).sum(-1)

        np.testing.assert_allclose(d2(got), d2(ref), rtol=1e-5, atol=1e-12)
