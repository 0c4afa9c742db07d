"""Out-of-core BrickStore tests: round trip, streaming fold vs in-memory
fold (reference BrickInventory semantics, interp.py:818-962)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vpower_tpu import (
    BoxField,
    BrickStore,
    deposit,
    folded_spectrum,
    spectrum_from_folded,
    synthetic_particles,
)
from vpower_tpu.spectrum import fold as fold_mod

pytestmark = pytest.mark.fast


def _toy_field(key, n, box=1.0):
    kv, km = jax.random.split(key)
    return BoxField(
        velocity=jax.random.normal(kv, (3, n, n, n), jnp.float32),
        mass=jax.random.uniform(km, (n, n, n), jnp.float32) + 0.5,
        cell_size=box / n,
    )


def _store_from_field(tmp_path, field, nbrick):
    """Slice an in-memory field into a BrickStore (fold path test rig)."""
    import os
    os.makedirs(str(tmp_path), exist_ok=True)
    n = field.n_grid
    nb = n // nbrick
    store = BrickStore(str(tmp_path), nbrick, nb, field.box_size / nbrick)
    for r in range(nbrick):
        for s in range(nbrick):
            for t in range(nbrick):
                sl = (slice(r * nb, (r + 1) * nb),
                      slice(s * nb, (s + 1) * nb),
                      slice(t * nb, (t + 1) * nb))
                store.save_brick(
                    r, s, t,
                    BoxField(velocity=field.velocity[(slice(None),) + sl],
                             mass=field.mass[sl],
                             cell_size=field.cell_size),
                )
    store.save()
    return store


def test_brick_roundtrip(tmp_path):
    field = _toy_field(jax.random.PRNGKey(0), 8)
    store = _store_from_field(tmp_path, field, 2)
    store2 = BrickStore.load(str(tmp_path))
    assert store2.nbrick == 2 and store2.n_brick == 4
    brick = store2[1, 0, 1]
    np.testing.assert_allclose(
        np.asarray(brick.mass), np.asarray(field.mass[4:8, 0:4, 4:8])
    )


@pytest.mark.parametrize("m,nbrick", [(4, 2), (2, 2), (2, 4)])
def test_streaming_fold_matches_inmemory(tmp_path, m, nbrick):
    """fold-stitch (m >= nbrick) and stitch-fold (m < nbrick) streaming
    == in-memory fold of the full field (interp.py:909-937)."""
    field = _toy_field(jax.random.PRNGKey(1), 16)
    store = _store_from_field(tmp_path, field, nbrick)
    beta = (1, 0, 1)
    streamed = store.fold(m, beta)
    reference = fold_mod.fold_box_field(field, m, beta)
    np.testing.assert_allclose(
        np.asarray(streamed.field), np.asarray(reference.field),
        rtol=2e-4, atol=1e-6,
    )
    # and the sub-spectrum path runs on the streamed result
    s = spectrum_from_folded(streamed)
    s_ref = folded_spectrum(field, m, beta)
    np.testing.assert_allclose(s.Nsample, s_ref.Nsample)
    np.testing.assert_allclose(s.Psum, s_ref.Psum, rtol=2e-3, atol=1e-9)


def test_streaming_fold_downsample(tmp_path):
    """n_result < total_n/m: bricks are mass-weighted down-sampled before
    folding (interp.py:904-907)."""
    field = _toy_field(jax.random.PRNGKey(2), 16)
    store = _store_from_field(tmp_path, field, 2)
    folded = store.fold(2, (0, 0, 0), n_result=4)  # total 16, m=2, down 2
    assert folded.field.shape == (3, 4, 4, 4)
    reference = fold_mod.fold_box_field(field.down_sample(2), 2, (0, 0, 0))
    np.testing.assert_allclose(
        np.asarray(folded.field), np.asarray(reference.field),
        rtol=2e-4, atol=1e-6,
    )


def test_from_particles_brick_interp(tmp_path):
    """The repaired interp_to_brick: bricks assembled from margin-padded
    NN interpolation match the global NN interpolation away from brick
    faces (and everywhere, with enough margin)."""
    particles = synthetic_particles(jax.random.PRNGKey(3), 16, jitter=0.3)
    store = BrickStore.from_particles(
        str(tmp_path), particles, nbrick=2, n_brick=8, method="nn",
        margin_cells=4,
    )
    full = deposit(particles, 16, method="nn", periodic=False)
    for loc in [(0, 0, 0), (1, 1, 1), (1, 0, 1)]:
        brick = store[loc]
        r, s, t = loc
        sl = (slice(r * 8, (r + 1) * 8), slice(s * 8, (s + 1) * 8),
              slice(t * 8, (t + 1) * 8))
        np.testing.assert_allclose(
            np.asarray(brick.velocity),
            np.asarray(full.velocity[(slice(None),) + sl]),
            rtol=1e-5,
        )


def test_raw_format_with_prefetch(tmp_path):
    """Raw-format bricks + native prefetcher fold == npz fold."""
    from vpower_tpu.io import native

    if not native.native_available():
        import pytest
        pytest.skip("native runtime unavailable")
    field = _toy_field(jax.random.PRNGKey(7), 16, box=1.0)
    field = BoxField(velocity=field.velocity.astype(jnp.float32),
                     mass=field.mass.astype(jnp.float32),
                     cell_size=field.cell_size)
    s_npz = _store_from_field(tmp_path / "npz", field, 2)
    s_raw = BrickStore(str(tmp_path / "raw"), 2, 8, 0.5, fmt="raw")
    import os
    os.makedirs(s_raw.directory, exist_ok=True)
    for r in range(2):
        for s in range(2):
            for t in range(2):
                s_raw.save_brick(r, s, t, s_npz[r, s, t])
    s_raw.save()
    s_raw2 = BrickStore.load(s_raw.directory)
    assert s_raw2.fmt == "raw"
    f_npz = s_npz.fold(2, (1, 0, 1))
    f_raw = s_raw2.fold(2, (1, 0, 1))
    np.testing.assert_allclose(
        np.asarray(f_raw.field), np.asarray(f_npz.field), rtol=1e-6
    )
