"""Block-parallel streamed folded sweep across a device mesh.

Distributes the memory-bounded folded pipeline of
:func:`vpower_tpu.run.streamed.streamed_folded_sweep` — the reference's
canonical workload (folded *velocity* spectra from particles,
``scripts/parallel_optimized.py:337-398``) — over all chips: the m^3
full-resolution blocks are independent until the fold accumulation, so
each device deposits/NN-gathers only ``m^3 / n_devices`` blocks and
phase-accumulates them locally for every beta of the batch; ONE
``psum`` combines the folded accumulators.  This replaces the
reference's per-buffer ``allgather`` of query results
(``parallel_optimized.py:365-368``) with a single reduction of the
already-folded O(n_grid^3) field.

Work per device is O(m^3 / n_devices) block passes; device memory is
O(beta_batch * n_grid^3) exactly as on one chip.  Methods: ``nn``
(exact Voronoi gather), ``ngp``/``cic`` (scatter + divide).

NN candidate rows are partitioned host-side by device block ownership
and sharded over the mesh (``in_specs=P('b')``), so each device holds
only its own blocks' candidates — the per-rank memory bounding the
reference's gen-2/4 designs existed for
(``scripts/parallel_disk.py:67-85``); scatter methods replicate the raw
particle arrays, which are O(Np) and small compared to the
periodic-image-expanded candidate runs.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.particles import Particles
from ..run import streamed as run_streamed
from ..spectrum.spectrum import PowerSpectrum, SpectrumList, init_beta_space

__all__ = ["distributed_streamed_sweep"]


def distributed_streamed_sweep(
    particles: Particles,
    n_grid: int,
    m: int,
    mesh: Mesh,
    quantity: str = "velocity",
    method: str = "nn",
    beta_sequence: Optional[np.ndarray] = None,
    beta_batch: int = 4,
    margin_cells: Optional[int] = None,
    exact: bool = False,
    certify: bool = True,
    on_spectrum=None,
) -> SpectrumList:
    """Folded sub-spectra of a derived field over ``mesh``, block-
    parallel.  Requires ``m**3 % n_devices == 0`` (whole blocks per
    device).  Results are identical to the single-chip
    :func:`~vpower_tpu.run.streamed.streamed_folded_sweep` (same block
    values, same accumulation order per device batch up to the psum).

    ``exact=True`` routes through round-robin block placement
    (:func:`~vpower_tpu.run.streamed.streamed_folded_sweep` with
    ``devices=``): the provably-exact window sweep's tier decisions are
    data-dependent host syncs that SPMD cannot express per block, so
    exact mode places block q on device ``q % ndev`` instead of
    ``shard_map`` — full window exactness, margin certificates, AND
    per-block escalation, at pod scale.  Fast mode keeps the
    zero-sync one-jit ``shard_map`` scan below.

    ``certify=True`` counts, inside the same pass, the cells whose
    assigned neighbor reaches the candidate margin (see the margin
    certificate in :mod:`vpower_tpu.run.streamed`) and WARNS if any —
    per-block escalation needs host orchestration, so the distributed
    path reports instead of re-running; rerun with a larger
    ``margin_cells`` (or the single-chip certified sweep) if it
    fires."""
    devs = np.asarray(mesh.devices).reshape(-1)
    ndev = devs.size

    if exact and method == "nn":
        # round-robin needs every device addressable from this process
        # (host numpy rows are device_put from the controller); on a
        # multi-controller pod fall through to the SPMD shard_map path,
        # whose exactness class is the jittable ring refine.
        me = jax.process_index()
        if all(d.process_index == me for d in devs):
            from ..run.streamed import streamed_folded_sweep

            return streamed_folded_sweep(
                particles, n_grid, m, quantity=quantity, method=method,
                beta_sequence=beta_sequence, beta_batch=beta_batch,
                margin_cells=margin_cells, exact=True, certify=certify,
                devices=list(devs), on_spectrum=on_spectrum,
            )
        import warnings

        warnings.warn(
            "multi-host mesh: exact NN runs the jittable ring-refine "
            "path inside shard_map (the window sweep's host-side tier "
            "decisions need single-controller addressability); the "
            "certificate below counts any cell it cannot prove.",
            stacklevel=2,
        )

    flat_mesh = Mesh(devs, ("b",))
    n_blocks = m**3
    if n_blocks % ndev != 0:
        raise ValueError(
            f"m^3 = {n_blocks} blocks must divide over {ndev} devices"
        )
    nb_local = n_blocks // ndev

    if beta_sequence is None:
        beta_sequence = init_beta_space(m)
    betas_np = np.asarray(beta_sequence, np.int32).reshape(-1, 3)
    box = float(particles.box_size)
    n_total = m * n_grid
    n_ch = 1 if quantity == "energy" else 3
    kmin = 2.0 * np.pi / box
    kmax = float(np.pi / (box / n_total))
    n_bins = int((kmax - kmin) / kmin) + 1

    if method == "nn":
        if margin_cells is None and certify:
            # mirror the single-chip certified default (the in-pass
            # suspect count warns if the margin ever binds; SPMD cannot
            # escalate per block, so the warning is the contract here)
            want = run_streamed._default_margin_cells(
                n_grid, n_total, particles.pos.shape[0]
            )
            n_ext, margin_cells = run_streamed._round_ext_capped(
                n_grid, want, (n_total - n_grid) // 2
            )
        else:
            if margin_cells is None:
                margin_cells = max(n_grid // 4, 8)
            n_ext, margin_cells = run_streamed.round_ext(
                n_grid, margin_cells
            )
        rows, starts, counts, pad, ext_box, _ = \
            run_streamed._block_candidates(
                particles, m, n_grid, margin_cells
            )
        cell_total = box / n_total
        ext_box_grid = n_ext * cell_total

        # Partition the candidate runs by device block ownership: device
        # d's shard holds ONLY its nb_local blocks' runs (equal-size
        # shards, zero-padded), so per-device candidate memory is
        # ~1/ndev of the whole-run array instead of a full replica.
        counts_dev = counts.reshape(ndev, nb_local).astype(np.int32)
        dev_tot = counts_dev.sum(axis=1)
        r_dev = int(dev_tot.max()) + pad
        rows_dev = np.zeros((ndev * r_dev, rows.shape[1]), np.float32)
        starts_dev = np.empty((ndev, nb_local), np.int32)
        for d in range(ndev):
            q0 = d * nb_local
            seg0 = int(starts[q0])
            seg = rows[seg0: seg0 + int(dev_tot[d])]
            rows_dev[d * r_dev: d * r_dev + len(seg)] = seg
            starts_dev[d] = (starts[q0: q0 + nb_local] - seg0).astype(
                np.int32
            )
        arrays = (
            jnp.asarray(rows_dev),
            jnp.asarray(starts_dev),
            jnp.asarray(counts_dev),
        )
        arr_specs = (P("b"), P("b"), P("b"))

        def block_values(i, q, rows_d, starts_d, counts_d):
            cand = jax.lax.dynamic_slice(
                rows_d, (starts_d[0, i], jnp.int32(0)),
                (pad, rows_d.shape[1]),
            )
            out = run_streamed._nn_block_values(
                cand, counts_d[0, i], n_grid, n_ext, margin_cells,
                float(ext_box_grid), float(cell_total), quantity, exact,
                certify=certify,
            )
            if certify:
                return out[0].reshape(n_ch, n_grid**3), out[1]
            return out.reshape(n_ch, n_grid**3), jnp.int32(0)

    elif method in ("ngp", "cic", "sph"):
        # Raw particle arrays are O(Np) — small next to image-expanded
        # candidate runs — so scatter methods replicate them.
        arrays = (particles.pos, particles.vel, particles.mass)
        if method == "sph":
            arrays = arrays + (particles.smoothing_length(),)
        arr_specs = (P(),) * len(arrays)

        def block_values(i, q, pos_d, vel_d, mass_d, *h_d):
            qv = jnp.stack(
                [q // (m * m), (q // m) % m, q % m]
            ).astype(jnp.int32)
            return run_streamed._scatter_block_values(
                pos_d, vel_d, mass_d, qv, n_grid, n_total, box,
                method, quantity, h=h_d[0] if h_d else None,
            ).reshape(n_ch, n_grid**3), jnp.int32(0)

    else:
        raise ValueError(f"Unsupported method {method!r}")

    def make_runner(B):
        def body(betas, *arrs):
            d = jax.lax.axis_index("b")
            betas_f = betas.astype(jnp.float32)

            def scan_body(carry, i):
                acc_re, acc_im, sus = carry
                q = d * nb_local + i
                vals, nsus = block_values(i, q, *arrs)
                qv = jnp.stack(
                    [q // (m * m), (q // m) % m, q % m]
                ).astype(jnp.float32)
                theta = -2.0 * jnp.pi * (betas_f @ qv) / m
                norm = 1.0 / m**1.5
                s_re = jnp.cos(theta) * norm
                s_im = jnp.sin(theta) * norm
                return (
                    acc_re + s_re[:, None, None] * vals[None],
                    acc_im + s_im[:, None, None] * vals[None],
                    sus + nsus,
                ), None

            zeros = jnp.zeros((B, n_ch, n_grid**3), jnp.float32)
            (acc_re, acc_im, sus), _ = jax.lax.scan(
                scan_body, (zeros, zeros, jnp.int32(0)),
                jnp.arange(nb_local, dtype=jnp.int32),
            )
            acc_re = jax.lax.psum(acc_re, "b")
            acc_im = jax.lax.psum(acc_im, "b")
            sus = jax.lax.psum(sus, "b")

            ks, ps, ns = [], [], []
            for j in range(B):      # static unroll over the beta batch
                k, psum, nsamp = run_streamed._finish_beta(
                    acc_re[j], acc_im[j], betas[j],
                    n_grid, n_total, box, n_bins,
                )
                ks.append(k)
                ps.append(psum)
                ns.append(nsamp)
            return ks[0], jnp.stack(ps), jnp.stack(ns), sus

        return jax.jit(shard_map(
            body, mesh=flat_mesh, in_specs=(P(),) + arr_specs,
            out_specs=(P(), P(), P(), P()), check_vma=False,
        ))

    runners = {}
    spectra = []
    sus_total = 0
    i = 0
    while i < len(betas_np):
        batch = betas_np[i:i + beta_batch]
        B = len(batch)
        if B not in runners:
            runners[B] = make_runner(B)
        k, psum, nsamp, sus = runners[B](jnp.asarray(batch), *arrays)
        # blocks are recomputed per batch, so the count repeats: keep max
        sus_total = max(sus_total, int(np.asarray(sus).max()))
        k_np = np.asarray(k)
        for j, beta in enumerate(batch):
            s = PowerSpectrum.from_binned(
                k_np, np.asarray(psum[j]), np.asarray(nsamp[j]),
                m=m, beta=tuple(int(b) for b in beta),
            )
            spectra.append(s)
            if on_spectrum is not None:
                on_spectrum(s)  # e.g. the CLI's per-beta checkpoint
        i += beta_batch
    if sus_total:
        import warnings

        warnings.warn(
            f"{sus_total} cells could not be margin-certified "
            f"(assigned neighbor at/beyond margin_cells={margin_cells}); "
            f"the distributed sweep cannot escalate per block — rerun "
            f"with a larger margin_cells, or use the single-chip "
            f"certified streamed_folded_sweep.",
            stacklevel=2,
        )
    return SpectrumList(spectra)
