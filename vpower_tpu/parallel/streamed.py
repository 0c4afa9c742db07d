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

Work per device is O(m^3 / n_devices) block passes — ONCE per sweep
when the sharded block-value cache fits (``cache_values``, the
default at pod-scale shard sizes): every later beta batch is a local
matmul + one psum, the role the reference's gen-2 disk index buffers
played (``scripts/parallel_disk.py:305-332``).  Device memory is
O(beta_batch * n_grid^3) (+ the per-device cache shard when enabled).
Methods: ``nn`` (exact Voronoi gather), ``ngp``/``cic`` (scatter +
divide).

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
    cache_values: Optional[bool] = None,
    stage_times: Optional[dict] = None,
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

    ``cache_values`` (default: auto by per-device memory): compute
    every local block's field values ONCE into a sharded device-side
    cache — (nb_local, C, n_grid^3) float32 per device — so each beta
    batch is a local matmul + one psum instead of a full NN/deposit
    pass (the role the reference's gen-2 disk index buffers played,
    ``scripts/parallel_disk.py:305-332``: query once, reuse per pass).
    Auto-enables when the per-device cache is <= ~2 GB; pass False to
    force per-batch recompute (O(beta_batch * n_grid^3) device memory,
    exactly as before).

    ``certify=True``: the compute pass carries a PER-BLOCK suspect-cell
    vector out of the mesh.  With the value cache on (and a
    single-controller mesh), offending blocks are escalated at doubled
    margins exactly like the single-chip sweep — their cache column is
    zeroed and the corrected values ride each batch as a replicated
    correction term.  Without the cache (or multi-controller), the
    count WARNS and the run proceeds (rerun with a larger
    ``margin_cells`` if it fires).

    ``stage_times``: dict out-param; receives ``suspect_cells``,
    ``escalated_blocks``, ``uncertified_cells`` (certificate stats)
    and ``compute_s`` / ``batches_s`` wall splits."""
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

    import time as _time

    single_controller = all(
        d.process_index == jax.process_index() for d in devs
    )
    if cache_values is None:
        # auto: the sharded cache costs nb_local blocks of f32 values
        # per device — on when that is modest next to accelerator HBM
        cache_values = nb_local * n_ch * n_grid**3 * 4 <= 2e9

    def _finish_unrolled(acc_re, acc_im, betas, B):
        ks, ps, ns = [], [], []
        for j in range(B):      # static unroll over the beta batch
            k, psum, nsamp = run_streamed._finish_beta(
                acc_re[j], acc_im[j], betas[j],
                n_grid, n_total, box, n_bins,
            )
            ks.append(k)
            ps.append(psum)
            ns.append(nsamp)
        return ks[0], jnp.stack(ps), jnp.stack(ns)

    def _emit(batch, k_np, psum, nsamp):
        out = []
        for j, beta in enumerate(batch):
            s = PowerSpectrum.from_binned(
                k_np, np.asarray(psum[j]), np.asarray(nsamp[j]),
                m=m, beta=tuple(int(b) for b in beta),
            )
            out.append(s)
            if on_spectrum is not None:
                on_spectrum(s)  # e.g. the CLI's per-beta checkpoint
        return out

    stats = {"suspect_cells": 0, "escalated_blocks": 0,
             "uncertified_cells": 0}
    spectra = []

    if cache_values:
        # ---- compute pass: every block's values ONCE, sharded -------- #
        def compute_body(*arrs):
            d = jax.lax.axis_index("b")

            def scan_body(_, i):
                q = d * nb_local + i
                vals, nsus = block_values(i, q, *arrs)
                return None, (vals, nsus)

            _, (vals, nsus) = jax.lax.scan(
                scan_body, None, jnp.arange(nb_local, dtype=jnp.int32)
            )
            # replicate the per-block suspect vector (P("b") output
            # shards would be unfetchable on a multi-controller mesh)
            sus_full = jax.lax.psum(
                jnp.zeros((n_blocks,), jnp.int32)
                .at[d * nb_local + jnp.arange(nb_local)].set(nsus),
                "b",
            )
            return vals, sus_full

        _t0 = _time.time()
        vals_cached, sus_vec = jax.jit(shard_map(
            compute_body, mesh=flat_mesh, in_specs=arr_specs,
            out_specs=(P("b"), P()), check_vma=False,
        ))(*arrays)
        sus_np = np.asarray(sus_vec)          # (m^3,) per-block counts
        stats["suspect_cells"] = int(sus_np.sum())
        if stage_times is not None:
            stage_times["compute_s"] = round(_time.time() - _t0, 2)

        # ---- escalate offending blocks (single-controller) ----------- #
        offenders = [int(q) for q in np.nonzero(sus_np)[0]]
        corr = None
        corr_qs = []
        if offenders and certify:
            if single_controller and method == "nn":
                margin_max = (n_total - n_grid) // 2
                cell_total = box / n_total
                fixed = []
                for q in offenders:
                    v_esc, left = run_streamed._escalate_block(
                        particles, q, m, n_grid, margin_cells,
                        margin_max, cell_total, quantity, exact,
                        device=devs[q // nb_local],
                    )
                    stats["escalated_blocks"] += 1
                    stats["uncertified_cells"] += left
                    fixed.append(np.asarray(v_esc, np.float32))
                corr = jnp.asarray(np.stack(fixed))   # (n_corr, C, n^3)
                corr_qs = offenders
            else:
                import warnings

                warnings.warn(
                    f"{int(sus_np.sum())} cells in {len(offenders)} "
                    f"blocks could not be margin-certified "
                    f"(margin_cells={margin_cells}); escalation needs "
                    f"single-controller NN — rerun with a larger "
                    f"margin_cells or on one controller.",
                    stacklevel=2,
                )

        # ---- per-batch: local matmul + one psum + finish -------------- #
        def make_accum(B, n_corr):
            def body(s_re, s_im, betas, vals, *corr_args):
                d = jax.lax.axis_index("b")
                s_re_l = jax.lax.dynamic_slice(
                    s_re, (jnp.int32(0), d * nb_local), (B, nb_local)
                )
                s_im_l = jax.lax.dynamic_slice(
                    s_im, (jnp.int32(0), d * nb_local), (B, nb_local)
                )
                v = vals.reshape(nb_local, -1)
                acc_re = jax.lax.psum(s_re_l @ v, "b")
                acc_im = jax.lax.psum(s_im_l @ v, "b")
                if n_corr:
                    corr_v, cs_re, cs_im = corr_args
                    c = corr_v.reshape(n_corr, -1)
                    acc_re = acc_re + cs_re @ c
                    acc_im = acc_im + cs_im @ c
                acc_re = acc_re.reshape(B, n_ch, n_grid**3)
                acc_im = acc_im.reshape(B, n_ch, n_grid**3)
                return _finish_unrolled(acc_re, acc_im, betas, B)

            specs = (P(), P(), P(), P("b"))
            if n_corr:
                specs = specs + (P(), P(), P())
            return jax.jit(shard_map(
                body, mesh=flat_mesh, in_specs=specs,
                out_specs=(P(), P(), P()), check_vma=False,
            ))

        def s_matrix(batch):
            qs = np.arange(n_blocks)
            qv = np.stack([qs // (m * m), (qs // m) % m, qs % m],
                          axis=1).astype(np.float64)
            s = np.exp(-2j * np.pi
                       * (batch.astype(np.float64) @ qv.T) / m) / m**1.5
            if corr_qs:
                sc = s[:, corr_qs].copy()
                s[:, corr_qs] = 0.0       # cache column replaced
            else:
                sc = None
            return (jnp.asarray(s.real, jnp.float32),
                    jnp.asarray(s.imag, jnp.float32),
                    None if sc is None else (
                        jnp.asarray(sc.real, jnp.float32),
                        jnp.asarray(sc.imag, jnp.float32),
                    ))

        _t0 = _time.time()
        runners = {}
        i = 0
        while i < len(betas_np):
            batch = betas_np[i:i + beta_batch]
            B = len(batch)
            key = (B, len(corr_qs))
            if key not in runners:
                runners[key] = make_accum(B, len(corr_qs))
            s_re, s_im, sc = s_matrix(batch)
            args = (s_re, s_im, jnp.asarray(batch), vals_cached)
            if corr_qs:
                args = args + (corr, sc[0], sc[1])
            k, psum, nsamp = runners[key](*args)
            spectra.extend(_emit(batch, np.asarray(k), psum, nsamp))
            i += beta_batch
        if stage_times is not None:
            stage_times["batches_s"] = round(_time.time() - _t0, 2)
            stage_times.update(stats)
        return SpectrumList(spectra)

    # ------- no-cache fallback: fused compute+accumulate per batch ---- #
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
            k, ps, ns = _finish_unrolled(acc_re, acc_im, betas, B)
            return k, ps, ns, sus

        return jax.jit(shard_map(
            body, mesh=flat_mesh, in_specs=(P(),) + arr_specs,
            out_specs=(P(), P(), P(), P()), check_vma=False,
        ))

    runners = {}
    sus_total = None
    i = 0
    while i < len(betas_np):
        batch = betas_np[i:i + beta_batch]
        B = len(batch)
        if B not in runners:
            runners[B] = make_runner(B)
        k, psum, nsamp, sus = runners[B](jnp.asarray(batch), *arrays)
        if sus_total is None:
            # blocks are recomputed identically per batch — the first
            # batch's count IS the per-sweep total
            sus_total = int(np.asarray(sus).max())
        spectra.extend(_emit(batch, np.asarray(k), psum, nsamp))
        i += beta_batch
    stats["suspect_cells"] = sus_total or 0
    if stage_times is not None:
        stage_times.update(stats)
    if sus_total:
        import warnings

        warnings.warn(
            f"{sus_total} cells could not be margin-certified "
            f"(assigned neighbor at/beyond margin_cells={margin_cells}); "
            f"the uncached distributed sweep cannot escalate per block "
            f"— rerun with cache_values=True, a larger margin_cells, or "
            f"the single-chip certified streamed_folded_sweep.",
            stacklevel=2,
        )
    return SpectrumList(spectra)
