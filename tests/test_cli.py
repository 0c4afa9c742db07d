"""End-to-end CLI tests on the 8-device CPU mesh: plan -> folded sweep ->
Pk.txt accumulation -> resume (reference entry-point behavior,
scripts/parallel_optimized.py)."""
import os

import numpy as np
import jax
import pytest

from vpower_tpu import save_snapshot, synthetic_particles
from vpower_tpu.run.cli import build_parser, main


@pytest.fixture()
def snapshot(tmp_path):
    p = synthetic_particles(jax.random.PRNGKey(0), 16, jitter=0.4)
    path = str(tmp_path / "snap.hdf5")
    save_snapshot(path, p)
    return path


def test_cli_full_run_and_resume(tmp_path, snapshot):
    out = str(tmp_path / "out")
    os.makedirs(out)
    rc = main(["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f",
               "--method", "ngp"])
    assert rc == 0
    pk = np.loadtxt(os.path.join(out, "Pk.txt"))
    assert pk.shape[1] == 4
    assert pk[:, 3].sum() > 0  # Nsample accumulated over 8 betas
    # full m^3 sweep covers every mode of the 32^3 lattice inside the
    # Nyquist sphere (~pi/6 of the cube; corners fall outside the shells)
    assert 0.4 * 32**3 < pk[:, 3].sum() < 0.6 * 32**3

    # resume: nothing recomputed, Pk.txt unchanged
    before = pk.copy()
    rc = main(["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f"])
    assert rc == 0
    after = np.loadtxt(os.path.join(out, "Pk.txt"))
    np.testing.assert_array_equal(after, before)


def test_cli_single_chip_unfolded(tmp_path, snapshot):
    out = str(tmp_path / "out1")
    os.makedirs(out)
    rc = main(["-i", snapshot, "-o", out, "-N", "16", "-f", "--single-chip",
               "--method", "cic", "--quantity", "velocity"])
    assert rc == 0
    pk = np.loadtxt(os.path.join(out, "Pk.txt"))
    assert pk[:, 3].sum() > 0


def test_cli_beta_subsample(tmp_path, snapshot):
    out = str(tmp_path / "outs")
    os.makedirs(out)
    rc = main(["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f",
               "--betas", "3", "--seed", "7"])
    assert rc == 0
    done = open(os.path.join(out, "betas_done.txt")).read().strip().split("\n")
    assert len(done) == 3


def test_parser_defaults():
    args = build_parser().parse_args(["-i", "a", "-o", "b"])
    assert args.ntot == 1000 and args.quantity == "momentum"


def test_cli_crash_resume_no_double_count(tmp_path, snapshot):
    """A crash between the sub-spectrum commit and the Pk.txt derivation
    must not double-count the beta on resume (ADVICE round 1, medium):
    simulate by deleting the derived files after a partial run."""
    out = str(tmp_path / "outc")
    os.makedirs(out)
    rc = main(["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f",
               "--method", "ngp"])
    assert rc == 0
    complete = np.loadtxt(os.path.join(out, "Pk.txt"))
    # crash simulation: derived files lost/stale, commit points intact
    os.remove(os.path.join(out, "Pk.txt"))
    os.remove(os.path.join(out, "betas_done.txt"))
    rc = main(["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f",
               "--method", "ngp"])
    assert rc == 0
    rebuilt = np.loadtxt(os.path.join(out, "Pk.txt"))
    np.testing.assert_array_equal(rebuilt, complete)


def test_cli_streamed_folded_velocity(tmp_path, snapshot):
    """Folded VELOCITY via the CLI streams blocks at O(n_grid^3) and
    matches the unfolded velocity spectrum (full m^3 sweep)."""
    out = str(tmp_path / "outv")
    os.makedirs(out)
    rc = main(["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f",
               "--method", "cic", "--quantity", "velocity",
               "--beta-batch", "3"])
    assert rc == 0
    pk = np.loadtxt(os.path.join(out, "Pk.txt"))
    out2 = str(tmp_path / "outv_ref")
    os.makedirs(out2)
    rc = main(["-i", snapshot, "-o", out2, "-N", "32", "-f", "--single-chip",
               "--method", "cic", "--quantity", "velocity"])
    assert rc == 0
    ref = np.loadtxt(os.path.join(out2, "Pk.txt"))
    n = min(len(pk), len(ref))
    np.testing.assert_array_equal(pk[:n, 3], ref[:n, 3])
    np.testing.assert_allclose(pk[:n, 2], ref[:n, 2], rtol=2e-4)
    # resume is a no-op
    before = pk.copy()
    rc = main(["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f",
               "--method", "cic", "--quantity", "velocity"])
    assert rc == 0
    np.testing.assert_array_equal(np.loadtxt(os.path.join(out, "Pk.txt")),
                                  before)


def test_cli_streamed_folded_nn(tmp_path, snapshot):
    """Folded NN runs route through the streamed pipeline (round 1
    materialized the full grid)."""
    out = str(tmp_path / "outn")
    os.makedirs(out)
    rc = main(["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f",
               "--method", "nn", "--quantity", "velocity", "--margin", "8"])
    assert rc == 0
    pk = np.loadtxt(os.path.join(out, "Pk.txt"))
    assert pk[:, 3].sum() > 0


def test_cli_streamed_folded_nn_exact(tmp_path, snapshot):
    """--exact routes the streamed NN blocks through the provably-exact
    window sweep (reference library eps=0 semantics from the production
    entry point — beyond the reference CLI's approximate Annoy)."""
    out = str(tmp_path / "outx")
    os.makedirs(out)
    rc = main(["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f",
               "--method", "nn", "--quantity", "velocity", "--margin", "8",
               "--exact", "--single-chip"])
    assert rc == 0
    pk = np.loadtxt(os.path.join(out, "Pk.txt"))
    assert pk[:, 3].sum() > 0


def test_cli_folded_sph_streams(tmp_path, snapshot):
    """Folded sph runs through the block-streamed pipeline (round-1
    rejected it; the streamed scatter now supports sph footprints)."""
    out = str(tmp_path / "outsph")
    os.makedirs(out)
    rc = main(["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f",
               "--method", "sph", "--quantity", "velocity"])
    assert rc == 0
    pk = np.loadtxt(os.path.join(out, "Pk.txt"))
    assert np.isfinite(pk).all() and pk.shape[1] == 4


def test_cli_streamed_mesh_matches_single_chip(tmp_path, snapshot):
    """The canonical folded-velocity NN run through the CLI on the
    8-device mesh writes the same Pk.txt as the forced single-chip run
    (VERDICT r2 item 2: a pod user must get the mesh, with identical
    results)."""
    base = ["-i", snapshot, "-N", "32", "-M", "16", "-f",
            "--method", "nn", "--quantity", "velocity", "--margin", "8",
            "--beta-batch", "4"]
    out_mesh = str(tmp_path / "mesh")
    os.makedirs(out_mesh)
    assert main(base + ["-o", out_mesh]) == 0
    out_one = str(tmp_path / "one")
    os.makedirs(out_one)
    assert main(base + ["-o", out_one, "--single-chip"]) == 0
    pk_mesh = np.loadtxt(os.path.join(out_mesh, "Pk.txt"))
    pk_one = np.loadtxt(os.path.join(out_one, "Pk.txt"))
    np.testing.assert_array_equal(pk_mesh[:, 3], pk_one[:, 3])
    np.testing.assert_allclose(pk_mesh[:, 2], pk_one[:, 2],
                               rtol=2e-4, atol=1e-10)


def test_cli_subsample_splice(tmp_path, snapshot):
    """--betas subsample runs also write Pk_full.txt: unfolded coarse
    low-k spliced with the folded high-k (reference recipe,
    vpower/spctrm.py:142-166).  The splice must agree with the full
    m^3 sweep within beta-sampling noise."""
    out_sub = str(tmp_path / "sub")
    os.makedirs(out_sub)
    base = ["-N", "32", "-M", "16", "-f", "--method", "cic",
            "--quantity", "velocity", "--single-chip"]
    rc = main(["-i", snapshot, "-o", out_sub, "--betas", "4", "--seed", "3"]
              + base)
    assert rc == 0
    full_path = os.path.join(out_sub, "Pk_full.txt")
    assert os.path.isfile(full_path)
    spliced = np.loadtxt(full_path)
    assert np.isfinite(spliced).all()
    # low-k coverage restored: bins down to kmin=2*pi/L are sampled
    assert spliced[0, 3] > 0

    out_full = str(tmp_path / "full")
    os.makedirs(out_full)
    rc = main(["-i", snapshot, "-o", out_full] + base)
    assert rc == 0
    ref = np.loadtxt(os.path.join(out_full, "Pk.txt"))
    # overlap band: compare band-averaged P where both are sampled
    n = min(len(spliced), len(ref))
    s, r = spliced[:n], ref[:n]
    both = (s[:, 3] > 0) & (r[:, 3] > 0)
    ps = np.average(s[both, 1], weights=s[both, 3])
    pr = np.average(r[both, 1], weights=r[both, 3])
    assert abs(ps - pr) / pr < 0.35, (ps, pr)


def test_cli_interlace_compensate_folded(tmp_path, snapshot):
    """--interlace/--compensate through the CLI on a FOLDED momentum
    run (fused-fold pipeline; BASELINE.md "folded/interlaced" ceiling):
    runs, resumes, and differs from the uncorrected run at high k."""
    out = str(tmp_path / "outil")
    os.makedirs(out)
    base = ["-i", snapshot, "-N", "32", "-M", "16", "-f", "--method",
            "cic", "--quantity", "momentum", "--single-chip"]
    rc = main(base + ["-o", out, "--interlace", "--compensate"])
    assert rc == 0
    pk = np.loadtxt(os.path.join(out, "Pk.txt"))
    assert np.isfinite(pk).all() and pk[:, 3].sum() > 0
    out0 = str(tmp_path / "outil0")
    os.makedirs(out0)
    assert main(base + ["-o", out0]) == 0
    pk0 = np.loadtxt(os.path.join(out0, "Pk.txt"))
    n = min(len(pk), len(pk0))
    np.testing.assert_array_equal(pk[:n, 3], pk0[:n, 3])
    assert pk[n - 1, 2] > pk0[n - 1, 2]  # compensation boosts high k

    # unsupported combinations are rejected up front
    outv = str(tmp_path / "outil_v")
    os.makedirs(outv)
    rc = main(["-i", snapshot, "-o", outv, "-N", "32", "-M", "16", "-f",
               "--method", "cic", "--quantity", "velocity",
               "--interlace", "--single-chip"])
    assert rc == 1  # folded velocity streams; no window correction
    rc = main(["-i", snapshot, "-o", outv, "-N", "16", "-f",
               "--method", "nn", "--interlace", "--single-chip"])
    assert rc == 1  # gather deposition has no window


class _Routed(Exception):
    """Sentinel raised by the pipeline stubs below: carries which
    pipeline the CLI dispatched to, without paying for the run."""

    def __init__(self, kind):
        self.kind = kind


@pytest.mark.parametrize("method", ["ngp", "cic", "nn", "sph"])
@pytest.mark.parametrize("quantity", ["velocity", "momentum", "energy"])
def test_cli_routing_matches_plan(tmp_path, snapshot, monkeypatch,
                                  method, quantity):
    """For EVERY (method x quantity) folded combination, the pipeline
    the CLI executes is the one the confirmed plan predicted
    (planner-owned ``streamed_pipeline``; VERDICT r3 weak #3 caught
    folded SPH momentum planned fused but executed streamed)."""
    from vpower_tpu.parallel.planner import plan_run, streamed_pipeline
    from vpower_tpu.run import pipeline as pipeline_mod
    from vpower_tpu.run import streamed as streamed_mod

    def _stub(kind):
        def fn(*a, **k):
            raise _Routed(kind)
        return fn

    monkeypatch.setattr(
        streamed_mod, "streamed_folded_sweep", _stub("streamed"))
    monkeypatch.setattr(
        pipeline_mod, "fused_fold_spectrum", _stub("fused"))

    out = str(tmp_path / "out_route")
    os.makedirs(out)
    argv = ["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f",
            "--method", method, "--quantity", quantity, "--single-chip"]
    with pytest.raises(_Routed) as exc:
        main(argv)
    executed = exc.value.kind

    plan = plan_run(n_total=32, n_devices=1, n_particles=16**3,
                    max_n_grid=16, method=method, quantity=quantity)
    predicted = "streamed" if plan.streamed else "fused"
    assert executed == predicted
    assert plan.streamed == streamed_pipeline(method, quantity,
                                              plan.fold_m)


def test_cli_block_cache_dir(tmp_path, snapshot):
    """--block-cache spills streamed block values to disk; a second run
    with the same cache reproduces the spectra from the stored blocks."""
    out = str(tmp_path / "outbc")
    bc = str(tmp_path / "bcache")
    os.makedirs(out)
    rc = main(["-i", snapshot, "-o", out, "-N", "32", "-M", "16", "-f",
               "--method", "cic", "--quantity", "velocity",
               "--single-chip", "--block-cache", bc])
    assert rc == 0
    blocks = [f for f in os.listdir(bc) if f.startswith("block_")]
    assert len(blocks) == 8  # m=2
    pk = np.loadtxt(os.path.join(out, "Pk.txt"))
    out2 = str(tmp_path / "outbc2")
    os.makedirs(out2)
    rc = main(["-i", snapshot, "-o", out2, "-N", "32", "-M", "16", "-f",
               "--method", "cic", "--quantity", "velocity",
               "--single-chip", "--block-cache", bc])
    assert rc == 0
    np.testing.assert_allclose(
        np.loadtxt(os.path.join(out2, "Pk.txt")), pk, rtol=1e-6)
