"""Generate ``docs/reference.md`` — the full API reference — from the
package's public symbols and docstrings (the TPU rebuild's equivalent of
the reference's Sphinx/readthedocs site, ``/root/reference/docs/``).

Run: ``python docs/generate_api.py`` (CPU; imports the package).
"""
import importlib
import inspect
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

MODULES = [
    ("vpower_tpu", "Top-level package"),
    ("vpower_tpu.core.particles", "Particle container"),
    ("vpower_tpu.core.field", "Gridded fields"),
    ("vpower_tpu.io.snapshot", "Snapshot I/O"),
    ("vpower_tpu.io.synthetic", "Synthetic workloads"),
    ("vpower_tpu.io.checkpoint", "Checkpoints"),
    ("vpower_tpu.io.bricks", "Out-of-core bricks"),
    ("vpower_tpu.io.native", "Native host runtime"),
    ("vpower_tpu.deposit.scatter", "Scatter deposition (NGP/CIC)"),
    ("vpower_tpu.deposit.mxu_scatter", "MXU deposit engine"),
    ("vpower_tpu.deposit.nn", "Nearest-neighbor deposition"),
    ("vpower_tpu.deposit.nn_window", "Provably-exact NN window sweep"),
    ("vpower_tpu.deposit.sph", "SPH deposition"),
    ("vpower_tpu.spectrum.power", "FFT power + shell binning"),
    ("vpower_tpu.spectrum.fold", "Folding kernels"),
    ("vpower_tpu.spectrum.spectrum", "PowerSpectrum algebra"),
    ("vpower_tpu.fft.distributed", "Distributed pencil FFT"),
    ("vpower_tpu.parallel.mesh", "Device mesh"),
    ("vpower_tpu.parallel.planner", "Run planner"),
    ("vpower_tpu.parallel.deposit", "Sharded deposition"),
    ("vpower_tpu.parallel.pipeline", "Distributed spectra"),
    ("vpower_tpu.parallel.streamed", "Block-parallel streamed sweep"),
    ("vpower_tpu.parallel.multihost", "Multi-host initialization"),
    ("vpower_tpu.run.pipeline", "End-to-end pipelines"),
    ("vpower_tpu.run.streamed", "Streamed folded sweep"),
    ("vpower_tpu.run.cli", "Command-line interface"),
    ("vpower_tpu.utils.checks", "Conservation checks"),
    ("vpower_tpu.utils.profiling", "Profiling"),
    ("vpower_tpu.utils.plotting", "Plotting"),
]


def _public_names(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None:
            continue
        home = getattr(obj, "__module__", mod.__name__)
        if inspect.ismodule(obj):
            continue
        # keep re-exports only at the package root
        if mod.__name__ != "vpower_tpu" and home != mod.__name__:
            continue
        out.append((n, obj))
    return out


def _signature(name, obj):
    target = obj
    # unwrap jit/partial wrappers to the traced function's signature
    for attr in ("__wrapped__", "func"):
        seen = set()
        while hasattr(target, attr) and id(target) not in seen:
            seen.add(id(target))
            target = getattr(target, attr)
    try:
        sig = str(inspect.signature(target))
    except (ValueError, TypeError):
        return name
    return f"{name}{sig}"


def _doc(obj):
    d = inspect.getdoc(obj)
    if not d:
        return "*(undocumented)*"
    return d


def _emit_class(fh, name, cls):
    fh.write(f"### class `{_signature(name, cls)}`\n\n")
    fh.write(_doc(cls) + "\n\n")
    for mname, m in inspect.getmembers(cls):
        if mname.startswith("_") or not callable(m):
            continue
        if inspect.getdoc(m) is None:
            continue
        # skip inherited members without overrides
        if mname not in vars(cls):
            continue
        fh.write(f"#### `{_signature(f'{name}.{mname}', m)}`\n\n")
        fh.write(_doc(m) + "\n\n")


def main():
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "reference.md")
    with open(out, "w") as fh:
        fh.write(textwrap.dedent("""\
        # API reference

        Generated from docstrings by `docs/generate_api.py` — regenerate
        after changing any public signature. Reference-counterpart
        citations (`interp.py:...`, `spctrm.py:...`,
        `parallel_optimized.py:...`) point into the upstream Vpower code
        this framework re-implements TPU-natively (see `SURVEY.md`).

        """))
        fh.write("## Contents\n\n")
        for modname, title in MODULES:
            anchor = modname.replace(".", "")
            fh.write(f"- [`{modname}`](#{anchor}) — {title}\n")
        fh.write("\n")
        for modname, title in MODULES:
            mod = importlib.import_module(modname)
            fh.write(f"\n---\n\n## `{modname}`\n\n")
            if inspect.getdoc(mod):
                fh.write(inspect.getdoc(mod) + "\n\n")
            for name, obj in _public_names(mod):
                if inspect.isclass(obj):
                    _emit_class(fh, name, obj)
                elif callable(obj):
                    fh.write(f"### `{_signature(name, obj)}`\n\n")
                    fh.write(_doc(obj) + "\n\n")
    n_lines = sum(1 for _ in open(out))
    print(f"wrote {out}: {n_lines} lines")


if __name__ == "__main__":
    main()
