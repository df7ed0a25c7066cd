#!/usr/bin/env python
"""Generate docs/api.md from the package's live public surface.

Walks ``densityflows_tpu.__all__`` (grouped by defining module) plus the
subsystem modules' ``__all__``, and emits one line per symbol from the
first sentence of its docstring — so the API reference cannot drift from
the code. Run after adding/renaming public symbols:

    python tools/render_api.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# section title → (module path, restrict-to-names or None)
SECTIONS = [
    ("Data pipeline", "densityflows_tpu.data", None),
    ("Axes & masking", "densityflows_tpu.axes", None),
    ("Ops (kernels & oracles)", "densityflows_tpu.ops.coupling", None),
    ("Ops: conditioner MLPs", "densityflows_tpu.ops.mlp", None),
    ("Ops: MADE", "densityflows_tpu.ops.made", None),
    ("Ops: splines", "densityflows_tpu.ops.spline", None),
    ("Layers", "densityflows_tpu.models.layers", None),
    ("Layers: autoregressive", "densityflows_tpu.models.autoregressive", None),
    ("Layers: Glow family", "densityflows_tpu.models.glow", None),
    ("Layers: normalization & utility", "densityflows_tpu.models.normalization",
     None),
    ("Composition", "densityflows_tpu.models.blocks", None),
    ("Composition: chains", "densityflows_tpu.models.chains", None),
    ("Composition: embeddings", "densityflows_tpu.models.embedding", None),
    ("Base distributions", "densityflows_tpu.models.distributions", None),
    ("Flow engine", "densityflows_tpu.models.flow", None),
    ("Training", "densityflows_tpu.train", None),
    ("Ensembles", "densityflows_tpu.ensemble", None),
    ("Streaming", "densityflows_tpu.data_stream", None),
    ("Inference engine", "densityflows_tpu.inference", None),
    ("Parallelism: mesh & placement", "densityflows_tpu.parallel.mesh", None),
    ("Parallelism: scaling harness", "densityflows_tpu.parallel.scaling", None),
    ("Parallelism: distributed resampling",
     "densityflows_tpu.parallel.resample", None),
    ("Persistence", "densityflows_tpu.utils.checkpoint", None),
    ("Persistence: Orbax sharded backend",
     "densityflows_tpu.utils.orbax_ckpt", None),
    ("Configuration", "densityflows_tpu.utils.config", None),
    ("Observability", "densityflows_tpu.utils.logging", None),
    ("Profiling", "densityflows_tpu.utils.profiling", None),
    ("Toy datasets", "densityflows_tpu.utils.datasets", None),
]

HEADER = """# API reference

Every public symbol of `densityflows_tpu`, generated from docstrings by
`tools/render_api.py` (re-run it after changing the public surface; the
test suite's import of this file keeps it loadable). See `docs/manual.md`
for usage and the README for the reference parity map.
"""


def _first_sentence(doc: str | None) -> str:
    if not doc:
        return "(no docstring)"
    text = inspect.cleandoc(doc)
    # first paragraph, collapsed to one line
    para = text.split("\n\n")[0].replace("\n", " ").strip()
    return para


def _kind(obj) -> str:
    if inspect.isclass(obj):
        return "class"
    if callable(obj):
        return "function"
    return "value"


def render() -> str:
    out = [HEADER]
    for title, modpath, names in SECTIONS:
        mod = importlib.import_module(modpath)
        symbols = names or getattr(mod, "__all__", None)
        if not symbols:
            continue
        out.append(f"\n## {title}\n")
        out.append(f"`{modpath}`\n")
        for name in symbols:
            obj = getattr(mod, name)
            out.append(
                f"- **`{name}`** ({_kind(obj)}) — "
                f"{_first_sentence(getattr(obj, '__doc__', None))}"
            )
    return "\n".join(out) + "\n"


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    text = render()
    path = os.path.join(REPO, "docs", "api.md")
    with open(path, "w") as f:
        f.write(text)
    n = text.count("\n- ")
    print(f"wrote {path}: {n} symbols")


if __name__ == "__main__":
    main()
