"""Generate the markdown API reference from docstrings.

Counterpart of the reference's lazydocs pipeline
(``/root/reference/site/make_docs.py``): walks the public modules of
``chgnet_tpu``, emits one markdown page per module into ``docs/api/``
with class/function signatures + docstrings, and an index page. Pure
stdlib (``inspect``), no doc framework; rerun after API changes:

    python tools/make_api_docs.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # repo root for direct runs
OUT = os.path.join(REPO, "docs", "api")

MODULES = [
    "chgnet_tpu",
    "chgnet_tpu.core.lattice",
    "chgnet_tpu.core.structure",
    "chgnet_tpu.core.cif",
    "chgnet_tpu.graph.converter",
    "chgnet_tpu.graph.crystalgraph",
    "chgnet_tpu.graph.graph",
    "chgnet_tpu.graph.batching",
    "chgnet_tpu.graph.leanship",
    "chgnet_tpu.graph.builder",
    "chgnet_tpu.models.chgnet",
    "chgnet_tpu.models.layers",
    "chgnet_tpu.models.functions",
    "chgnet_tpu.models.basis",
    "chgnet_tpu.models.encoders",
    "chgnet_tpu.models.composition",
    "chgnet_tpu.models.checkpoint",
    "chgnet_tpu.ops.scatter",
    "chgnet_tpu.ops.stream_ops",
    "chgnet_tpu.ops.gated_message",
    "chgnet_tpu.simulation.calculator",
    "chgnet_tpu.simulation.relax",
    "chgnet_tpu.simulation.md",
    "chgnet_tpu.simulation.eos",
    "chgnet_tpu.simulation.observers",
    "chgnet_tpu.simulation.runtime",
    "chgnet_tpu.data.dataset",
    "chgnet_tpu.trainer.trainer",
    "chgnet_tpu.trainer.losses",
    "chgnet_tpu.parallel.dp",
    "chgnet_tpu.parallel.graph_sharded",
    "chgnet_tpu.parallel.md_sharded",
    "chgnet_tpu.parallel.relax_sharded",
    "chgnet_tpu.parallel.mesh",
    "chgnet_tpu.parallel.distributed",
    "chgnet_tpu.utils.common",
    "chgnet_tpu.utils.vasp",
    "chgnet_tpu.utils.profiling",
]


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    doc = inspect.getdoc(obj)
    return doc.strip() if doc else "*(no docstring)*"


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def render_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    moddoc = inspect.getdoc(mod)
    if moddoc:
        lines += [moddoc.strip(), ""]

    members = [
        (name, obj)
        for name, obj in inspect.getmembers(mod)
        if _is_public(name) and getattr(obj, "__module__", None) == modname
    ]
    classes = [(n, o) for n, o in members if inspect.isclass(o)]
    functions = [(n, o) for n, o in members if inspect.isfunction(o)]

    for name, cls in classes:
        lines += [f"## class `{name}{_signature(cls)}`", "", _doc(cls), ""]
        for mname, meth in inspect.getmembers(cls):
            if not _is_public(mname):
                continue
            # only methods/properties defined on THIS class
            if mname not in vars(cls):
                continue
            raw = vars(cls)[mname]
            if isinstance(raw, property):
                lines += [
                    f"### property `{name}.{mname}`",
                    "",
                    _doc(raw),
                    "",
                ]
            elif inspect.isfunction(raw) or isinstance(
                raw, (classmethod, staticmethod)
            ):
                fn = raw.__func__ if not inspect.isfunction(raw) else raw
                lines += [
                    f"### `{name}.{mname}{_signature(fn)}`",
                    "",
                    _doc(fn),
                    "",
                ]
    for name, fn in functions:
        lines += [f"## `{name}{_signature(fn)}`", "", _doc(fn), ""]
    return "\n".join(lines) + "\n"


def main() -> None:
    # docs generate against the checkout, CPU platform (no device needed)
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")

    os.makedirs(OUT, exist_ok=True)
    index = [
        "# API reference",
        "",
        "Generated from docstrings by `tools/make_api_docs.py`.",
        "",
    ]
    for modname in MODULES:
        page = modname.replace(".", "_") + ".md"
        with open(os.path.join(OUT, page), "w") as fh:
            fh.write(render_module(modname))
        index.append(f"- [`{modname}`]({page})")
    with open(os.path.join(OUT, "index.md"), "w") as fh:
        fh.write("\n".join(index) + "\n")
    print(f"wrote {len(MODULES)} module pages to {OUT}")


if __name__ == "__main__":
    main()
