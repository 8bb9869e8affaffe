"""Generate the per-symbol API reference (docs/api/*.md) from docstrings.

The reference ships a lazydocs-generated API reference
(/root/reference/docs/{diffusion,flow,symplectic}.md); this is the
equivalent generator for flowfusion_tpu — every public module, class,
method, and function, with its signature and full docstring, one page
per top-level module group.

Run from the repo root (CPU is fine; imports are device-free):

    JAX_PLATFORMS=cpu python docs/make_api.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODULE_GROUPS = {
    "api/models.md": [
        "flowfusion_tpu.models.nets",
        "flowfusion_tpu.models.score",
        "flowfusion_tpu.models.flow",
        "flowfusion_tpu.models.symplectic",
        "flowfusion_tpu.models.population",
    ],
    "api/ops.md": [
        "flowfusion_tpu.ops.sde",
        "flowfusion_tpu.ops.losses",
        "flowfusion_tpu.ops.trace",
    ],
    "api/integrate.md": [
        "flowfusion_tpu.ops.integrate",
        "flowfusion_tpu.ops.integrate.adaptive",
        "flowfusion_tpu.ops.integrate.fixed",
        "flowfusion_tpu.ops.integrate.multistep",
        "flowfusion_tpu.ops.integrate.adjoint",
        "flowfusion_tpu.ops.integrate.dpm",
    ],
    "api/parallel.md": [
        "flowfusion_tpu.parallel.sharding",
        "flowfusion_tpu.parallel.autoshard",
        "flowfusion_tpu.parallel.distributed",
    ],
    "api/kernels.md": [
        "flowfusion_tpu.kernels.fused_mlp",
        "flowfusion_tpu.kernels.em_sampler",
        "flowfusion_tpu.kernels.fused_train",
    ],
    "api/utils.md": [
        "flowfusion_tpu.train",
        "flowfusion_tpu.utils.data",
        "flowfusion_tpu.utils.checkpoint",
        "flowfusion_tpu.utils.convert",
        "flowfusion_tpu.utils.serving",
        "flowfusion_tpu.utils.stats",
        "flowfusion_tpu.utils.diagnostics",
        "flowfusion_tpu.utils.native_loader",
        "flowfusion_tpu.cli",
    ],
}


def _public_names(mod):
    if hasattr(mod, "__all__"):
        return list(mod.__all__)
    return [
        n
        for n, obj in vars(mod).items()
        if not n.startswith("_")
        and (inspect.isclass(obj) or inspect.isfunction(obj))
        and getattr(obj, "__module__", None) == mod.__name__
    ]


def _sig(obj) -> str:
    import re

    try:
        sig = str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"
    # memory addresses in default-value reprs are run-dependent noise
    # (e.g. "<function _rms_norm at 0x7f...>"); strip them so the output
    # is deterministic and the committed pages can be sync-checked.
    return re.sub(r"<function ([\w.]+) at 0x[0-9a-f]+>", r"\1", sig)


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else "*(no docstring)*"


def _method_doc(cls, mname: str, func) -> str:
    """Docstring of a method, inherited through the MRO when the override
    itself has none (the SDE subclasses override documented base methods)."""
    d = inspect.getdoc(func)
    if d:
        return d.strip()
    for base in cls.__mro__[1:]:
        base_m = base.__dict__.get(mname)
        if base_m is not None:
            base_func = (
                base_m.__func__
                if isinstance(base_m, (classmethod, staticmethod))
                else base_m
            )
            bd = inspect.getdoc(base_func)
            if bd:
                return bd.strip() + f"\n\n*(inherited from `{base.__name__}`)*"
    return "*(no docstring)*"


def _render_function(name: str, obj, level: int) -> list[str]:
    h = "#" * level
    return [f"{h} `{name}{_sig(obj)}`", "", _doc(obj), ""]


def _render_class(name: str, cls) -> list[str]:
    out = [f"### `{name}`", "", _doc(cls), ""]
    # dataclass fields are the constructor surface for the pytree models
    fields = getattr(cls, "__dataclass_fields__", None)
    if fields:
        import dataclasses as dc

        rows = []
        for fname, f in fields.items():
            if f.default is not dc.MISSING:
                rows.append(f"| `{fname}` | `{f.default!r}` |")
            elif f.default_factory is not dc.MISSING:
                rows.append(f"| `{fname}` | `{f.default_factory()!r}` |")
            else:
                rows.append(f"| `{fname}` | — |")
        out += ["| field | default |", "|---|---|", *rows, ""]
    for mname, m in sorted(vars(cls).items()):
        if mname.startswith("_"):
            continue
        func = m.__func__ if isinstance(m, (classmethod, staticmethod)) else m
        if inspect.isfunction(func):
            out += [
                f"#### `{name}.{mname}{_sig(func)}`",
                "",
                _method_doc(cls, mname, func),
                "",
            ]
    return out


def render_module(modname: str) -> list[str]:
    mod = importlib.import_module(modname)
    out = [f"## `{modname}`", ""]
    head = _doc(mod)
    if head != "*(no docstring)*":
        out += [head, ""]
    for name in _public_names(mod):
        obj = getattr(mod, name, None)
        if obj is None:
            continue
        if inspect.isclass(obj):
            out += _render_class(name, obj)
        elif inspect.isfunction(obj):
            out += _render_function(name, obj, 3)
    return out


def main() -> None:
    root = Path(__file__).resolve().parent
    for page, mods in MODULE_GROUPS.items():
        path = root / page
        path.parent.mkdir(parents=True, exist_ok=True)
        lines = [
            f"# API reference: {page.split('/')[-1].removesuffix('.md')}",
            "",
            "*Generated by `docs/make_api.py` — do not edit by hand.*",
            "",
        ]
        for m in mods:
            lines += render_module(m)
        path.write_text("\n".join(lines) + "\n")
        print(f"wrote {path.relative_to(root.parent)}", file=sys.stderr)


if __name__ == "__main__":
    main()
