"""Regenerate API.md: one line per public callable (signature + first
docstring sentence). Usage: cd /root/repo && python tools/apigen.py
"""

from __future__ import annotations

import ast
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "vettore_spark")
MAX = 160


def _sig(fn: ast.FunctionDef) -> str:
    a = fn.args
    parts = [x.arg for x in a.posonlyargs] + [x.arg for x in a.args]
    if a.vararg:
        parts.append("*" + a.vararg.arg)
    elif a.kwonlyargs:
        parts.append("*")
    parts += [x.arg for x in a.kwonlyargs]
    if a.kwarg:
        parts.append("**" + a.kwarg.arg)
    return ", ".join(parts)


def _doc(node) -> str:
    d = ast.get_docstring(node) or ""
    first = d.split("\n\n")[0].replace("\n", " ").strip()
    if len(first) > MAX:
        first = first[:MAX].rstrip() + "..."
    return first


def main() -> int:
    files = []
    for dirpath, dirnames, filenames in os.walk(PKG):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py") and f != "__init__.py":
                files.append(os.path.join(dirpath, f))
    out = [
        "# API — public surface of vettore_spark",
        "",
        "One line per public callable (signature + first docstring sentence).",
        "Generated from source docstrings; regenerate with `python tools/apigen.py`.",
        "",
    ]
    for path in files:
        rel = os.path.relpath(path, ROOT)
        tree = ast.parse(open(path).read())
        lines = []
        for node in tree.body:
            if isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
                lines.append(f"- `{node.name}({_sig(node)})` — {_doc(node)}")
            elif isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
                lines.append(f"- **class `{node.name}`** — {_doc(node)}")
                for sub in node.body:
                    if isinstance(sub, ast.FunctionDef) and not sub.name.startswith("_"):
                        lines.append(f"  - `.{sub.name}({_sig(sub)})` — {_doc(sub)}")
        if lines:
            out += ["", f"## {rel}", ""] + lines
    with open(os.path.join(ROOT, "API.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote API.md ({len(files)} modules)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
