"""Generate the .ipynb tutorial notebooks from the example scripts.

The reference ships its 11 tutorials as Jupyter notebooks
(`/root/reference/examples/*.ipynb`); this repo's examples are
importable, CI-executed .py scripts (the durable form). This generator
emits the interactive form from the same source, so the two can never
drift: cell boundaries fall at top-level definitions, the module
docstring becomes the lead markdown cell, and the ``__main__`` guard
becomes a final ``main()`` cell.

Run: python examples/make_notebooks.py  (writes examples/*.ipynb)
"""

import ast
import glob
import json
import os
import re


def to_cells(src):
    tree = ast.parse(src)
    lines = src.splitlines(keepends=True)
    doc = ast.get_docstring(tree)
    body = list(tree.body)
    start_idx = 0
    if doc is not None:
        start_idx = 1
    # cell boundaries: each top-level class/def starts a new cell
    # (decorators included); everything else rides with its neighbor
    bounds = []
    for node in body[start_idx:]:
        ln = min([node.lineno] + [d.lineno for d in
                                  getattr(node, "decorator_list", [])])
        if isinstance(node, (ast.ClassDef, ast.FunctionDef,
                             ast.AsyncFunctionDef)):
            bounds.append(ln - 1)
    first_code = body[start_idx].lineno - 1 if len(body) > start_idx else 0
    edges = sorted({first_code, *bounds, len(lines)})
    chunks = ["".join(lines[a:b]).strip("\n")
              for a, b in zip(edges[:-1], edges[1:])]
    chunks = [c for c in chunks if c.strip()]
    # notebooks have no __file__: paths resolve from the notebook's cwd
    # (examples/), so os.path.dirname(__file__) -> "."
    chunks = [re.sub(
        r"sys\.path\.insert\(0, os\.path\.join\(os\.path\.dirname\("
        r"__file__\), \"\.\.\"\)\)",
        'sys.path.insert(0, "..")', c) for c in chunks]
    chunks = [c.replace("os.path.dirname(__file__)", '"."')
              for c in chunks]
    # the __main__ guard becomes a plain call in its own final cell
    # (the guard is not a def, so it rides at the end of the last
    # chunk; under exec __name__ != "__main__" and it would be a no-op)
    out = []
    guard = re.compile(r'\nif __name__ == "__main__":\n(.|\n)*$')
    for c in chunks:
        if c.startswith('if __name__ == "__main__":'):
            c = "main()"
        elif guard.search(c):
            c = guard.sub("", c).rstrip("\n")
            out.append(c)
            out.append("main()")
            continue
        out.append(c)
    cells = []
    if doc:
        cells.append({"cell_type": "markdown", "metadata": {},
                      "source": doc.splitlines(keepends=True)})
    for c in out:
        cells.append({"cell_type": "code", "metadata": {},
                      "execution_count": None, "outputs": [],
                      "source": c.splitlines(keepends=True)})
    return cells


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "[0-9]*.py"))):
        src = open(path).read()
        nb = {
            "cells": to_cells(src),
            "metadata": {
                "kernelspec": {"display_name": "Python 3",
                               "language": "python", "name": "python3"},
                "language_info": {"name": "python"},
            },
            "nbformat": 4,
            "nbformat_minor": 5,
        }
        out = path[:-3] + ".ipynb"
        with open(out, "w") as f:
            json.dump(nb, f, indent=1)
        print("wrote", os.path.basename(out))


if __name__ == "__main__":
    main()
