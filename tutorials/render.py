"""Execute percent-format tutorials and render them to markdown.

Each tutorial is a ``# %%`` / ``# %% [markdown]`` cell script (the same
convention jupytext uses, so they open as notebooks in any IDE).  This
renderer runs the code cells in order, captures their stdout, and writes
``<name>.md`` with the outputs inlined — executable documentation in the
reference's tutorial-first spirit (SURVEY.md §2 "Examples") without a
jupyter dependency.

Usage:  python tutorials/render.py [tutorial.py ...]   (default: all)
Set TUTORIAL_FAST=1 to run with reduced iteration counts (CI mode).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_cells(source: str):
    cells = []  # (kind, text)
    kind, buf = "code", []
    for line in source.splitlines():
        if line.startswith("# %%"):
            if buf and any(s.strip() for s in buf):
                cells.append((kind, "\n".join(buf)))
            kind = "markdown" if "[markdown]" in line else "code"
            buf = []
        else:
            buf.append(line)
    if buf and any(s.strip() for s in buf):
        cells.append((kind, "\n".join(buf)))
    return cells


def strip_md(text: str) -> str:
    lines = []
    for line in text.splitlines():
        if line.startswith("# "):
            lines.append(line[2:])
        elif line.strip() == "#":
            lines.append("")
        else:
            lines.append(line)
    return textwrap.dedent("\n".join(lines)).strip()


def render(path: str) -> str:
    source = open(path).read()
    cells = parse_cells(source)
    ns: dict = {"__name__": "__main__", "__file__": os.path.abspath(path)}
    out_md = []
    for kind, text in cells:
        if kind == "markdown":
            out_md.append(strip_md(text))
            continue
        code = text.strip()
        if not code:
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            exec(compile(code, path, "exec"), ns)
        out_md.append(f"```python\n{code}\n```")
        printed = buf.getvalue().rstrip()
        if printed:
            out_md.append(f"```text\n{printed}\n```")
    md_path = os.path.splitext(path)[0] + ".md"
    with open(md_path, "w") as f:
        f.write("\n\n".join(out_md) + "\n")
    return md_path


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    args = sys.argv[1:]
    if not args:
        args = sorted(
            os.path.join(here, f) for f in os.listdir(here)
            if f.endswith(".py") and f[0].isdigit()
        )
    for p in args:
        print(f"rendering {p} ...", file=sys.stderr, flush=True)
        print("wrote", render(p), file=sys.stderr)
