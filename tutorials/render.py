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


def execute(path: str):
    """Run the tutorial's code cells in order; yield (kind, text, output)."""
    source = open(path).read()
    cells = parse_cells(source)
    ns: dict = {"__name__": "__main__", "__file__": os.path.abspath(path)}
    executed = []
    for kind, text in cells:
        if kind == "markdown":
            executed.append((kind, text, ""))
            continue
        code = text.strip()
        if not code:
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            exec(compile(code, path, "exec"), ns)
        executed.append((kind, code, buf.getvalue().rstrip()))
    return executed


def render(path: str, ipynb: bool = False) -> str:
    executed = execute(path)
    out_md = []
    for kind, text, printed in executed:
        if kind == "markdown":
            out_md.append(strip_md(text))
            continue
        out_md.append(f"```python\n{text}\n```")
        if printed:
            out_md.append(f"```text\n{printed}\n```")
    md_path = os.path.splitext(path)[0] + ".md"
    with open(md_path, "w") as f:
        f.write("\n\n".join(out_md) + "\n")
    if ipynb:
        return render_ipynb(path, executed)
    return md_path


def render_ipynb(path: str, executed=None) -> str:
    """Write an EXECUTED jupyter notebook (nbformat v4) next to the
    tutorial — the reference ships its example gallery as notebooks with
    stored outputs, so the rebuild does too (ROADMAP r3 #9)."""
    import nbformat

    if executed is None:
        executed = execute(path)
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "name": "python3", "display_name": "Python 3", "language": "python",
    }
    count = 0
    for kind, text, printed in executed:
        if kind == "markdown":
            nb.cells.append(nbformat.v4.new_markdown_cell(strip_md(text)))
            continue
        count += 1
        cell = nbformat.v4.new_code_cell(text, execution_count=count)
        if printed:
            cell.outputs = [nbformat.v4.new_output(
                "stream", name="stdout", text=printed + "\n"
            )]
        nb.cells.append(cell)
    nb_path = os.path.splitext(path)[0] + ".ipynb"
    nbformat.write(nb, nb_path)
    return nb_path


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ipynb = "--ipynb" in sys.argv[1:]
    if not args:
        args = sorted(
            os.path.join(here, f) for f in os.listdir(here)
            if f.endswith(".py") and f[0].isdigit()
        )
    for p in args:
        print(f"rendering {p} ...", file=sys.stderr, flush=True)
        print("wrote", render(p, ipynb=ipynb), file=sys.stderr)
