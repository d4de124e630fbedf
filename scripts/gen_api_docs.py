"""Generate the docs/API.md compiled-model section from docstrings.

ROADMAP r3 #9 (parity polish): docs/API.md is hand-maintained prose;
the CompiledModel surface drifts as the compiler grows.  This script
rewrites the block between the BEGIN/END GENERATED markers from the
live class — one row per public method, signature + first docstring
line — so the reference cannot disagree with the code.  A drift guard
(tests/test_io_aux.py::test_api_docs_compiled_model_not_drifted) fails
whenever a public-method change lands without regenerating.

Run: python scripts/gen_api_docs.py          (rewrites docs/API.md)
     python scripts/gen_api_docs.py --check  (exit 1 on drift)
"""
import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- BEGIN GENERATED: compiled-model (scripts/gen_api_docs.py) -->"
END = "<!-- END GENERATED: compiled-model -->"

API_MD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "API.md",
)

# Methods that are implementation surface rather than user API even
# though they lack a leading underscore (documented in their modules).
SKIP = {"mean_one"}


def _first_line(doc):
    if not doc:
        return ""
    line = doc.strip().split("\n\n")[0].replace("\n", " ")
    line = re.sub(r"\s+", " ", line).strip()
    return line


def _sig(fn):
    """Table-friendly signature: parameter names + simple defaults only
    (annotations dropped structurally via inspect, not by regex)."""
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return "(...)"
    parts = []
    for name, p in sig.parameters.items():
        if name == "self":
            continue
        if p.kind == inspect.Parameter.VAR_POSITIONAL:
            parts.append(f"*{name}")
        elif p.kind == inspect.Parameter.VAR_KEYWORD:
            parts.append(f"**{name}")
        elif p.default is inspect.Parameter.empty:
            parts.append(name)
        else:
            d = p.default
            rep = repr(d) if isinstance(
                d, (int, float, str, bool, type(None), frozenset)
            ) else "..."
            if isinstance(d, frozenset) and not d:
                rep = "frozenset()"
            parts.append(f"{name}={rep}")
    return "(" + ", ".join(parts) + ")"


def generated_section():
    from brancher_tpu.compiler import CompiledModel

    rows = []
    for name, fn in inspect.getmembers(CompiledModel):
        if name.startswith("_") or name in SKIP:
            continue
        if isinstance(inspect.getattr_static(CompiledModel, name), property):
            rows.append((name, "(property)",
                         _first_line(fn.__doc__ if hasattr(fn, "__doc__") else "")))
            continue
        if not callable(fn):
            continue
        rows.append((name, _sig(fn), _first_line(fn.__doc__)))
    rows.sort()
    lines = [BEGIN, "", "| Method | Summary |", "|---|---|"]
    for name, sig, doc in rows:
        doc = doc.replace("|", "\\|")
        sig = sig.replace("|", "\\|")
        lines.append(f"| `{name}{sig}` | {doc} |")
    lines += ["", END]
    return "\n".join(lines)


def render(text):
    pre, rest = text.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    return pre + generated_section() + post


def main():
    with open(API_MD) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        raise SystemExit(f"markers not found in {API_MD}")
    new = render(text)
    if "--check" in sys.argv:
        if new != text:
            sys.stderr.write(
                "docs/API.md compiled-model section is stale; "
                "run python scripts/gen_api_docs.py\n"
            )
            raise SystemExit(1)
        print("docs/API.md compiled-model section is current")
        return
    if new != text:
        with open(API_MD, "w") as f:
            f.write(new)
        print(f"rewrote generated section in {API_MD}")
    else:
        print("no changes")


if __name__ == "__main__":
    main()
