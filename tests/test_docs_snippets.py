"""Every ```python fence in docs/*.md must execute (CPU, 8 virtual
devices via conftest).  The reference ships runnable tutorials
(`/root/reference/docs/*.rst`); this keeps ours honest the same way.

Fences containing the marker line ``# not-run`` are display-only
(e.g. TPU-hardware-specific timing recipes) and are skipped.
"""
import os
import re

import pytest

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")

_FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _snippets():
    out = []
    for fname in sorted(os.listdir(DOCS)):
        if not fname.endswith(".md"):
            continue
        text = open(os.path.join(DOCS, fname)).read()
        for i, m in enumerate(_FENCE.finditer(text)):
            code = m.group(1)
            if "# not-run" in code:
                continue
            out.append(pytest.param(code, id=f"{fname}#{i}"))
    return out


@pytest.mark.parametrize("code", _snippets())
def test_docs_snippet_runs(code):
    ns = {}
    exec(compile(code, "<docs snippet>", "exec"), ns)
