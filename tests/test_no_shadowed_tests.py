"""Duplicate-test-name guard (VERDICT r5 ask #3 / ADVICE r5).

A module that defines the same ``test_*`` function name twice silently
rebinds it: pytest collects only the LAST def, the earlier one becomes
dead code, and the suite still reports green — exactly what happened to
tests/test_streaming.py's first ``test_cms_sketch_state_survives_restart``
in round 5. This meta-test ast-parses every test module and fails on any
top-level (or class-level) ``test_*`` name bound more than once, so a
shadowed test can never pass CI again.
"""

from __future__ import annotations

import ast
import glob
import os


def _dupes_in(tree: ast.Module) -> list[str]:
    out: list[str] = []

    def scan(body, prefix: str) -> None:
        seen: dict[str, int] = {}
        for node in body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if node.name.startswith("test_"):
                    key = f"{prefix}{node.name}"
                    if key in seen:
                        out.append(f"{key} (lines {seen[key]} and "
                                   f"{node.lineno})")
                    seen[key] = node.lineno
            elif isinstance(node, ast.ClassDef):
                scan(node.body, f"{prefix}{node.name}.")

    scan(tree.body, "")
    return out


def test_no_test_name_is_shadowed():
    here = os.path.dirname(os.path.abspath(__file__))
    bad: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(here, "test_*.py"))):
        with open(path) as fh:
            dupes = _dupes_in(ast.parse(fh.read(), filename=path))
        if dupes:
            bad[os.path.basename(path)] = dupes
    assert not bad, f"shadowed (duplicate) test names: {bad}"
