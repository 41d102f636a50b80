#!/usr/bin/env python
"""In-repo static analysis: syntax + unused-import check over the tree.

The reference gates commits on a pre-commit lint suite and vulture dead-code
config (SURVEY.md §4 item 5); this environment has no lint packages, so this
is a dependency-free AST equivalent wired to ``make test-static``:

* every ``.py`` file must parse;
* module-level imports must be used somewhere in the file (``__init__.py``
  re-exports and lines marked ``# noqa`` are exempt);
* no file may contain merge-conflict markers or ``breakpoint()`` calls.
"""
from __future__ import annotations

import ast
import os

ROOTS = ("gisnav_tpu", "tools", "tests", "bench.py", "__graft_entry__.py")


def _used_names(tree: ast.AST) -> set:
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # climb to the root name of dotted access (jax.numpy -> jax)
            cur = node
            while isinstance(cur, ast.Attribute):
                cur = cur.value
            if isinstance(cur, ast.Name):
                used.add(cur.id)
    return used


def check_file(path: str) -> list:
    with open(path) as f:
        src = f.read()
    problems = []
    if ("<<<" "<<<<") in src or (">>>" ">>>>") in src:
        problems.append(f"{path}: merge-conflict marker")
    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    lines = src.splitlines()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "breakpoint"):
            problems.append(f"{path}:{node.lineno}: breakpoint() left in")
    if os.path.basename(path) == "__init__.py":
        return problems  # re-export surface: unused imports are the point
    used = _used_names(tree)
    # names bound by 'import x.y' are the root; by aliases the alias
    for node in tree.body:
        names = []
        if isinstance(node, ast.Import):
            names = [(a.asname or a.name.split(".")[0], a) for a in node.names]
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            names = [(a.asname or a.name, a) for a in node.names
                     if a.name != "*"]
        for bound, _ in names:
            line = lines[node.lineno - 1] if node.lineno <= len(lines) else ""
            if "noqa" in line:
                continue
            if bound not in used:
                problems.append(
                    f"{path}:{node.lineno}: unused import '{bound}'")
    return problems


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    targets = []
    for root in ROOTS:
        p = os.path.join(repo, root)
        if os.path.isfile(p):
            targets.append(p)
        else:
            for dirpath, _, files in os.walk(p):
                targets += [os.path.join(dirpath, f) for f in files
                            if f.endswith(".py")]
    problems = []
    for t in sorted(targets):
        problems += check_file(t)
    for p in problems:
        print(p)
    print(f"static check: {len(targets)} files, {len(problems)} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
