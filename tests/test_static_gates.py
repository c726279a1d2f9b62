"""Static gates as tests — the in-container analog of the reference's
pyflakes/mypy test modules (/root/reference/tests/test_pyflakes.py,
test_mypy.py; SURVEY §5 item 5). Neither tool ships in this container
(pip forbidden), so the gate is stdlib: every module must compile, and
an AST pass rejects unused imports (pyflakes' highest-signal check),
with side-effect registration imports exempted the way `# noqa: F401`
exempts them for pyflakes."""

from __future__ import annotations

import ast
import os
import py_compile

import pytest

PKG = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                   "nycdb_k8s_loader_spark")


def _modules() -> list[str]:
    out = []
    for root, _, files in os.walk(PKG):
        out += [os.path.join(root, f) for f in files if f.endswith(".py")]
    return sorted(out)


@pytest.mark.parametrize("path", _modules(), ids=lambda p: os.path.relpath(p, PKG))
def test_module_compiles_and_imports_are_used(path, tmp_path):
    py_compile.compile(path, cfile=str(tmp_path / "c.pyc"), doraise=True)

    src = open(path).read()
    tree = ast.parse(src)
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                imported[(a.asname or a.name).split(".")[0]] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                imported[a.asname or a.name] = node.lineno
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    lines = src.splitlines()
    unused = [
        f"{os.path.relpath(path, PKG)}:{ln}: unused import {name}"
        for name, ln in imported.items()
        if name not in used
        # string-referenced (re-exports, __all__) or noqa'd
        and f'"{name}"' not in src and f"'{name}'" not in src
        and "noqa" not in lines[ln - 1]
    ]
    assert unused == []
