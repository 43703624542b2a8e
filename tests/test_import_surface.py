"""Import-surface smoke (VERDICT r1 weak #7): every windtpu module must
import cleanly — `pytest --collect-only` misses lazy imports inside
functions, and an import-time breakage (e.g. a moved jax symbol) should
fail HERE with the module named, not deep inside a tool at runtime.

tools/ scripts are compile-checked (several are argv-driven scripts whose
import would execute them); their heavy third-party imports (TF for the
cross-framework oracle) stay call-time-gated by design.
"""

import importlib
import os
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _modules(pkg_dir, pkg_name):
    for path in sorted(pkg_dir.rglob("*.py")):
        rel = path.relative_to(pkg_dir)
        parts = (pkg_name,) + rel.with_suffix("").parts
        if parts[-1] == "__init__":
            parts = parts[:-1]
        yield ".".join(parts)


WINDTPU_MODULES = list(_modules(REPO / "windtpu", "windtpu"))


@pytest.mark.parametrize("mod", WINDTPU_MODULES)
def test_windtpu_module_imports(mod):
    importlib.import_module(mod)


def test_all_windtpu_modules_enumerated():
    # the walk found the real package, not an empty dir
    assert len(WINDTPU_MODULES) > 25


@pytest.mark.parametrize("path", sorted((REPO / "tools").glob("*.py")),
                         ids=lambda p: p.name)
def test_tool_compiles(path):
    compile(path.read_text(), str(path), "exec")


@pytest.mark.parametrize("name", ["bench.py", "__graft_entry__.py"])
def test_root_script_compiles(name):
    path = REPO / name
    compile(path.read_text(), str(path), "exec")
