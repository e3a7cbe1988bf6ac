"""AST-level duplicate-``def`` guard (VERDICT r10 ask #3).

The ``@_q`` registry already raises on a duplicate ENTRY name
(test_entry_contract.test_duplicate_registration_raises), but a bare
module-level ``def`` — the plan-builder helpers the registered entries
call — silently shadows an earlier one under Python's last-wins
semantics.  Two incidents of this class have occurred (r5 shared
fragments; r10's sessionize extraction, where a broad ``str.replace``
left one builder's body under another builder's name and only the
oracle differential caught the numeric divergence).  This test fails
at the point of introduction instead: no module-level function or
class name may be defined twice in any package module or test helper.

Scope: every ``.py`` under graphql_api_etl_spark/ plus the repo-root
entry/bench scripts.  Only MODULE-level definitions are checked —
nested defs (closures, per-entry helpers) are naturally scoped and
``if TYPE_CHECKING``/try-except fallback redefinitions would be
module-level too, so any legitimate conditional redefinition must use
a distinct name or an assignment instead.
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _module_level_duplicates(path: str) -> list[str]:
    tree = ast.parse(open(path, encoding="utf-8").read(), filename=path)
    seen: dict[str, int] = {}
    dups: list[str] = []
    for node in tree.body:  # module level only — no ast.walk
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen:
                dups.append(
                    f"{os.path.relpath(path, REPO)}:{node.lineno} "
                    f"redefines {node.name!r} (first def at line {seen[node.name]})"
                )
            else:
                seen[node.name] = node.lineno
    return dups


def _source_files() -> list[str]:
    files = [os.path.join(REPO, "__spark_entry__.py"), os.path.join(REPO, "bench.py")]
    for dirpath, _dirs, names in os.walk(os.path.join(REPO, "graphql_api_etl_spark")):
        files.extend(os.path.join(dirpath, n) for n in names if n.endswith(".py"))
    return sorted(files)


def test_no_module_level_function_is_defined_twice():
    problems: list[str] = []
    for path in _source_files():
        problems.extend(_module_level_duplicates(path))
    assert problems == [], "shadowed module-level defs:\n" + "\n".join(problems)


def test_guard_catches_a_shadowed_def(tmp_path):
    """The guard itself must trip on the incident shape: two
    module-level defs with the same name, different bodies."""
    p = tmp_path / "shadowed.py"
    p.write_text("def build(x):\n    return x + 1\n\ndef build(x):\n    return x - 1\n")
    dups = _module_level_duplicates(str(p))
    assert len(dups) == 1 and "redefines 'build'" in dups[0]
