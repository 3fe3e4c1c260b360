"""Minimal pyflakes stand-in: report imports never referenced in the
module (including inside nested scopes — conservative: any Name/Attribute
use anywhere in the file counts).  Used locally because pyflakes is not in
this image; CI runs the real pyflakes."""
from __future__ import annotations

import ast
import sys
from pathlib import Path


def check(path: Path) -> list[str]:
    tree = ast.parse(path.read_text())
    imported: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif (isinstance(node, ast.Assign) and
              any(isinstance(t, ast.Name) and t.id == "__all__"
                  for t in node.targets)):
            for el in ast.walk(node.value):
                if isinstance(el, ast.Constant) and isinstance(el.value, str):
                    used.add(el.value)
    out = []
    for name, line in sorted(imported.items(), key=lambda kv: kv[1]):
        if name not in used and name != "__future__":
            out.append(f"{path}:{line}: unused import '{name}'")
    return out


def main() -> int:
    roots = sys.argv[1:] or ["libff_tpu", "tests", "profile", "bench.py",
                             "__graft_entry__.py", "scripts"]
    bad = []
    for r in roots:
        p = Path(r)
        files = [p] if p.is_file() else sorted(p.rglob("*.py"))
        for f in files:
            bad += check(f)
    print("\n".join(bad))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
