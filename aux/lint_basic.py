"""Dependency-free basic linter (this image ships no ruff/flake8/mypy;
CI installs the real tools — .github/workflows/check.yml — while `make
check` stays meaningful offline).

Checks per file (AST-based):
  * F401: imported name never used (respects __all__, `import x as x`
    re-export convention, and `# noqa` on the import line)
  * F811: duplicate top-level def/class redefinition
  * E722: bare `except:`
  * W605: invalid escape sequence (via compile warnings)

Exit code 1 if any finding.  Usage: python aux/lint_basic.py [paths...]
"""

import ast
import pathlib
import sys


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # x.y.z -> record the root name via the Name child (walk gets it)
            pass
    return used


def _exported(tree: ast.AST) -> set[str]:
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        for elt in node.value.elts:
                            if isinstance(elt, ast.Constant):
                                out.add(str(elt.value))
    return out


def lint_file(path: pathlib.Path) -> list[str]:
    src = path.read_text()
    lines = src.splitlines()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
    findings: list[str] = []
    used = _used_names(tree)
    exported = _exported(tree)
    is_init = path.name == "__init__.py"

    def noqa(lineno: int) -> bool:
        return 0 < lineno <= len(lines) and "noqa" in lines[lineno - 1]

    # F401 (module top level only — function-local imports are often
    # deliberate lazy imports)
    for node in tree.body:
        names = []
        if isinstance(node, ast.Import):
            names = [(a.asname or a.name.split(".")[0], a) for a in node.names]
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            names = [(a.asname or a.name, a) for a in node.names]
        for bound, alias in names:
            if bound == "*" or noqa(node.lineno):
                continue
            if alias.asname is not None and alias.asname == alias.name:
                continue  # `import x as x` re-export idiom
            if is_init:
                continue  # package __init__ re-exports by convention
            if bound not in used and bound not in exported:
                findings.append(
                    f"{path}:{node.lineno}: F401 '{bound}' imported but unused"
                )

    # F811 duplicate top-level definitions / E722 bare except
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen and not noqa(node.lineno):
                findings.append(
                    f"{path}:{node.lineno}: F811 redefinition of "
                    f"'{node.name}' (first at line {seen[node.name]})"
                )
            seen[node.name] = node.lineno
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            if not noqa(node.lineno):
                findings.append(f"{path}:{node.lineno}: E722 bare 'except:'")
    return findings


def main() -> int:
    roots = sys.argv[1:] or ["ptdeco_tpu", "apps", "aux", "tests", "bench.py",
                             "__graft_entry__.py"]
    files: list[pathlib.Path] = []
    for r in roots:
        p = pathlib.Path(r)
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            files.append(p)
    all_findings: list[str] = []
    for f in files:
        all_findings.extend(lint_file(f))
    for msg in all_findings:
        print(msg)
    print(f"lint_basic: {len(files)} files, {len(all_findings)} findings")
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main())
