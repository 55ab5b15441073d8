"""Bump a segment of ptdeco_tpu._version.__version__ (reference
aux/update_version.py semantics: argv[1] in {major, minor, patch})."""

import pathlib
import re
import sys

VERSION_FILE = (
    pathlib.Path(__file__).resolve().parent.parent
    / "ptdeco_tpu"
    / "_version.py"
)


def main() -> int:
    segment = sys.argv[1] if len(sys.argv) > 1 else "patch"
    text = VERSION_FILE.read_text()
    m = re.search(r'__version__ = "(\d+)\.(\d+)\.(\d+)"', text)
    assert m, "version string not found"
    major, minor, patch = map(int, m.groups())
    if segment == "major":
        major, minor, patch = major + 1, 0, 0
    elif segment == "minor":
        minor, patch = minor + 1, 0
    elif segment == "patch":
        patch += 1
    else:
        raise SystemExit(f"unknown segment {segment!r}")
    new = f'__version__ = "{major}.{minor}.{patch}"'
    VERSION_FILE.write_text(text.replace(m.group(0), new))
    print(f"{major}.{minor}.{patch}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
