"""Print the current package version (reference aux/get_version.py)."""

import pathlib
import re

VERSION_FILE = (
    pathlib.Path(__file__).resolve().parent.parent
    / "ptdeco_tpu"
    / "_version.py"
)

m = re.search(r'__version__ = "([^"]+)"', VERSION_FILE.read_text())
assert m
print(m.group(1))
