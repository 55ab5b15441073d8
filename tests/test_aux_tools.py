"""Dev-tooling scripts (version bump/get) — reference Makefile L4 parity."""

import pathlib
import shutil
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_get_version_prints_current():
    out = subprocess.run(
        [sys.executable, str(REPO / "aux" / "get_version.py")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    parts = out.split(".")
    assert len(parts) == 3 and all(p.isdigit() for p in parts)


def test_update_version_bumps_segments(tmp_path):
    # operate on a copied tree so the repo's version file is untouched
    (tmp_path / "aux").mkdir()
    (tmp_path / "ptdeco_tpu").mkdir()
    shutil.copy(REPO / "aux" / "update_version.py", tmp_path / "aux")
    (tmp_path / "ptdeco_tpu" / "_version.py").write_text(
        '__version__ = "1.2.3"\n'
    )
    for segment, expected in (
        ("patch", "1.2.4"),
        ("minor", "1.3.0"),
        ("major", "2.0.0"),
    ):
        out = subprocess.run(
            [sys.executable, str(tmp_path / "aux" / "update_version.py"), segment],
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
        assert out == expected
    assert '__version__ = "2.0.0"' in (
        tmp_path / "ptdeco_tpu" / "_version.py"
    ).read_text()


def test_native_jpeg_rejects_truncated_files():
    """A truncated JPEG must decode to None (fall back to PIL, which
    raises) rather than returning silently synthesized pixels."""
    import io

    import numpy as np
    import pytest
    from PIL import Image

    from ptdeco_tpu.data import native_jpeg

    if native_jpeg._load() is None:
        pytest.skip("native decoder unavailable")
    arr = np.random.default_rng(0).integers(0, 255, (96, 128, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    data = buf.getvalue()
    assert native_jpeg.decode(data, target_min_side=64) is not None
    assert native_jpeg.decode(data[: len(data) // 2], target_min_side=64) is None
