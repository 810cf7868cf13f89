"""Warnings-are-errors lint gate (analog of the reference's rustfmt +
clippy -D warnings CI step, ref: .github/workflows/path-tracer.yml:28-37)."""
import subprocess
import sys
from pathlib import Path


def test_lint_clean():
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).parent / "tools" / "lint.py")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, f"lint findings:\n{proc.stdout}"
