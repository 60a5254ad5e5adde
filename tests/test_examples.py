"""The runnable examples (examples/*.py, mirroring the reference's
python/example/ set) stay green: run a representative subset as
subprocesses against the cached toy model."""
import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
EX = ROOT / "examples"


def run_example(name, timeout=400):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(ROOT)
    out = subprocess.run(
        [sys.executable, str(EX / name)], cwd=str(EX), env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, (name, out.stderr[-2000:])
    return out.stdout


@pytest.mark.parametrize("name,expect", [
    ("test_text.py", "five one seven"),
    ("test_words.py", "conf="),
    ("test_reset.py", "after reset"),
    ("test_empty.py", '"text": ""'),
    ("test_grammar.py", "five one seven"),
])
def test_example_runs(name, expect):
    assert expect in run_example(name)
