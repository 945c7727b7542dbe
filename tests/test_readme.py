"""The README's custom-AIR example must run verbatim (VERDICT r3
next-round #10: the quickstart runs as a doctest)."""
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _python_blocks():
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def test_readme_python_blocks_execute():
    blocks = _python_blocks()
    assert len(blocks) >= 2
    for block in blocks:
        exec(compile(block, "<README.md>", "exec"), {})
