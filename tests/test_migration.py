"""Execute every ``# [doc-test]`` snippet in MIGRATION.md.

The migration guide's "after" snippets are real code; running them in
document order in one shared namespace guarantees the guide cannot drift
from the API (a rename, a changed default, or a broken convention fails
this test, not a user's port).
"""

import pathlib
import re

import pytest

MIGRATION = pathlib.Path(__file__).resolve().parent.parent / "MIGRATION.md"


def _doc_test_blocks():
    text = MIGRATION.read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    return [b for b in blocks if b.lstrip().startswith("# [doc-test]")]


BLOCKS = _doc_test_blocks()


def test_guide_has_snippets():
    # The guide documents ~12 runnable migrations; a parsing regression
    # (or someone un-tagging blocks) should fail loudly.
    assert len(BLOCKS) >= 10


@pytest.mark.parametrize("idx", range(len(BLOCKS)))
def test_migration_snippet(idx, _shared_ns={}):
    # Blocks share one namespace and run in document order (pytest
    # collection order preserves the parametrize range), matching how a
    # reader would paste them into one session.
    code = BLOCKS[idx]
    exec(compile(code, f"MIGRATION.md[block {idx}]", "exec"), _shared_ns)
