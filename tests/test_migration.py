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


@pytest.fixture(scope="module")
def block_outcomes():
    # Blocks share one namespace and run sequentially in document order —
    # matching how a reader would paste them into one session — inside
    # this fixture, so running a single parametrized case (-k), a reordering
    # plugin, or xdist cannot execute a later block without its
    # predecessors' imports/variables.
    ns, outcomes = {}, []
    for idx, code in enumerate(BLOCKS):
        try:
            exec(compile(code, f"MIGRATION.md[block {idx}]", "exec"), ns)
            outcomes.append(None)
        except Exception as e:          # noqa: BLE001 — reported per block
            outcomes.append(e)
    return outcomes


@pytest.mark.parametrize("idx", range(len(BLOCKS)))
def test_migration_snippet(idx, block_outcomes):
    err = block_outcomes[idx]
    if err is not None:
        raise AssertionError(
            f"MIGRATION.md block {idx} failed: {err!r}") from err
