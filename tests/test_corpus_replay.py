"""Replay the committed crash corpus against every fuzz entry point.

Reference analogue: tools/djxl_fuzzer_test.cc — every input that ever
crashed a decoder entry point is committed under tests/corpus/ and
re-run as a regression test. New crashers are found and saved by
tools/fuzz_hunt.py. A corpus file passes when every entry point either
succeeds or raises JxlError; any other exception is a regression.
"""

import glob
import os

import pytest

from libjxl_tpu.base.errors import JxlError

CORPUS = os.path.join(os.path.dirname(__file__), "corpus")
FILES = sorted(glob.glob(os.path.join(CORPUS, "*.bin")))


def _ids():
    return [os.path.basename(f) for f in FILES]


@pytest.mark.parametrize("path", FILES, ids=_ids())
def test_replay(path):
    from tests.test_fuzz import ENTRY_POINTS
    with open(path, "rb") as f:
        data = f.read()
    for name, fn in sorted(ENTRY_POINTS.items()):
        try:
            fn(data)
        except JxlError:
            pass


def test_corpus_exists():
    """The corpus must stay populated — an empty glob silently skips
    every replay above."""
    assert len(FILES) >= 8, f"crash corpus unexpectedly small: {FILES}"
