"""Provenance regression guard: repo modules must stay structurally
original relative to their reference counterparts.

The round-1 review found several host-side modules transcribed from the
reference; they were rewritten as original designs in round 2.  This test
keeps them that way: the token-level similarity (comments/docstrings
stripped) of every watched pair must stay below the ceiling.  The
reference tree is read-only study material — if it is absent (e.g. in a
standalone checkout), the test skips.

grids/defaults.py is exempt up to a higher bound: it is the master config
dict whose keys/values are the parity-mandated surface.
"""

import sys
from pathlib import Path

import pytest

REF = Path("/root/reference")
SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"

GENERAL_CEILING = 0.45
CONFIG_SURFACE_CEILING = 0.75  # grids/defaults.py: values ARE the surface


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_similarity_below_ceiling():
    sys.path.insert(0, str(SCRIPTS))
    import difflib

    from simcheck import PAIRS, REPO, tokens

    offenders = []
    for rel, ref_rel in PAIRS.items():
        a, b = REPO / rel, REF / ref_rel
        if not a.exists() or not b.exists():
            continue
        sim = difflib.SequenceMatcher(
            a=tokens(a), b=tokens(b), autojunk=False
        ).ratio()
        ceiling = (
            CONFIG_SURFACE_CEILING if rel == "grids/defaults.py" else GENERAL_CEILING
        )
        if sim >= ceiling:
            offenders.append(f"{rel}: {sim:.3f} >= {ceiling}")
    assert not offenders, "\n".join(offenders)
