"""Helper to import the upstream reference implementation (torch-interpol)
as a *test oracle* for parity checks.  The reference is mounted read-only at
/root/reference; if it (or torch) is unavailable, parity tests skip."""
import sys

import pytest

REFERENCE_PATH = "/root/reference"


def load_reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import torch  # noqa: F401
        import interpol  # noqa: F401
        from interpol import pushpull, coeff, bounds, splines  # noqa: F401
        return interpol
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference implementation unavailable: {e}")
