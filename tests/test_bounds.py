"""Boundary folding parity vs the reference oracle (interpol/bounds.py) and
basic invariants."""
import numpy as np
import pytest

import jax.numpy as jnp

from interpol_tpu.ops.bounds import fold_index, fold_sign

from _reference import load_reference


@pytest.mark.parametrize("bound", range(7))
@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
def test_fold_matches_reference(bound, n):
    load_reference()
    import torch
    from interpol.bounds import Bound

    i = np.arange(-50, 50, dtype=np.int64)
    ref = Bound(bound)
    idx_ref = ref.index(torch.as_tensor(i), n).numpy()
    idx = np.asarray(fold_index(jnp.asarray(i), n, bound))
    np.testing.assert_array_equal(idx, idx_ref)

    sgn_ref = ref.transform(torch.as_tensor(i), n)
    sgn = fold_sign(jnp.asarray(i), n, bound, jnp.float64)
    assert (sgn is None) == (sgn_ref is None)
    if sgn is not None:
        sr = np.broadcast_to(sgn_ref.numpy().astype(np.float64), i.shape)
        np.testing.assert_array_equal(np.asarray(sgn), sr)


@pytest.mark.parametrize("bound", range(7))
@pytest.mark.parametrize("n", [1, 2, 3, 7])
def test_fold_index_in_range(bound, n):
    i = jnp.arange(-100, 100)
    idx = np.asarray(fold_index(i, n, bound))
    assert idx.min() >= 0 and idx.max() < n


def test_identity_inside():
    # In-range indices are untouched, with sign +1 (or None).  Exception:
    # the reference's dst1 transform maps the *in-bounds* index 0 to sign 0
    # (interpol/bounds.py:63-75), contradicting its own docstring diagram
    # ("-b -a 0 | a b c d | 0 -d -c", api.py:45); we reproduce that
    # behavior bug-for-bug for numerical parity.
    i = jnp.arange(0, 6)
    for bound in range(7):
        np.testing.assert_array_equal(np.asarray(fold_index(i, 6, bound)),
                                      np.arange(6))
        s = fold_sign(i, 6, bound, jnp.float64)
        if s is not None:
            expected = np.ones(6)
            if bound == 4:  # dst1 reference quirk at index 0
                expected[0] = 0
            np.testing.assert_array_equal(np.asarray(s), expected)
