"""Debug utilities (capability parity with reference ``utils.hpp``:
``print_qp`` pretty-printer and ``is_psd`` — whose reference version has a
dynamic-size bug, ``include/solvers/utils.hpp:23``; this one is correct)."""

from __future__ import annotations

import numpy as np

__all__ = ["print_qp", "is_psd"]


def print_qp(qp) -> None:
    """Pretty-print a QuadraticProblem (reference utils.hpp:8-17)."""
    for name in ("P", "q", "A", "l", "u"):
        arr = np.asarray(getattr(qp, name))
        print(f"{name} =\n{arr}")


def is_psd(H) -> bool:
    """Eigenvalue PSD check (reference utils.hpp:19-30, debugged)."""
    eig = np.linalg.eigvalsh(np.asarray(H))
    return bool(np.all(eig >= 0))
