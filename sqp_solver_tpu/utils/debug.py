"""Debug utilities (capability parity with reference ``utils.hpp``:
``print_qp`` pretty-printer and ``is_psd`` — whose reference version has a
dynamic-size bug, ``include/solvers/utils.hpp:23``; this one is correct)
plus the settings/info dumps the reference gates behind ``verbose``
(``qp.hpp:56-66``, ``qp.hpp:82-106``, ``sqp.hpp:40-59``)."""

from __future__ import annotations

import dataclasses
import sys

import numpy as np

__all__ = ["print_qp", "is_psd", "print_settings", "print_info"]


def print_qp(qp) -> None:
    """Pretty-print a QuadraticProblem (reference utils.hpp:8-17)."""
    for name in ("P", "q", "A", "l", "u"):
        arr = np.asarray(getattr(qp, name))
        print(f"{name} =\n{arr}")


def is_psd(H) -> bool:
    """Eigenvalue PSD check (reference utils.hpp:19-30, debugged)."""
    eig = np.linalg.eigvalsh(np.asarray(H))
    return bool(np.all(eig >= 0))


def print_settings(settings, file=None) -> None:
    """Settings dump (reference ``QPSolverSettings::print``, qp.hpp:56-66;
    SQP settings have no reference printer — same format used).  Nested
    settings (SQPSettings.qp) are printed indented."""
    file = file or sys.stdout
    name = type(settings).__name__
    print(f"{name}:", file=file)
    for f in dataclasses.fields(settings):
        v = getattr(settings, f.name)
        if dataclasses.is_dataclass(v):
            print(f"  {f.name}:", file=file)
            for g in dataclasses.fields(v):
                print(f"    {g.name} = {getattr(v, g.name)}", file=file)
        elif callable(v):
            print(f"  {f.name} = <callable {getattr(v, '__name__', repr(v))}>", file=file)
        else:
            print(f"  {f.name} = {v}", file=file)


def _status_names(enum_cls):
    return {int(s): s.name for s in enum_cls}


def _qp_status_names():
    from sqp_solver_tpu.qp.types import QPStatus

    return _status_names(QPStatus)


def _sqp_status_names():
    from sqp_solver_tpu.sqp.types import SQPStatus

    return _status_names(SQPStatus)


def print_info(info, file=None) -> None:
    """Info dump (reference ``QPSolverInfo::print`` qp.hpp:82-106 and
    ``sqp::Info`` sqp.hpp:40-59).  Works for scalar and batched info: a
    batched field prints count/percentile summaries — the useful analog of
    the reference's single-problem dump when B is in the thousands."""
    file = file or sys.stdout
    is_sqp = hasattr(info, "qp_solver_iter")
    # derive labels from the enums so they can never drift from the codes
    names = _sqp_status_names() if is_sqp else _qp_status_names()
    status = np.asarray(info.status)
    print(f"{type(info).__name__}:", file=file)
    if status.ndim == 0:
        print(f"  status = {names.get(int(status), int(status))}", file=file)
    else:
        total = status.size
        for code, label in names.items():
            cnt = int((status == code).sum())
            if cnt:
                print(f"  status[{label}] = {cnt}/{total}", file=file)
    for f in dataclasses.fields(info):
        if f.name == "status":
            continue
        v = np.asarray(getattr(info, f.name))
        if v.ndim == 0:
            print(f"  {f.name} = {v}", file=file)
        else:
            print(
                f"  {f.name}: p50 = {np.percentile(v, 50):.3g}, "
                f"p99 = {np.percentile(v, 99):.3g}, max = {v.max():.3g}",
                file=file,
            )
